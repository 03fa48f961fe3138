"""GSPMD partition rules for the Pallas kernels: shard along the
embarrassingly-parallel dims (batch, and heads for attention), never gather.

Under plain `jit` over a `Mesh`, XLA treats a `pallas_call` as an opaque
custom call and would REPLICATE its operands (an all-gather of the full batch
onto every chip) — correct, but it de-scales the flagship kernels exactly
where the framework is supposed to scale (SURVEY.md §2.4 DP contract, and
the TP head-parallel contract of parallel/sharding.py). Each kernel gets a
`jax.experimental.custom_partitioning` wrapper built from per-argument FACTOR
tuples: dims labeled with the same factor ('b' = batch, 'h' = heads) stay
sharded together over whatever mesh axis the caller's data carries; unlabeled
dims are forced replicated. The per-shard lowering is the same kernel on the
local block — attention heads are independent programs in the grid, so a
head-sharded shard simply launches fewer head groups.

Both rule flavors are emitted: an einsum-like Shardy `sharding_rule` (the
default partitioner in this JAX — shared factors for 'b'/'h', unique
need-replication factors elsewhere) and `infer_sharding_from_operands` /
`partition` callbacks for classic GSPMD.

Kernel-side requirement: results must be bitwise shard-invariant. The
attention kernel's in-kernel dropout therefore derives its PRNG stream from a
PER-(BATCH-ROW, HEAD) seed operand — sharded along with batch AND heads, so
every shard sees its heads' GLOBAL stream ids — never from `pl.program_id`,
which would renumber under sharding (and under fwd/bwd head-group-size
differences)."""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding
from jax.sharding import PartitionSpec as P

# one factor label (e.g. 'b', 'h') or None per dimension of one operand
Factors = Tuple[Optional[str], ...]
# legacy spec for batch-only kernels: (rank, batch_dim or None)
Spec = Tuple[int, Optional[int]]


def _factor_axes(arg_shapes, arg_factors):
    """factor label -> mesh axis name, from the first operand whose suggested
    sharding shards a dim carrying that label."""
    axes = {}
    for shape, factors in zip(arg_shapes, arg_factors):
        spec = getattr(shape.sharding, "spec", None)
        if spec is None:
            continue
        for d, label in enumerate(factors):
            if label is None or label in axes:
                continue
            if len(spec) > d and spec[d] is not None:
                axes[label] = spec[d]
    return axes


def _shardings(mesh, factor_seq, axes):
    out = []
    for factors in factor_seq:
        spec = [axes.get(label) if label is not None else None
                for label in factors]
        out.append(NamedSharding(mesh, P(*spec)))
    return out


def _rule(arg_factors: Sequence[Factors], out_factors: Sequence[Factors]):
    """Einsum-like Shardy rule: shared factors for labeled dims, a unique
    need-replication factor everywhere else."""
    from jax._src.custom_partitioning_sharding_rule import (
        str_to_sdy_sharding_rule)

    counter = [0]
    others = []

    def render(factor_seq):
        terms = []
        for factors in factor_seq:
            dims = []
            for label in factors:
                if label is not None:
                    dims.append(label)
                else:
                    counter[0] += 1
                    f = f"f{counter[0]}"
                    others.append(f)
                    dims.append(f)
            terms.append(" ".join(dims))
        return ", ".join(terms)

    lhs = render(arg_factors)
    rhs = render(out_factors)
    return str_to_sdy_sharding_rule(f"{lhs} -> {rhs}",
                                    need_replication_factors=tuple(others))


def factor_partitioned(fun: Callable, arg_factors: Sequence[Factors],
                       out_factors: Sequence[Factors], tuple_out: bool,
                       reduce_factors: Tuple[str, ...] = ()):
    """Wrap `fun(*tensor_args) -> array-or-tuple` with factor-labeled
    partition rules. Static configuration must already be closed over in
    `fun`.

    `reduce_factors`: factors that are CONTRACTED into some outputs (the
    einsum-reduction case — e.g. the block attention kernel sums per-head
    output projections into one (B, T, D) result). When such a factor is
    sharded on a mesh axis, each shard computes a PARTIAL sum over its local
    factor slice, and the per-shard lowering inserts a psum over that axis
    for every output whose factor list does not carry the factor — the
    row-parallel (Megatron-style) all-reduce, expressed through GSPMD."""

    cp = custom_partitioning(fun)

    def infer(mesh, arg_shapes, result_shape):
        axes = _factor_axes(arg_shapes, arg_factors)
        sh = _shardings(mesh, out_factors, axes)
        return tuple(sh) if tuple_out else sh[0]

    def part(mesh, arg_shapes, result_shape):
        axes = _factor_axes(arg_shapes, arg_factors)
        arg_sh = tuple(_shardings(mesh, arg_factors, axes))
        out_sh = _shardings(mesh, out_factors, axes)
        out_sh = tuple(out_sh) if tuple_out else out_sh[0]

        lowering = fun
        if reduce_factors:
            import jax

            def lowering(*args):
                res = fun(*args)
                seq = res if isinstance(res, tuple) else (res,)
                out = []
                for r, factors in zip(seq, out_factors):
                    red = tuple(axes[f] for f in reduce_factors
                                if f in axes and f not in factors)
                    out.append(jax.lax.psum(r, red) if red else r)
                return tuple(out) if isinstance(res, tuple) else out[0]

        return mesh, lowering, out_sh, arg_sh

    cp.def_partition(partition=part, infer_sharding_from_operands=infer,
                     sharding_rule=_rule(arg_factors, out_factors),
                     decode_shardings=True)
    return cp


def _spec_to_factors(spec: Spec) -> Factors:
    rank, bd = spec
    return tuple("b" if (bd is not None and d == bd) else None
                 for d in range(rank))


def batch_partitioned(fun: Callable, arg_specs: Sequence[Spec],
                      out_specs: Sequence[Spec], tuple_out: bool):
    """Batch-dim-only wrapper (CTC kernel): legacy (rank, batch_dim) specs."""
    return factor_partitioned(fun,
                              [_spec_to_factors(s) for s in arg_specs],
                              [_spec_to_factors(s) for s in out_specs],
                              tuple_out)
