"""GSPMD partition rules for the Pallas kernels: shard along batch, never
gather.

Under plain `jit` over a `Mesh`, XLA treats a `pallas_call` as an opaque
custom call and would REPLICATE its operands (an all-gather of the full batch
onto every chip) — correct, but it de-scales the flagship kernels exactly
where the framework is supposed to scale (SURVEY.md §2.4 DP contract). Both
attention and CTC kernels are embarrassingly parallel over the batch
dimension, so each gets a `jax.experimental.custom_partitioning` wrapper that
keeps the batch axis sharded and replicates every other dimension; the
per-shard lowering is just the same kernel on the local batch.

`batch_partitioned` builds the wrapper from per-argument (rank, batch_dim)
specs. It emits BOTH rule flavors: an einsum-like Shardy `sharding_rule`
(the default partitioner in this JAX) and
`infer_sharding_from_operands`/`partition` callbacks for classic GSPMD.

Kernel-side requirement: results must be bitwise shard-invariant. The
attention kernel's in-kernel dropout therefore derives its PRNG stream from a
PER-BATCH-ROW seed operand (sharded along with the batch) plus the GLOBAL
head index — never from `pl.program_id` over the batch grid, which would
renumber under sharding (and under fwd/bwd head-group-size differences).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding
from jax.sharding import PartitionSpec as P

Spec = Tuple[int, Optional[int]]          # (rank, batch_dim or None)


def _batch_axis(arg_shapes, batch_dims):
    """The mesh axis name(s) the batch dim is sharded over, from the first
    operand whose suggested sharding shards its batch dim."""
    for shape, (_, bd) in zip(arg_shapes, batch_dims):
        if bd is None:
            continue
        spec = getattr(shape.sharding, "spec", None)
        if spec is not None and len(spec) > bd and spec[bd] is not None:
            return spec[bd]
    return None


def _shardings(mesh, specs, axis):
    out = []
    for rank, bd in specs:
        if bd is None or axis is None:
            out.append(NamedSharding(mesh, P()))
        else:
            spec = [None] * rank
            spec[bd] = axis
            out.append(NamedSharding(mesh, P(*spec)))
    return out


def _rule(arg_specs: Sequence[Spec], out_specs: Sequence[Spec]):
    """Einsum-like Shardy rule: shared factor 'b' on every batch dim, a
    unique need-replication factor everywhere else."""
    from jax._src.custom_partitioning_sharding_rule import (
        str_to_sdy_sharding_rule)

    counter = [0]
    others = []

    def render(specs):
        terms = []
        for rank, bd in specs:
            dims = []
            for d in range(rank):
                if bd is not None and d == bd:
                    dims.append("b")
                else:
                    counter[0] += 1
                    f = f"f{counter[0]}"
                    others.append(f)
                    dims.append(f)
            terms.append(" ".join(dims))
        return ", ".join(terms)

    lhs = render(arg_specs)
    rhs = render(out_specs)
    return str_to_sdy_sharding_rule(f"{lhs} -> {rhs}",
                                    need_replication_factors=tuple(others))


def batch_partitioned(fun: Callable, arg_specs: Sequence[Spec],
                      out_specs: Sequence[Spec], tuple_out: bool):
    """Wrap `fun(*tensor_args) -> array-or-tuple` with batch-dim partition
    rules. Static configuration must already be closed over in `fun`."""

    cp = custom_partitioning(fun)

    def infer(mesh, arg_shapes, result_shape):
        axis = _batch_axis(arg_shapes, arg_specs)
        sh = _shardings(mesh, out_specs, axis)
        return tuple(sh) if tuple_out else sh[0]

    def part(mesh, arg_shapes, result_shape):
        axis = _batch_axis(arg_shapes, arg_specs)
        arg_sh = tuple(_shardings(mesh, arg_specs, axis))
        out_sh = _shardings(mesh, out_specs, axis)
        out_sh = tuple(out_sh) if tuple_out else out_sh[0]
        return mesh, fun, out_sh, arg_sh

    cp.def_partition(partition=part, infer_sharding_from_operands=infer,
                     sharding_rule=_rule(arg_specs, out_specs),
                     decode_shardings=True)
    return cp
