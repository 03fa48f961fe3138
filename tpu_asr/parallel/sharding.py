"""Tensor-parallel parameter sharding over the ('data', 'model') mesh.

The reference exercises only DDP for ASR (SURVEY.md §2.4); its vendored
Megatron TP/PP stack serves the unused LLM collections. Here tensor
parallelism is expressed the TPU way: PartitionSpec rules over parameter
paths + GSPMD. Annotate the big matmul weights, jit the SAME train step, and
XLA inserts the all-reduces over ICI — no Megatron-style manual collectives.

Sharded (suffix-matched against the flattened parameter path, which includes
the scanned-layer leading axis):
- conformer FF linear1 kernels/bias: output dim over 'model' (column-parallel)
- conformer FF linear2 kernels: input dim over 'model' (row-parallel; XLA
  adds the psum)
- attention q/k/v/pos projections: head dim over 'model'; linear_out input
  dim over 'model'; untied pos biases over heads
- decoder vocab projection: vocab dim over 'model'

Everything else (LN, convs, featurizer-free) is replicated. The same rules
apply to optimizer moments automatically: `shard_tree` matches path suffixes,
and optax's Adam state mirrors the param tree. The fused Pallas attention
composes with tp: its custom_partitioning rules shard the head axis too
(parallel/kernel_sharding.py 'h' factor), so `attention_backend='pallas'`
works under tp_size > 1 with each shard running its local heads.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (path suffix, spec WITHOUT the scanned-layer axis). A leading None is
# prepended automatically when the leaf has one more axis than the spec.
TP_RULES: Sequence[Tuple[Tuple[str, ...], P]] = (
    (("feed_forward1", "linear1", "kernel"), P(None, "model")),
    (("feed_forward1", "linear1", "bias"), P("model")),
    (("feed_forward1", "linear2", "kernel"), P("model", None)),
    (("feed_forward2", "linear1", "kernel"), P(None, "model")),
    (("feed_forward2", "linear1", "bias"), P("model")),
    (("feed_forward2", "linear2", "kernel"), P("model", None)),
    (("self_attn", "linear_q", "kernel"), P(None, "model")),
    (("self_attn", "linear_q", "bias"), P("model")),
    (("self_attn", "linear_k", "kernel"), P(None, "model")),
    (("self_attn", "linear_k", "bias"), P("model")),
    (("self_attn", "linear_v", "kernel"), P(None, "model")),
    (("self_attn", "linear_v", "bias"), P("model")),
    (("self_attn", "linear_pos", "kernel"), P(None, "model")),
    (("self_attn", "linear_out", "kernel"), P("model", None)),
    (("self_attn", "pos_bias_u"), P("model", None)),
    (("self_attn", "pos_bias_v"), P("model", None)),
    (("decoder_layers_0", "kernel"), P(None, "model")),
    (("decoder_layers_0", "bias"), P("model")),
)


def _path_names(path) -> Tuple[str, ...]:
    names = []
    for k in path:
        if hasattr(k, "key"):
            names.append(str(k.key))
        elif hasattr(k, "name"):
            names.append(str(k.name))
        else:
            names.append(str(k))
    return tuple(names)


def _spec_for(path_names: Tuple[str, ...], shape, tp_size: int) -> P:
    if tp_size > 1:
        for suffix, spec in TP_RULES:
            if path_names[-len(suffix):] == suffix:
                spec_t = tuple(spec)
                if len(spec_t) < len(shape):   # scanned-layer leading axes
                    spec_t = (None,) * (len(shape) - len(spec_t)) + spec_t
                if len(spec_t) != len(shape):
                    return P()
                # only shard dims the model axis divides evenly (e.g. a
                # vocab+blank of 129 stays replicated at tp=4)
                spec_t = tuple(
                    ax if (ax is None or shape[i] % tp_size == 0) else None
                    for i, ax in enumerate(spec_t))
                return P(*spec_t)
    return P()


def shard_tree(tree: Any, mesh: Mesh) -> Any:
    """Tree of NamedShardings for any state pytree (params, Adam moments,
    batch stats, ...) by TP path rules; replicated where no rule matches or
    the mesh has no 'model' axis."""
    tp_size = (mesh.shape.get("model", 1)
               if "model" in mesh.axis_names else 1)

    def leaf(path, x):
        shape = getattr(x, "shape", ())
        return NamedSharding(mesh, _spec_for(_path_names(path), shape,
                                             tp_size))

    return jax.tree_util.tree_map_with_path(leaf, tree)


def apply_sharding(tree: Any, mesh: Mesh) -> Any:
    """device_put the tree with its TP sharding."""
    shardings = shard_tree(tree, mesh)
    return jax.tree.map(jax.device_put, tree, shardings)
