"""Device mesh + sharding helpers — the TPU-native replacement for the
reference's Lightning DDP/NCCL substrate (SURVEY.md §2.4, §5).

The reference's only exercised strategy is data parallelism (Lightning
`strategy: ddp`, conformer_ctc_bpe.yaml:196-209). Here DP is a 1-D `data` mesh
axis over ICI: the train step is jitted with the batch sharded on `data` and
the train state replicated, so XLA inserts the gradient all-reduce (psum) —
the NCCL allreduce, sync-BN mean, torchmetrics WER sync, and the conformer
max-len `all_reduce(MAX)` (conformer_encoder.py:763-781) all either fall out
of this or are unnecessary with static shapes.

A `model` axis is reserved for tensor-parallel experiments (unused by default:
the reference never exercises TP/PP for ASR — SURVEY.md §2.4).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp_size: int = -1, tp_size: int = 1,
              devices: Optional[Sequence[Any]] = None) -> Mesh:
    """1-D or 2-D mesh: ('data',) or ('data', 'model')."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp_size == -1:
        dp_size = n // tp_size
    assert dp_size * tp_size <= n, f"mesh {dp_size}x{tp_size} > {n} devices"
    devices = devices[: dp_size * tp_size]
    if tp_size == 1:
        return Mesh(np.asarray(devices).reshape(dp_size), ("data",))
    return Mesh(np.asarray(devices).reshape(dp_size, tp_size), ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis sharded over `data`."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Device-put a host batch with the leading axis sharded over `data`."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def cross_process_sum(values: Sequence[float]) -> np.ndarray:
    """Sum a small vector of host scalars across all JAX processes — the
    torchmetrics `dist_reduce_fx='sum'` equivalent for WER (scores, words)
    accumulation and eval loss sums (wer.py:289-290). No-op in
    single-controller runs."""
    vals = np.asarray(values, np.float64)
    if jax.process_count() == 1:
        return vals
    from jax.experimental import multihost_utils  # pragma: no cover
    return np.asarray(multihost_utils.process_allgather(vals)).sum(axis=0)
