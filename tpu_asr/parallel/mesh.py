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
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(vals)).sum(axis=0)


def local_rows(garr) -> np.ndarray:
    """Materialize THIS process's rows of a batch-sharded global array.

    In a multi-process run, per-sample eval outputs (NLLs, decoded tokens)
    are sharded over the `data` axis across processes — `np.asarray` on the
    global array raises (non-addressable shards), and each process should
    only score its own manifest stripe anyway. Rows come back in global
    order, so they align with the process-local loader's `texts`.
    No-op (full array) in single-controller runs."""
    if jax.process_count() == 1:
        return np.asarray(garr)
    # dedup by global row start: under tp the same rows sit on several local
    # devices; keep one copy per distinct row range
    by_start = {}
    for s in garr.addressable_shards:
        by_start.setdefault(s.index[0].start or 0, s.data)
    out = np.concatenate(
        [np.asarray(by_start[k]) for k in sorted(by_start)], axis=0)
    per = garr.shape[0] // jax.process_count()
    if out.shape[0] == per:
        return out
    if out.shape[0] == garr.shape[0]:
        # XLA chose to replicate this output: every process holds all rows —
        # slice this process's block (the loader placed process p's local
        # batch at global rows [p*per, (p+1)*per))
        p = jax.process_index()
        return out[p * per:(p + 1) * per]
    raise ValueError(
        f"unexpected addressable row coverage {out.shape[0]} for global "
        f"batch {garr.shape[0]} over {jax.process_count()} processes")


def is_main_process() -> bool:
    """True on the process that owns filesystem side effects (metrics files,
    checkpoint rotation, tokenizer sidecars) — Lightning's `rank_zero_only`
    equivalent for the reference's DDP logging/checkpointing."""
    return jax.process_index() == 0


def sync_processes(tag: str) -> None:
    """Cross-process barrier (no-op single-controller). Used around
    filesystem mutations that only process 0 performs, so other processes
    never observe a half-renamed checkpoint dir or a missing sidecar."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(tag)


def broadcast_int(value: int) -> int:
    """Broadcast a host int from process 0 to all (no-op single-controller).
    Used to agree on the experiment-dir version suffix — per-process
    directory probing would race and split the run across workdirs."""
    if jax.process_count() == 1:
        return int(value)
    from jax.experimental import multihost_utils
    return int(np.asarray(
        multihost_utils.broadcast_one_to_all(np.int64(value))))
