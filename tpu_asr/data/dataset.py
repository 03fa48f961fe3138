"""Audio-to-BPE dataset + static-shape bucketed dataloader.

Rebuilds the snapshot-stripped NeMo AudioToBPEDataset contract (N11 in
SURVEY.md §2.2, pinned by the dataloader config at conformer_ctc_bpe.yaml:55-90
and `_setup_dataloader_from_config`, ctc_models.py:304-381):
JSONL manifest -> duration filter (min 0.1 / max 16.7 s) -> host decode ->
tokenize -> pad-collate (signal, signal_len, tokens, token_len).

TPU-first differences from the torch DataLoader path:
- Duration bucketing with QUANTIZED pad lengths: each batch's audio is padded
  to a bucket edge and token arrays to a multiple of a fixed quantum, so the
  jitted step sees a small, bounded set of shapes (XLA compiles once per
  bucket) instead of a fresh shape every step. This replaces NeMo's
  semi-sorted batching (ctc_bpe_models.py:31) and the DDP max-len sync.
- `prefetch_to_device` double-buffers host->device transfers so input feed
  overlaps the accelerator step (replaces DALI/pinned-memory workers).
"""

from __future__ import annotations

import math
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from tpu_asr.config import DataConfig
from tpu_asr.data.audio import load_audio
from tpu_asr.data.manifest import ManifestEntry, read_manifest
from tpu_asr.data.tokenizer import SentencePieceBPETokenizer


@dataclass
class Sample:
    signal: np.ndarray       # (L,) float32 @ sample_rate
    tokens: np.ndarray       # (S,) int32
    text: str
    duration: float


class AudioToBPEDataset:
    """Manifest-backed dataset with on-demand host decode + tokenize.

    `decode_cache_dir` enables a decoded-audio disk cache: each utterance's
    resampled float32 waveform is written once as `<sha1>.npy` and memory-
    mapped on every later access. Repeated eval passes (the 4-split ×
    N-checkpoint pattern of asr_inference.py) then skip the mp3/flac/wav
    decode entirely — the mitigation for the single-core host decode floor
    (ROADMAP: eval is host-dataloader-bound). Safe under concurrent workers
    (atomic rename); ~64 KB/s-of-audio of disk."""

    def __init__(self, manifest_filepath: str,
                 tokenizer: SentencePieceBPETokenizer,
                 sample_rate: int = 16000,
                 min_duration: float = 0.1,
                 max_duration: float = 16.7,
                 decode_cache_dir: Optional[str] = None):
        self.tokenizer = tokenizer
        self.sample_rate = sample_rate
        self.cache_dir = decode_cache_dir
        if self.cache_dir:
            import os
            os.makedirs(self.cache_dir, exist_ok=True)
        entries = read_manifest(manifest_filepath)
        self.entries: List[ManifestEntry] = [
            e for e in entries
            if (min_duration is None or e.duration >= min_duration)
            and (max_duration is None or e.duration <= max_duration)]

    def __len__(self) -> int:
        return len(self.entries)

    def _load_signal(self, e: ManifestEntry) -> np.ndarray:
        if not self.cache_dir:
            return load_audio(e.audio_filepath, self.sample_rate)
        import hashlib
        import os
        key = hashlib.sha1(
            f"{e.audio_filepath}:{self.sample_rate}".encode()).hexdigest()
        path = os.path.join(self.cache_dir, key + ".npy")
        meta = path + ".meta"
        # the source's (size, mtime_ns) at decode time, validated on every
        # hit: a re-recorded/edited file re-decodes instead of silently
        # serving the stale waveform. A MISSING source still serves the
        # cache (that is the cache's point — workers without the corpus).
        try:
            st = os.stat(e.audio_filepath)
            stamp = f"{st.st_size}:{st.st_mtime_ns}"
        except OSError:
            stamp = None
        if os.path.isfile(path):
            fresh = True
            if stamp is not None:
                try:
                    with open(meta) as f:
                        fresh = f.read().strip() == stamp
                except OSError:
                    pass                  # pre-sidecar cache: trust it
            if fresh:
                try:
                    # mmap keeps the hot path zero-copy; the array is
                    # READ-ONLY, which every consumer honors (collate copies
                    # into the padded batch buffer)
                    return np.load(path, mmap_mode="r")
                except Exception:
                    pass                  # partial/corrupt -> re-decode
        signal = load_audio(e.audio_filepath, self.sample_rate)
        tmp = f"{path}.tmp{os.getpid()}"
        try:
            # via a file object: np.save(str) would APPEND .npy to the tmp
            # name and the atomic rename source would not exist
            with open(tmp, "wb") as f:
                np.save(f, signal)
            os.replace(tmp, path)
            if stamp is not None:
                with open(f"{meta}.tmp{os.getpid()}", "w") as f:
                    f.write(stamp)
                os.replace(f"{meta}.tmp{os.getpid()}", meta)
        except OSError:                   # read-only/full disk: stay uncached
            pass
        return signal

    def __getitem__(self, i: int) -> Sample:
        e = self.entries[i]
        signal = self._load_signal(e)
        tokens = np.asarray(self.tokenizer.text_to_ids(e.text), np.int32)
        return Sample(signal, tokens, e.text, e.duration)


def _bucket_edges(max_duration: float, num_buckets: int,
                  sample_rate: int) -> np.ndarray:
    """Linear duration buckets; each edge is a static padded signal length."""
    edges = np.linspace(max_duration / num_buckets, max_duration, num_buckets)
    return np.ceil(edges * sample_rate).astype(np.int64)


def make_dataloader(dataset: AudioToBPEDataset, cfg: DataConfig,
                    epoch: int = 0, drop_last: bool = False,
                    token_quantum: int = 16,
                    num_shards: int = 1, shard_index: int = 0,
                    num_workers: int = 4,
                    pad_batch_to: Optional[int] = None,
                    ) -> Iterator[Dict[str, np.ndarray]]:
    """Yields dict batches with bucket-quantized static shapes.

    Batches are formed within duration buckets (semi-sorted batching), shuffled
    with a per-epoch seed; `num_shards`/`shard_index` stripe the manifest for
    multi-host input sharding over DCN (SURVEY.md §5).

    `pad_batch_to`: round the batch dim UP to a multiple of this by repeating
    samples cyclically (torch DistributedSampler semantics) so an uneven final
    batch still shards over a dp>1 mesh; `texts` keeps only the real samples,
    so WER/eval bookkeeping skips the padding rows.
    """
    n = len(dataset)
    order = np.arange(n)
    if cfg.shuffle:
        rng = np.random.default_rng(cfg.seed + epoch)
        rng.shuffle(order)
    order = order[shard_index::num_shards]

    edges = _bucket_edges(cfg.max_duration, cfg.num_buckets,
                          dataset.sample_rate)
    durations = np.asarray([dataset.entries[i].duration for i in order])
    sig_lens = np.ceil(durations * dataset.sample_rate).astype(np.int64)
    bucket_of = np.searchsorted(edges, sig_lens, side="left").clip(0, len(edges) - 1)

    buckets: List[List[int]] = [[] for _ in edges]
    for idx, b in zip(order, bucket_of):
        buckets[b].append(int(idx))

    # per-bucket batch sizes (NeMo bucketing_batch_size): a list gives one
    # size per bucket; a single int auto-scales inversely with the bucket's
    # duration cap (~constant audio-seconds per batch); None = flat
    bbs = getattr(cfg, "bucketing_batch_size", None)
    if bbs is None:
        sizes = [cfg.batch_size] * len(edges)
    elif isinstance(bbs, int):
        sizes = [max(1, int(round(bbs * edges[-1] / e))) for e in edges]
    else:
        if len(bbs) != len(edges):
            raise ValueError(
                f"bucketing_batch_size has {len(bbs)} entries for "
                f"{len(edges)} buckets")
        sizes = [int(v) for v in bbs]

    batches: List[tuple] = []   # (bucket_id, [indices])
    for b, idxs in enumerate(buckets):
        bs = sizes[b]
        for s in range(0, len(idxs), bs):
            chunk = idxs[s:s + bs]
            if drop_last and len(chunk) < bs:
                continue
            batches.append((b, chunk))
    if cfg.shuffle:
        rng = np.random.default_rng(cfg.seed * 7919 + epoch)
        rng.shuffle(batches)

    # threaded sample loading: WAV decode happens in the C extension with the
    # GIL released (data/audio.py), so worker threads overlap IO + decode
    # with device compute (replaces torch DataLoader workers / DALI)
    pool = (ThreadPoolExecutor(max_workers=num_workers)
            if num_workers > 1 else None)
    try:
        for b, idxs in batches:
            if pool is not None:
                samples = list(pool.map(dataset.__getitem__, idxs))
            else:
                samples = [dataset[i] for i in idxs]
            yield _collate(samples, int(edges[b]), token_quantum, pad_batch_to,
                           idxs=idxs)
    finally:
        if pool is not None:
            pool.shutdown(wait=False)


def _collate(samples, pad_sig: int, token_quantum: int,
             pad_batch_to: Optional[int] = None,
             idxs=None) -> Dict[str, np.ndarray]:
    max_tok = max((len(s.tokens) for s in samples), default=1)
    pad_tok = max(token_quantum,
                  int(math.ceil(max_tok / token_quantum) * token_quantum))
    n_real = len(samples)
    bs = n_real
    if pad_batch_to and bs % pad_batch_to:
        bs += pad_batch_to - bs % pad_batch_to
    signal = np.zeros((bs, pad_sig), np.float32)
    signal_len = np.zeros((bs,), np.int32)
    tokens = np.zeros((bs, pad_tok), np.int32)
    token_len = np.zeros((bs,), np.int32)
    for i in range(bs):
        s = samples[i % n_real]      # cyclic repeat fills the padding rows
        ln = min(len(s.signal), pad_sig)
        signal[i, :ln] = s.signal[:ln]
        signal_len[i] = ln
        tl = min(len(s.tokens), pad_tok)
        tokens[i, :tl] = s.tokens[:tl]
        token_len[i] = tl
    out = {"signal": signal, "signal_len": signal_len,
           "tokens": tokens, "token_len": token_len,
           "texts": [s.text for s in samples]}
    if idxs is not None:
        # dataset indices per row, cyclic like the padding rows — identity
        # key for the teacher-feature cache (train/loop.py)
        out["utt_idx"] = np.asarray(
            [idxs[i % n_real] for i in range(bs)], np.int32)
    return out


def stack_batches(iterator, k: int):
    """Group consecutive SAME-SHAPE host batches and stack each group along a
    leading (K, ...) steps axis for multi-step-per-dispatch training
    (train/trainer.make_distil_multi_step). Grouping is by shape because the
    bucketed loader emits different pad caps per bucket — stacking within a
    shape group also means ONE compiled multi-step program per bucket.
    Stacked batches carry `"_steps": True`; leftover batches (fewer than k of
    a shape at epoch end) are yielded unstacked, so every batch still trains.
    `"texts"` of the LAST batch in a group is kept (periodic train-WER reads
    the most recent batch only)."""
    import numpy as _np

    pending: dict = {}
    for batch in iterator:
        texts = batch.pop("texts", None)
        key = tuple(sorted((n, v.shape) for n, v in batch.items()))
        group = pending.setdefault(key, [])
        group.append((batch, texts))
        if len(group) == k:
            stacked = {n: _np.stack([b[n] for b, _ in group])
                       for n in group[0][0]}
            stacked["texts"] = group[-1][1]
            stacked["_steps"] = True
            del pending[key]
            yield stacked
    for group in pending.values():
        for batch, texts in group:
            batch["texts"] = texts
            yield batch


def prefetch_to_device(iterator, mesh=None, size: int = 2):
    """Double-buffered host->device feed. With a mesh, the batch axis is
    sharded over `data`; otherwise plain device_put.

    Multi-host: each process feeds its local manifest stripe (see
    `make_dataloader(num_shards=jax.process_count())`) and the per-process
    arrays assemble into one global array via
    `jax.make_array_from_process_local_data` — the host batch here is the
    PROCESS-local batch, `global = local * process_count`."""
    import collections

    import jax

    from tpu_asr.parallel.mesh import batch_sharding

    sharding = batch_sharding(mesh) if mesh is not None else None
    multihost = jax.process_count() > 1

    def put(batch):
        texts = batch.pop("texts", None)
        stacked = batch.pop("_steps", False)
        sh = sharding
        if stacked and sharding is not None:
            # (K, B, ...) stacked batches shard the SECOND axis over data
            from jax.sharding import NamedSharding, PartitionSpec
            sh = NamedSharding(mesh, PartitionSpec(None, "data"))
        if sh is not None and multihost:
            out = {k: jax.make_array_from_process_local_data(sh, v)
                   for k, v in batch.items()}
        elif sh is not None:
            out = {k: jax.device_put(v, sh) for k, v in batch.items()}
        else:
            out = {k: jax.device_put(v) for k, v in batch.items()}
        out["texts"] = texts
        if stacked:
            out["_steps"] = True
        return out

    queue = collections.deque()
    for batch in iterator:
        queue.append(put(batch))
        if len(queue) >= size:
            yield queue.popleft()
    while queue:
        yield queue.popleft()
