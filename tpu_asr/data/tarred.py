"""Tarred (sharded-archive) dataset — the NeMo tarred-audio variant of the
dataloader contract (N11 in SURVEY.md §2.2: `is_tarred` /
`tarred_audio_filepaths` paths in `_setup_dataloader_from_config`,
ctc_models.py:304-381).

Audio lives in tar shards (`audio_0.tar`, `audio_1.tar`, ...) whose members
are referenced from the manifest by basename (`audio_filepath` holds the
member name, NeMo convention). Shards are read sequentially — sequential tar
IO beats per-file seeks on network filesystems, which is the point of the
format — and samples stream out in shard order with a per-epoch shard
shuffle. Multi-host: shards stripe across hosts (`num_shards`/`shard_index`).
"""

from __future__ import annotations

import io
import tarfile
from pathlib import Path
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from tpu_asr.config import DataConfig
from tpu_asr.data.audio import read_wav_python, resample
from tpu_asr.data.dataset import Sample
from tpu_asr.data.manifest import read_manifest
from tpu_asr.data.tokenizer import SentencePieceBPETokenizer


def expand_shard_pattern(pattern) -> List[Path]:
    """'audio_{0..3}.tar' or a glob or a list -> shard paths."""
    if isinstance(pattern, (list, tuple)):
        return [Path(p) for p in pattern]
    pattern = str(pattern)
    if "{" in pattern and ".." in pattern:
        head, rest = pattern.split("{", 1)
        rng, tail = rest.split("}", 1)
        lo, hi = rng.split("..")
        return [Path(f"{head}{i}{tail}") for i in range(int(lo), int(hi) + 1)]
    paths = sorted(Path(pattern).parent.glob(Path(pattern).name))
    if not paths:
        raise FileNotFoundError(f"no tar shards match {pattern}")
    return paths


class TarredAudioToBPEDataset:
    """Iterable dataset over tar shards + manifest metadata."""

    def __init__(self, manifest_filepath: str, tarred_audio_filepaths,
                 tokenizer: SentencePieceBPETokenizer,
                 sample_rate: int = 16000,
                 min_duration: float = 0.1, max_duration: float = 16.7):
        self.tokenizer = tokenizer
        self.sample_rate = sample_rate
        self.shards = expand_shard_pattern(tarred_audio_filepaths)
        self.meta: Dict[str, dict] = {}
        for e in read_manifest(manifest_filepath):
            if min_duration is not None and e.duration < min_duration:
                continue
            if max_duration is not None and e.duration > max_duration:
                continue
            self.meta[Path(e.audio_filepath).name] = {
                "text": e.text, "duration": e.duration}

    def __len__(self) -> int:
        return len(self.meta)

    def iter_samples(self, epoch: int = 0, shuffle_shards: bool = True,
                     num_shards: int = 1, shard_index: int = 0
                     ) -> Iterator[Sample]:
        shards = list(self.shards)
        if shuffle_shards:
            rng = np.random.default_rng(epoch)
            rng.shuffle(shards)
        shards = shards[shard_index::num_shards]
        for shard in shards:
            with tarfile.open(shard, "r:*") as tar:
                for member in tar:
                    if not member.isfile():
                        continue
                    meta = self.meta.get(Path(member.name).name)
                    if meta is None:
                        continue
                    raw = tar.extractfile(member).read()
                    x, sr = read_wav_python(raw, member.name)
                    x = resample(x, sr, self.sample_rate)
                    tokens = np.asarray(
                        self.tokenizer.text_to_ids(meta["text"]), np.int32)
                    yield Sample(x, tokens, meta["text"], meta["duration"])


def make_tarred_dataloader(dataset: TarredAudioToBPEDataset, cfg: DataConfig,
                           epoch: int = 0, token_quantum: int = 16,
                           num_shards: int = 1, shard_index: int = 0
                           ) -> Iterator[Dict[str, np.ndarray]]:
    """Greedy duration-bucketed batching over the sequential shard stream:
    samples accumulate per bucket and flush when a bucket fills (plus a final
    drain), keeping static padded shapes (same bucket edges as the map-style
    loader)."""
    from tpu_asr.data.dataset import _bucket_edges

    edges = _bucket_edges(cfg.max_duration, cfg.num_buckets,
                          dataset.sample_rate)
    pending: List[List[Sample]] = [[] for _ in edges]

    def flush(b: int):
        import math
        samples = pending[b]
        pending[b] = []
        pad_sig = int(edges[b])
        max_tok = max((len(s.tokens) for s in samples), default=1)
        pad_tok = max(token_quantum,
                      int(math.ceil(max_tok / token_quantum) * token_quantum))
        bs = len(samples)
        signal = np.zeros((bs, pad_sig), np.float32)
        signal_len = np.zeros((bs,), np.int32)
        tokens = np.zeros((bs, pad_tok), np.int32)
        token_len = np.zeros((bs,), np.int32)
        for i, s in enumerate(samples):
            ln = min(len(s.signal), pad_sig)
            signal[i, :ln] = s.signal[:ln]
            signal_len[i] = ln
            tl = min(len(s.tokens), pad_tok)
            tokens[i, :tl] = s.tokens[:tl]
            token_len[i] = tl
        return {"signal": signal, "signal_len": signal_len,
                "tokens": tokens, "token_len": token_len,
                "texts": [s.text for s in samples]}

    for sample in dataset.iter_samples(epoch, cfg.shuffle,
                                       num_shards, shard_index):
        n = int(np.ceil(sample.duration * dataset.sample_rate))
        b = int(np.searchsorted(edges, n, side="left").clip(0, len(edges) - 1))
        pending[b].append(sample)
        if len(pending[b]) >= cfg.batch_size:
            yield flush(b)
    for b in range(len(edges)):
        if pending[b]:
            yield flush(b)
