"""Tarred-dataset + char-tokenizer tests (NeMo tarred dataloader / char
vocab variants, SURVEY.md N11/N13)."""

import io
import tarfile
from pathlib import Path

import numpy as np
import pytest

from tpu_asr.config import DataConfig
from tpu_asr.data.audio import write_wav
from tpu_asr.data.manifest import ManifestEntry, write_manifest
from tpu_asr.data.tarred import (TarredAudioToBPEDataset, expand_shard_pattern,
                                 make_tarred_dataloader)
from tpu_asr.data.tokenizer import CharTokenizer, train_bpe


@pytest.fixture(scope="module")
def tarred_corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("tarred")
    rng = np.random.default_rng(0)
    entries = []
    wavs = {}
    for i in range(6):
        dur = 0.5 + 0.3 * i
        x = (rng.normal(size=int(16000 * dur)) * 0.1).astype(np.float32)
        name = f"utt{i}.wav"
        p = root / name
        write_wav(p, x, 16000)
        wavs.setdefault(i % 2, []).append(p)
        entries.append(ManifestEntry(name, dur, f"utt number {i}"))
    # two shards
    for shard_id, paths in wavs.items():
        with tarfile.open(root / f"audio_{shard_id}.tar", "w") as tar:
            for p in paths:
                tar.add(p, arcname=p.name)
    man = root / "manifest.jsonl"
    write_manifest(man, entries)
    return root, str(man)


def test_expand_shard_pattern(tarred_corpus, tmp_path):
    root, _ = tarred_corpus
    assert len(expand_shard_pattern(str(root / "audio_{0..1}.tar"))) == 2
    assert len(expand_shard_pattern(str(root / "audio_*.tar"))) == 2
    assert len(expand_shard_pattern([root / "audio_0.tar"])) == 1


def test_tarred_dataset_streams_all_samples(tarred_corpus):
    root, man = tarred_corpus
    tok = train_bpe(["utt number " + " ".join(str(i) for i in range(6))] * 3,
                    vocab_size=48)
    ds = TarredAudioToBPEDataset(man, str(root / "audio_{0..1}.tar"), tok,
                                 max_duration=5.0)
    assert len(ds) == 6
    samples = list(ds.iter_samples(epoch=0))
    assert len(samples) == 6
    texts = {s.text for s in samples}
    assert texts == {f"utt number {i}" for i in range(6)}

    # sharding partitions samples
    n0 = len(list(ds.iter_samples(num_shards=2, shard_index=0)))
    n1 = len(list(ds.iter_samples(num_shards=2, shard_index=1)))
    assert n0 + n1 == 6 and n0 > 0 and n1 > 0


def test_tarred_dataloader_static_shapes(tarred_corpus):
    from tpu_asr.data.dataset import _bucket_edges

    root, man = tarred_corpus
    tok = train_bpe(["utt number 0 1 2 3 4 5"] * 3, vocab_size=48)
    ds = TarredAudioToBPEDataset(man, str(root / "audio_*.tar"), tok,
                                 max_duration=5.0)
    cfg = DataConfig(batch_size=2, num_buckets=3, max_duration=5.0,
                     shuffle=False)
    edges = {int(e) for e in _bucket_edges(5.0, 3, 16000)}
    seen = 0
    for batch in make_tarred_dataloader(ds, cfg):
        seen += batch["signal"].shape[0]
        assert batch["signal"].shape[1] in edges
        assert batch["tokens"].shape[1] % 16 == 0
    assert seen == 6


def test_char_tokenizer_roundtrip(tmp_path):
    tok = CharTokenizer.from_corpus(["hello world", "abc"])
    ids = tok.text_to_ids("hello")
    assert tok.ids_to_text(ids) == "hello"
    p = tmp_path / "chars.json"
    tok.save(p)
    tok2 = CharTokenizer.from_file(p)
    assert tok2.vocab == tok.vocab
    assert tok2.text_to_ids("world") == tok.text_to_ids("world")
