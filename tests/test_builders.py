"""HF dataset-builder tests (structural + example-generation on synthetic
archives; no network — the download paths are exercised only up to URL
construction). Pins the reference builder contract: config names, split
names, feature schemas, and the per-utterance example semantics
(reference librispeech_asr.py / tedlium_asr.py / gigaspeech.py /
commonvoice_asr.py — R18 in SURVEY.md §2.1)."""

import csv
import importlib.util
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


def _load(name):
    spec = importlib.util.spec_from_file_location(name, REPO / f"{name}.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules.setdefault(name, mod)
    spec.loader.exec_module(mod)
    return mod


librispeech = _load("librispeech_asr")
tedlium = _load("tedlium_asr")
gigaspeech_mod = _load("gigaspeech")
commonvoice = _load("commonvoice_asr")
release_stats = _load("release_stats")


def test_librispeech_configs_and_splits():
    names = {c.name for c in librispeech.LibrispeechASR.BUILDER_CONFIGS}
    assert names == {"train_100", "for_experiments", "clean", "other", "all"}
    assert set(librispeech._CONFIG_SPLITS["train_100"]) == {
        "train.clean.100", "dev.clean", "dev.other", "test.clean",
        "test.other"}
    assert librispeech._CONFIG_SPLITS["all"][-1] == "test.other"
    # archive resolution for short split names
    b = librispeech.LibrispeechASR(config_name="clean")
    assert b._archive_key("dev") == "dev.clean"
    b2 = librispeech.LibrispeechASR(config_name="other")
    assert b2._archive_key("test") == "test.other"


def test_librispeech_generate_examples():
    b = librispeech.LibrispeechASR(config_name="train_100")
    files = [
        ("x/1-2-0001.flac", _Bytes(b"FAKEFLAC1")),
        ("x/1-2-0002.flac", _Bytes(b"FAKEFLAC2")),
        ("x/1-2.trans.txt",
         _Bytes(b"1-2-0001 HELLO WORLD\n1-2-0002 SECOND LINE\n")),
    ]
    out = list(b._generate_examples(iter(files), None))
    assert len(out) == 2
    key, ex = out[0]
    assert ex["text"] == "HELLO WORLD"
    assert ex["speaker_id"] == 1 and ex["chapter_id"] == 2
    assert ex["audio"]["bytes"] == b"FAKEFLAC1"


class _Bytes:
    def __init__(self, data):
        self._data = data

    def read(self):
        return self._data

    def __iter__(self):
        return iter(self._data.splitlines(keepends=True))


def _make_sph(samples: np.ndarray, rate=16000) -> bytes:
    header = (f"NIST_1A\n   1024\nsample_rate -i {rate}\n"
              f"channel_count -i 1\nsample_n_bytes -i 2\nend_head\n")
    return header.encode().ljust(1024) + samples.astype("<i2").tobytes()


def test_tedlium_sph_reader_and_examples(tmp_path):
    rate = 16000
    samples = (np.sin(np.arange(rate * 2) * 0.01) * 1000).astype(np.int16)
    got, r = tedlium._read_sph(__import__("io").BytesIO(_make_sph(samples)))
    assert r == rate
    np.testing.assert_array_equal(got, samples)

    # streaming-mode example generation: one talk, two stm segments
    stm = (b"talk1 1 spk1 0.0 1.0 <o,f0,female> hello there\n"
           b"talk1 1 spk1 1.0 2.0 <o,f0,male> general kenobi "
           b"ignore_time_segment_in_scoring\n")
    archive = [("TEDLIUM/train/sph/talk1.sph", _Bytes(_make_sph(samples))),
               ("TEDLIUM/train/stm/talk1.stm", _Bytes(stm))]
    b = tedlium.TedLium(config_name="release1")
    out = list(b._generate_examples([iter(archive)], None, "train"))
    assert len(out) == 2
    _, ex0 = out[0]
    assert ex0["text"] == "hello there"
    assert ex0["gender"] == "female"
    assert len(ex0["audio"]["array"]) == rate          # 1 s segment
    _, ex1 = out[1]
    assert ex1["text"] == "general kenobi"             # suffix trimmed
    assert ex1["gender"] == "male"


def test_tedlium_configs():
    names = [c.name for c in tedlium.TedLium.BUILDER_CONFIGS]
    assert names == ["release1", "release2", "release3",
                     "release3-speaker-adaptation"]
    r2 = tedlium.TedLium.BUILDER_CONFIGS[1]
    assert len(r2.download_urls["train"]) == 2          # train_1 + train_2
    assert "TEDLIUM_release2" in r2.download_urls["train"][0]


def test_gigaspeech_nested_subsets_and_examples(tmp_path):
    cfgs = {c.name: c for c in gigaspeech_mod.Gigaspeech.BUILDER_CONFIGS}
    assert set(cfgs) == {"xs", "s", "m", "l", "xl", "dev", "test"}
    assert cfgs["m"].subsets_to_download == ("xs", "s", "m")
    assert cfgs["xs"].subsets_to_download == ("xs",)
    assert cfgs["dev"].subsets_to_download == ("dev",)
    assert gigaspeech_mod.Gigaspeech._is_additional_data("xs") == ""
    assert gigaspeech_mod.Gigaspeech._is_additional_data("m") == "_additional"

    meta = tmp_path / "meta.csv"
    with open(meta, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["sid", "aid", "path", "text_tn",
                                          "speaker", "begin_time", "end_time",
                                          "title", "url", "source", "category"])
        w.writeheader()
        w.writerow({"sid": "SEG1", "aid": "AUD1", "path": "a/b.opus",
                    "text_tn": "HELLO <COMMA> WORLD", "speaker": "spk",
                    "begin_time": "0.0", "end_time": "1.0", "title": "t",
                    "url": "u", "source": "youtube", "category": ""})
    b = gigaspeech_mod.Gigaspeech(config_name="xs")
    archive = [("chunk0/SEG1.wav", _Bytes(b"WAVBYTES"))]
    out = list(b._generate_examples([iter(archive)], None, [str(meta)]))
    assert len(out) == 1
    _, ex = out[0]
    assert ex["segment_id"] == "SEG1"
    assert ex["text"] == "HELLO <COMMA> WORLD"
    assert ex["category"] == "N/A"                     # empty -> N/A
    assert ex["audio"]["bytes"] == b"WAVBYTES"


def test_commonvoice_config_and_examples():
    assert "en" in {c.name for c in commonvoice.CommonVoice.BUILDER_CONFIGS}
    assert release_stats.STATS["bundleURLTemplate"].startswith("cv-corpus-7.0")
    b = commonvoice.CommonVoice(config_name="en")
    tsv = ("client_id\tpath\tsentence\tup_votes\tdown_votes\tage\tgender\t"
           "accents\tlocale\tsegment\n"
           "c1\tclip1\tHello world.\t2\t0\t20s\tother\tus\ten\t\n")
    archive = [
        ("cv-corpus-7.0-2021-07-21/en/train.tsv", _Bytes(tsv.encode())),
        ("cv-corpus-7.0-2021-07-21/en/clips/clip1.mp3", _Bytes(b"MP3BYTES")),
    ]
    out = list(b._generate_examples(
        None, iter(archive),
        "cv-corpus-7.0-2021-07-21/en/train.tsv",
        "cv-corpus-7.0-2021-07-21/en/clips"))
    assert len(out) == 1
    _, ex = out[0]
    assert ex["sentence"] == "Hello world."
    assert ex["accent"] == "us"                        # accents -> accent
    assert ex["audio"]["bytes"] == b"MP3BYTES"
