"""MP3 + Ogg/Opus codec tests (VERDICT r2 missing #1).

Fixtures are generated offline with the image's own encoders (libmp3lame,
libopus) and round-tripped through the ctypes decoders — no binary files in
the repo, and the encode side is itself exercised. End-to-end: a
CommonVoice-style mp3 manifest and a GigaSpeech-style opus manifest flow
through AudioToBPEDataset -> Trainer.evaluate (reference asr_inference_CV.py
/ gigaspeech.py eval suites).
"""

import numpy as np
import pytest

from tpu_asr.data import codecs
from tpu_asr.data.audio import load_audio, read_audio


def _speech_like(sr: int, seconds: float, seed: int = 0) -> np.ndarray:
    """Band-limited multi-tone burst: survives lossy codecs, aligns sharply
    under cross-correlation (unlike a single sine)."""
    rng = np.random.default_rng(seed)
    t = np.arange(int(sr * seconds)) / sr
    x = sum(a * np.sin(2 * np.pi * f * t + p) for a, f, p in
            zip([0.3, 0.2, 0.15, 0.1],
                [220.0, 447.0, 991.0, 1723.0],
                rng.uniform(0, 2 * np.pi, 4)))
    env = np.minimum(1.0, 10.0 * t) * np.minimum(1.0, 10.0 * (t[-1] - t))
    return (x * env).astype(np.float32)


def _aligned_corr(ref: np.ndarray, dec: np.ndarray, max_lag: int) -> float:
    """Max Pearson correlation of dec against ref over lags [0, max_lag]
    (codec delay shifts the decoded signal forward)."""
    n = min(len(ref), len(dec) - max_lag)
    best = -1.0
    for lag in range(0, max_lag, 16):
        seg = dec[lag:lag + n]
        c = np.corrcoef(ref[:n], seg)[0, 1]
        best = max(best, float(c))
    return best


@pytest.mark.skipif(not (codecs.HAVE_MP3 and codecs.HAVE_MP3_ENCODE),
                    reason="libmpg123/libmp3lame missing")
def test_mp3_round_trip_48k(tmp_path):
    """CommonVoice-style: mp3 at 48 kHz decodes to the native rate and the
    waveform survives (corr > 0.9 after codec-delay alignment)."""
    sr = 48000
    x = _speech_like(sr, 1.5)
    mp3 = codecs.encode_mp3(x, sr)
    assert mp3[:1] == b"\xff" or mp3[:3] == b"ID3"
    y, rate = codecs.decode_mp3(mp3)
    assert rate == sr
    # mp3 carries no exact length; encoder+decoder delay pads the output
    assert len(x) <= len(y) <= len(x) + sr // 10
    assert _aligned_corr(x, y, max_lag=4096) > 0.9

    # file-level dispatch: magic-sniffed (no extension needed) + resample
    p = tmp_path / "clip1.mp3"
    p.write_bytes(mp3)
    z, zr = read_audio(p)
    assert zr == sr and len(z) == len(y)
    z16 = load_audio(p, 16000)
    assert abs(len(z16) - len(y) // 3) <= 1


@pytest.mark.skipif(not codecs.HAVE_OPUS, reason="libopus missing")
def test_ogg_opus_round_trip(tmp_path):
    """GigaSpeech-style: Ogg/Opus decodes at 48 kHz with EXACT length
    recovery (pre-skip dropped, granulepos end trim) and corr > 0.99."""
    sr = 48000
    x = _speech_like(sr, 1.3, seed=1)
    ogg = codecs.encode_ogg_opus(x, sr)
    assert ogg[:4] == b"OggS"
    y, rate = codecs.decode_ogg_opus(ogg)
    assert rate == sr
    assert len(y) == len(x)              # opus is sample-exact
    assert float(np.corrcoef(x, y)[0, 1]) > 0.99

    p = tmp_path / "seg1.opus"
    p.write_bytes(ogg)
    z, zr = read_audio(p)
    np.testing.assert_array_equal(z, y)
    z16 = load_audio(p, 16000)
    assert len(z16) == len(x) // 3


@pytest.mark.skipif(not codecs.HAVE_OPUS, reason="libopus missing")
def test_ogg_crc_detects_corruption():
    x = _speech_like(48000, 0.3, seed=2)
    ogg = bytearray(codecs.encode_ogg_opus(x, 48000))
    ogg[len(ogg) // 2] ^= 0xFF           # flip a payload byte
    with pytest.raises(ValueError, match="CRC"):
        codecs.ogg_demux(bytes(ogg))


def test_ogg_page_packet_spanning():
    """Packets > 255 bytes span multiple lacing values; a 255-multiple packet
    needs a zero-length terminating lace. Pure framing logic, no libopus."""
    for size in (10, 255, 256, 510, 1000):
        pkt = bytes(range(256)) * (size // 256 + 1)
        pkt = pkt[:size]
        page = codecs._ogg_page(7, 0, 0, pkt)
        packets, gp = codecs.ogg_demux(page)
        assert packets == [pkt]


@pytest.mark.skipif(not (codecs.HAVE_MP3 and codecs.HAVE_OPUS
                         and codecs.HAVE_MP3_ENCODE),
                    reason="codec libs missing")
def test_compressed_corpus_end_to_end_eval(tmp_path):
    """CommonVoice-style mp3 + GigaSpeech-style opus manifests flow through
    AudioToBPEDataset -> Trainer.evaluate green (VERDICT r2 next #1)."""
    from tpu_asr.config import (DataConfig, DecoderConfig, DistillationConfig,
                                EncoderConfig, ModelConfig, OptimConfig,
                                PreprocessorConfig, TrainConfig,
                                make_student_config)
    from tpu_asr.data.audio import resample
    from tpu_asr.data.manifest import ManifestEntry, write_manifest
    from tpu_asr.data.tokenizer import train_bpe
    from tpu_asr.models.distil_model import DistilCTCModel
    from tpu_asr.train.loop import Trainer

    texts = ["common voice clip", "giga speech segment", "open source audio"]
    tok = train_bpe(texts * 5, vocab_size=40)

    entries = []
    for i, text in enumerate(texts):
        x48 = _speech_like(48000, 0.9 + 0.1 * i, seed=10 + i)
        if i % 2 == 0:                  # CommonVoice-style: mp3 @ 48 kHz
            p = tmp_path / f"clip{i}.mp3"
            p.write_bytes(codecs.encode_mp3(x48, 48000))
        else:                           # GigaSpeech-style: Ogg/Opus
            p = tmp_path / f"seg{i}.opus"
            p.write_bytes(codecs.encode_ogg_opus(x48, 48000))
        entries.append(ManifestEntry(str(p), len(x48) / 48000.0, text))
    manifest = tmp_path / "ood.jsonl"
    write_manifest(manifest, entries)

    teacher_cfg = ModelConfig(
        preprocessor=PreprocessorConfig(features=24),
        spec_augment=None,
        encoder=EncoderConfig(feat_in=24, n_layers=2, d_model=32, n_heads=4,
                              conv_kernel_size=7, conv_norm_type="layer_norm",
                              dropout=0.0, dropout_pre_encoder=0.0,
                              dropout_att=0.0),
        decoder=DecoderConfig(feat_in=32, num_classes=tok.vocab_size),
        compute_dtype="float32")
    student_cfg = make_student_config(teacher_cfg)
    distill = DistillationConfig()
    model = DistilCTCModel(student_cfg, teacher_cfg, distill)
    cfg = TrainConfig(
        model=student_cfg, distillation=distill,
        optim=OptimConfig(lr=1e-3, sched_name="none", d_model=16),
        train_ds=DataConfig(batch_size=3, num_buckets=1, max_duration=2.0),
        test_ds=DataConfig(batch_size=3, num_buckets=1, max_duration=2.0,
                           shuffle=False),
        max_epochs=1, dp_size=1)
    trainer = Trainer(model, cfg, tok, tmp_path / "run")
    from tpu_asr.data.dataset import AudioToBPEDataset, make_dataloader
    ds = AudioToBPEDataset(str(manifest), tok, 16000, 0.1, 2.0)
    assert len(ds) == 3                 # nothing filtered: all decodable
    first = next(iter(make_dataloader(ds, cfg.test_ds, epoch=0)))
    trainer.init_state(first)
    metrics = trainer.evaluate(str(manifest))
    assert metrics["num_utts"] == 3
    assert np.isfinite(metrics["loss"])
    assert np.isfinite(metrics["wer"]) and metrics["wer"] >= 0.0
