"""Transcriber + chunked long-form inference tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_asr.config import (DecoderConfig, EncoderConfig, ModelConfig,
                            PreprocessorConfig)
from tpu_asr.data.audio import write_wav
from tpu_asr.data.tokenizer import train_bpe
from tpu_asr.models.ctc_model import CTCModel
from tpu_asr.models.transcribe import ChunkedTranscriber, Transcriber


@pytest.fixture(scope="module")
def setup():
    cfg = ModelConfig(
        preprocessor=PreprocessorConfig(features=24),
        spec_augment=None,
        encoder=EncoderConfig(feat_in=24, n_layers=2, d_model=32, n_heads=4,
                              conv_kernel_size=7, conv_norm_type="layer_norm",
                              dropout=0.0, dropout_pre_encoder=0.0,
                              dropout_att=0.0),
        decoder=DecoderConfig(feat_in=32, num_classes=16),
        compute_dtype="float32",
    )
    model = CTCModel(cfg)
    sig = jnp.zeros((1, 8000), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), sig,
                           jnp.asarray([8000], jnp.int32))
    tok = train_bpe(["a b c d e f g h"], vocab_size=16)
    return model, variables, tok


def test_transcriber_batching_and_order(setup, tmp_path):
    model, variables, tok = setup
    rng = np.random.default_rng(0)
    waves = [rng.normal(size=n).astype(np.float32) * 0.05
             for n in (8000, 24000, 12000, 16000, 9000)]
    p = tmp_path / "w.wav"
    write_wav(p, waves[0], 16000)
    inputs = [str(p)] + waves[1:]

    tr = Transcriber(model, variables, tok, batch_size=2)
    texts = tr.transcribe(inputs)
    assert len(texts) == 5
    assert all(isinstance(t, str) for t in texts)

    # per-item result must match a single-item call (ordering preserved)
    single = tr.transcribe([waves[2]])[0]
    assert texts[2] == single


def test_chunked_matches_full_on_medium_audio(setup):
    """For audio that fits one chunk the chunked path must equal the full
    forward; for longer audio it must produce a finite transcription."""
    model, variables, tok = setup
    rng = np.random.default_rng(1)
    x = rng.normal(size=3 * 16000).astype(np.float32) * 0.05

    tr = Transcriber(model, variables, tok)
    chunked = ChunkedTranscriber(model, variables, tok, chunk_seconds=4.0,
                                 overlap_seconds=0.5)
    assert chunked.transcribe(x) == tr.transcribe([x])[0]

    long_x = rng.normal(size=11 * 16000).astype(np.float32) * 0.05
    out = chunked.transcribe(long_x)
    assert isinstance(out, str)


def test_transcribe_timestamps_in_seconds(setup):
    """NeMo transcribe(..., timestamps=True): hypotheses whose offset dicts
    carry 'start'/'end' seconds (offset x hop x subsampling / sr)."""
    model, variables, tok = setup
    rng = np.random.default_rng(2)
    waves = [rng.normal(size=16000).astype(np.float32) * 0.05]
    tr = Transcriber(model, variables, tok)
    hyps = tr.transcribe(waves, timestamps=True)
    h = hyps[0]
    assert isinstance(h.timestamp, dict)
    frame_s = (model.cfg.preprocessor.hop_length
               * model.cfg.encoder.subsampling_factor / 16000)
    for kind in ("char", "word", "segment"):
        for off in h.timestamp[kind]:
            assert off["start"] == pytest.approx(
                off["start_offset"] * frame_s)
            assert off["end"] == pytest.approx(
                (off["end_offset"] + 1) * frame_s)
            assert off["end"] <= 1.0 + 2 * frame_s   # within the 1 s clip


def test_strategy_aliases(setup):
    from tpu_asr.ops.decoding import CTCDecoding
    _, _, tok = setup
    assert CTCDecoding(tok, "pyctcdecode").strategy == "beam"
    assert CTCDecoding(tok, "flashlight",
                       lexicon_words=["a", "b"]).strategy == "beam"
    with pytest.raises(ValueError):
        CTCDecoding(tok, "flashlight")
    with pytest.raises(ValueError):
        CTCDecoding(tok, "wfst")
