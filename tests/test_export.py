"""Serialized inference artifact tests (VERDICT r3 item 6; reference
ExportableEncDecModel, NeMo/nemo/collections/asr/models/asr_model.py:243-320).

export_inference stages the bucketed inference program to StableHLO via
jax.export and packs programs + tokenizer + metadata into one tar; the
loader must reproduce `transcribe()` outputs exactly without touching the
model class or checkpoint.
"""

import numpy as np
import pytest

from tpu_asr.config import (DecoderConfig, EncoderConfig, ModelConfig,
                            PreprocessorConfig)
from tpu_asr.convert.export import (ExportedTranscriber, export_inference,
                                    load_exported)
from tpu_asr.data.tokenizer import train_bpe
from tpu_asr.models.ctc_model import CTCModel
from tpu_asr.models.transcribe import Transcriber

import jax
import jax.numpy as jnp

FEAT, D_MODEL, LAYERS, HEADS = 24, 32, 2, 4


@pytest.fixture(scope="module")
def tiny_model():
    corpus = ["a quick brown fox", "jumps over lazy dogs"] * 3
    tok = train_bpe(corpus, vocab_size=32)
    cfg = ModelConfig(
        preprocessor=PreprocessorConfig(features=FEAT),
        spec_augment=None,
        encoder=EncoderConfig(feat_in=FEAT, n_layers=LAYERS, d_model=D_MODEL,
                              n_heads=HEADS, conv_kernel_size=7,
                              dropout=0.0, dropout_pre_encoder=0.0,
                              dropout_att=0.0),
        decoder=DecoderConfig(feat_in=D_MODEL, num_classes=tok.vocab_size),
        compute_dtype="float32",
    )
    model = CTCModel(cfg)
    sig = jnp.zeros((1, 1600), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, sig,
                           jnp.asarray([1600], jnp.int32), train=False)
    return model, variables, tok


@pytest.fixture(scope="module")
def artifact(tiny_model, tmp_path_factory):
    model, variables, tok = tiny_model
    path = tmp_path_factory.mktemp("exp") / "tiny.tasrx"
    return export_inference(model, variables, tok, path,
                            buckets=[(2, 0.2), (2, 0.4)])


def _signals(seed=0, n=3):
    rng = np.random.default_rng(seed)
    lens = [1400, 2500, 4700]
    return [rng.normal(scale=0.1, size=l).astype(np.float32)
            for l in lens[:n]]


def test_artifact_reproduces_transcribe(tiny_model, artifact):
    model, variables, tok = tiny_model
    ref = Transcriber(model, variables, tok, batch_size=2,
                      bucket_seconds=0.2).transcribe(_signals())
    ex = load_exported(artifact)
    assert isinstance(ex, ExportedTranscriber)
    got = ex.transcribe(_signals())
    assert got == ref


def test_no_crop_across_bucket_boundary(tiny_model, artifact):
    """A short and a long signal must not share a batch in the short bucket:
    batching sorted windows used to pick the bucket from the SHORTEST
    remaining signal and silently crop any longer one in the window."""
    model, variables, tok = tiny_model
    rng = np.random.default_rng(2)
    # 1400 fits bucket 0 (3200 samples); 4700 only fits bucket 1 (6400) —
    # with batch_size 2 the old code cropped it to 3200.
    sigs = [rng.normal(scale=0.1, size=l).astype(np.float32)
            for l in (1400, 4700)]
    ref = Transcriber(model, variables, tok, batch_size=2,
                      bucket_seconds=0.2).transcribe(sigs)
    ex = load_exported(artifact)
    assert ex.transcribe(sigs) == ref
    # and the grouping really put them in different buckets
    assert ex._pick(1400) != ex._pick(4700)


def test_program_logit_parity(tiny_model, artifact):
    model, variables, tok = tiny_model
    ex = e = load_exported(artifact)
    entry, prog = ex.buckets[0]
    bs, pad = entry["batch_size"], entry["pad_samples"]
    rng = np.random.default_rng(1)
    sig = rng.normal(scale=0.1, size=(bs, pad)).astype(np.float32)
    ln = np.asarray([pad, pad // 2], np.int32)
    logp, enc_len = prog.call(sig, ln)
    out = model.apply(variables, jnp.asarray(sig), jnp.asarray(ln),
                      train=False)
    np.testing.assert_allclose(np.asarray(logp),
                               np.asarray(out.log_probs), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(enc_len),
                                  np.asarray(out.encoded_len))


def test_manifest_and_tokenizer_roundtrip(tiny_model, artifact):
    _, _, tok = tiny_model
    ex = load_exported(artifact)
    m = ex.manifest
    assert m["sample_rate"] == 16000
    assert m["num_classes"] == tok.vocab_size
    assert [b["batch_size"] for b in m["buckets"]] == [2, 2]
    assert list(ex.tokenizer.vocab) == list(tok.vocab)


def test_loader_rejects_newer_format(tiny_model, tmp_path, artifact):
    import json
    import tarfile
    import io
    # rewrite the manifest with a future format version
    new = tmp_path / "future.tasrx"
    with tarfile.open(artifact) as src, tarfile.open(new, "w") as dst:
        for mem in src.getmembers():
            data = src.extractfile(mem).read()
            if mem.name == "manifest.json":
                obj = json.loads(data)
                obj["format_version"] = 999
                data = json.dumps(obj).encode()
            ti = tarfile.TarInfo(mem.name)
            ti.size = len(data)
            dst.addfile(ti, io.BytesIO(data))
    with pytest.raises(ValueError, match="newer"):
        load_exported(new)
