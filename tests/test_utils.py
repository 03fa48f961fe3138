"""Tests for archives (.tasr save/restore), neural-type contracts, and the
exp-manager helpers."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_asr.config import (DecoderConfig, EncoderConfig, ModelConfig,
                            PreprocessorConfig)
from tpu_asr.models.ctc_model import CTCModel
from tpu_asr.utils.archive import (restore_archive, restore_tokenizer,
                                   save_archive)
from tpu_asr.utils.exp_manager import StepTimer, setup_experiment
from tpu_asr.utils.neural_types import (AudioSignal, B, D, LengthsType,
                                        NeuralType, T, typecheck)


def _tiny_cfg():
    return ModelConfig(
        preprocessor=PreprocessorConfig(features=24),
        spec_augment=None,
        encoder=EncoderConfig(feat_in=24, n_layers=2, d_model=32, n_heads=4,
                              conv_kernel_size=7, conv_norm_type="layer_norm"),
        decoder=DecoderConfig(feat_in=32, num_classes=12),
        compute_dtype="float32",
    )


def test_archive_roundtrip(tmp_path):
    cfg = _tiny_cfg()
    model = CTCModel(cfg)
    sig = jnp.zeros((1, 8000), jnp.float32)
    ln = jnp.asarray([8000], jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), sig, ln)

    from tpu_asr.data.tokenizer import train_bpe
    tok = train_bpe(["a b c a b"], vocab_size=16)
    tok_path = tmp_path / "tok.json"
    tok.save(tok_path)

    arc = save_archive(tmp_path / "model.tasr", cfg, variables["params"],
                       variables.get("batch_stats"), tok_path)
    cfg2, params2, stats2, tok_bytes = restore_archive(arc)
    assert cfg2.encoder.d_model == 32
    assert cfg2.decoder.num_classes == 12
    for a, b in zip(jax.tree.leaves(variables["params"]),
                    jax.tree.leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    tok2 = restore_tokenizer(tok_bytes)
    assert tok2.text_to_ids("a b") == tok.text_to_ids("a b")

    # restored model actually runs
    out = model.apply({"params": params2, "batch_stats": stats2 or {}},
                      sig, ln)
    assert out.log_probs.shape[-1] == 13


def test_neural_typecheck():
    @typecheck(input_types={
        "signal": NeuralType((B, T), AudioSignal()),
        "length": NeuralType((B,), LengthsType()),
    })
    def fwd(signal, length):
        return signal.sum()

    fwd(jnp.zeros((2, 10)), jnp.zeros((2,)))
    with pytest.raises(TypeError, match="rank 2"):
        fwd(jnp.zeros((2, 10, 3)), jnp.zeros((2,)))
    with pytest.raises(TypeError, match="rank 1"):
        fwd(jnp.zeros((2, 10)), jnp.zeros((2, 1)))
    # works under jit (trace-time shapes)
    jax.jit(lambda s, l: fwd(s, l))(jnp.zeros((2, 10)), jnp.zeros((2,)))


def test_setup_experiment_and_versioning(tmp_path, monkeypatch):
    monkeypatch.setenv("PRJ_NAME", "proj")
    monkeypatch.setenv("EXP_NAME", "exp")
    w1 = setup_experiment(tmp_path, config=_tiny_cfg())
    assert w1 == tmp_path / "proj" / "exp"
    assert (w1 / "config.json").exists()
    cfg = json.loads((w1 / "config.json").read_text())
    assert cfg["encoder"]["d_model"] == 32
    # rerun with content -> versioned dir
    w2 = setup_experiment(tmp_path)
    assert w2.name == "exp-v1"


def test_step_timer():
    t = StepTimer()
    assert t.tick() is None
    for _ in range(5):
        t.tick()
    s = t.summary()
    assert s["steps_measured"] == 5
    assert s["step_time_mean"] >= 0
    assert s["step_time_p95"] >= s["step_time_p50"]
