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


def test_change_vocabulary_and_decoding_strategy():
    import jax

    from tpu_asr.data.tokenizer import train_bpe
    from tpu_asr.models.ctc_model import CTCModel
    from tpu_asr.models.vocab import (change_decoding_strategy,
                                      change_vocabulary)

    cfg = _tiny_cfg()
    model = CTCModel(cfg)
    sig = jnp.zeros((1, 8000), jnp.float32)
    ln = jnp.asarray([8000], jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), sig, ln)

    new_tok = train_bpe(["x y z x y"] * 4, vocab_size=24)
    new_cfg, new_params = change_vocabulary(cfg, variables["params"], new_tok,
                                            jax.random.PRNGKey(1))
    assert new_cfg.decoder.num_classes == new_tok.vocab_size
    # encoder untouched, decoder reshaped
    old_k = variables["params"]["encoder"]["pre_encode"]["out"]["kernel"]
    np.testing.assert_array_equal(
        np.asarray(new_params["encoder"]["pre_encode"]["out"]["kernel"]),
        np.asarray(old_k))
    new_model = CTCModel(new_cfg)
    out = new_model.apply({"params": new_params}, sig, ln)
    assert out.log_probs.shape[-1] == new_tok.vocab_size + 1

    dec = change_decoding_strategy(new_tok, "beam", beam_width=4)
    assert dec.strategy == "beam"


def test_aggregate_tokenizer():
    from tpu_asr.data.tokenizer import AggregateTokenizer, train_bpe

    en = train_bpe(["hello world hello"] * 4, vocab_size=24)
    de = train_bpe(["hallo welt hallo"] * 4, vocab_size=24)
    agg = AggregateTokenizer({"en": en, "de": de})
    assert agg.vocab_size == en.vocab_size + de.vocab_size
    ids_en = agg.text_to_ids("hello", "en")
    ids_de = agg.text_to_ids("hallo", "de")
    assert min(ids_de) >= en.vocab_size          # offset applied
    assert agg.ids_to_text(ids_en) == "hello"
    assert agg.ids_to_text(ids_de) == "hallo"
    assert agg.ids_to_text(ids_en + ids_de) == "hello hallo"


def test_skip_nan_grad_zeroes_nonfinite():
    import jax
    import dataclasses

    from tpu_asr.config import (DistillationConfig, OptimConfig,
                                make_student_config)
    from tpu_asr.models.distil_model import DistilCTCModel
    from tpu_asr.train.optim import build_optimizer
    from tpu_asr.train.trainer import DistilTrainState, make_distil_train_step

    teacher_cfg = dataclasses.replace(_tiny_cfg(), skip_nan_grad=True)
    student_cfg = make_student_config(teacher_cfg)
    model = DistilCTCModel(student_cfg, teacher_cfg, DistillationConfig())
    rng = np.random.default_rng(0)
    batch = {
        "signal": jnp.asarray(rng.normal(size=(2, 8000)).astype(np.float32) * 0.1),
        "signal_len": jnp.full((2,), 8000, jnp.int32),
        "tokens": jnp.asarray(rng.integers(0, 12, size=(2, 6)), jnp.int32),
        "token_len": jnp.full((2,), 6, jnp.int32),
    }
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key, "specaug": key, "dropout": key},
                           batch["signal"], batch["signal_len"],
                           batch["tokens"], batch["token_len"], train=True)
    tx = build_optimizer(OptimConfig(lr=1e-3, sched_name="none", d_model=16),
                         variables["params"])
    state = DistilTrainState.create(apply_fn=model.apply,
                                    params=variables["params"],
                                    batch_stats=variables.get("batch_stats", {}),
                                    tx=tx)
    step = jax.jit(make_distil_train_step(model))
    state, metrics = step(state, batch, key)
    assert "nonfinite_grad_elems" in metrics
    assert int(metrics["nonfinite_grad_elems"]) == 0
    # params stayed finite after the guarded update
    assert all(np.all(np.isfinite(np.asarray(g)))
               for g in jax.tree.leaves(state.params["student"]))
