"""Conformer encoder tests: rel-shift correctness, shapes, length math, padding
invariance (mirrors NeMo's test_padding_and_batch_size_invariance / conformer tests)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_asr.config import EncoderConfig, DecoderConfig, ModelConfig, PreprocessorConfig
from tpu_asr.models.conformer import (
    ConformerEncoder,
    rel_positional_encoding,
    rel_shift,
    subsampled_length,
)


SMALL = EncoderConfig(feat_in=80, n_layers=2, d_model=32, n_heads=4, dropout=0.0,
                      dropout_att=0.0, dropout_pre_encoder=0.0)


def test_rel_shift_brute_force(rng):
    b, h, t = 2, 3, 7
    x = jnp.asarray(rng.standard_normal((b, h, t, 2 * t - 1)).astype(np.float32))
    got = np.asarray(rel_shift(x))
    x_np = np.asarray(x)
    # pos index j encodes relative position rel = t-1-j; output[t_,s] = x[t_, t-1-t_+s]
    for ti in range(t):
        for s in range(t):
            j = t - 1 - ti + s
            np.testing.assert_allclose(got[:, :, ti, s], x_np[:, :, ti, j], rtol=1e-6)


def test_rel_positional_encoding():
    pe = np.asarray(rel_positional_encoding(5, 16))
    assert pe.shape == (9, 16)
    # center row is position 0: sin(0)=0, cos(0)=1
    np.testing.assert_allclose(pe[4, 0::2], 0.0, atol=1e-7)
    np.testing.assert_allclose(pe[4, 1::2], 1.0, atol=1e-7)
    # descending positions: first row is position t-1 = 4
    np.testing.assert_allclose(pe[0, 0], np.sin(4.0), atol=1e-6)


def test_subsampled_length():
    # k=3,s=2,p=1 twice: L -> floor((L-1)/2)+1 twice
    lens = jnp.array([1, 2, 3, 100, 101, 1671])
    out = np.asarray(subsampled_length(lens, 4))
    expected = []
    for l in [1, 2, 3, 100, 101, 1671]:
        a = (l - 1) // 2 + 1
        expected.append((a - 1) // 2 + 1)
    np.testing.assert_array_equal(out, expected)


def test_encoder_shapes(rng):
    enc = ConformerEncoder(SMALL)
    b, f, t = 2, 80, 64
    feats = jnp.asarray(rng.standard_normal((b, f, t)).astype(np.float32))
    lens = jnp.array([64, 40])
    variables = enc.init(jax.random.PRNGKey(0), feats, lens)
    out, out_len, layer_feats = enc.apply(variables, feats, lens)
    t_sub = int(subsampled_length(jnp.array([t]), 4)[0])
    assert out.shape == (b, t_sub, SMALL.d_model)
    assert layer_feats.shape == (SMALL.n_layers, b, t_sub, SMALL.d_model)
    np.testing.assert_array_equal(np.asarray(out_len), np.asarray(subsampled_length(lens, 4)))
    # padded positions zeroed
    out_np = np.asarray(out)
    assert np.all(out_np[1, int(out_len[1]):] == 0.0)


def test_encoder_padding_invariance(rng):
    """Result for a sample must not depend on other samples' padding (batch-size
    invariance, as pinned by NeMo's test_padding_and_batch_size_invariance)."""
    cfg = EncoderConfig(feat_in=80, n_layers=2, d_model=32, n_heads=4, dropout=0.0,
                        dropout_att=0.0, dropout_pre_encoder=0.0,
                        conv_norm_type="layer_norm")  # batch_norm is batch-coupled by design
    enc = ConformerEncoder(cfg)
    f, t1, t2 = 80, 48, 64
    x1 = rng.standard_normal((1, f, t1)).astype(np.float32)
    x1_padded = np.concatenate([x1, np.zeros((1, f, t2 - t1), np.float32)], axis=-1)
    x_other = rng.standard_normal((1, f, t2)).astype(np.float32)
    batch = jnp.asarray(np.concatenate([x1_padded, x_other], axis=0))

    variables = enc.init(jax.random.PRNGKey(0), batch, jnp.array([t1, t2]))
    solo, solo_len, _ = enc.apply(variables, jnp.asarray(x1), jnp.array([t1]))
    both, both_len, _ = enc.apply(variables, batch, jnp.array([t1, t2]))

    n = int(solo_len[0])
    np.testing.assert_allclose(
        np.asarray(both)[0, :n], np.asarray(solo)[0, :n], atol=2e-5, rtol=1e-4)


def test_encoder_batchnorm_stats_update(rng):
    enc = ConformerEncoder(SMALL)
    feats = jnp.asarray(rng.standard_normal((2, 80, 32)).astype(np.float32))
    lens = jnp.array([32, 32])
    variables = enc.init(jax.random.PRNGKey(0), feats, lens)
    assert "batch_stats" in variables
    out, updates = enc.apply(
        variables, feats, lens, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(1)})
    new_mean = jax.tree_util.tree_leaves(updates["batch_stats"])[0]
    old_mean = jax.tree_util.tree_leaves(variables["batch_stats"])[0]
    assert not np.allclose(np.asarray(new_mean), np.asarray(old_mean))


def test_ctc_model_end_to_end(rng):
    from tpu_asr.models.ctc_model import CTCModel

    cfg = ModelConfig(
        preprocessor=PreprocessorConfig(dither=0.0),
        encoder=SMALL,
        decoder=DecoderConfig(feat_in=32, num_classes=28),
    )
    model = CTCModel(cfg)
    sig = jnp.asarray(rng.standard_normal((2, 16000)).astype(np.float32) * 0.1)
    lens = jnp.array([16000, 12000])
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "specaug": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)}, sig, lens)
    out = model.apply(variables, sig, lens)
    n_frames = 16000 // 160 + 1
    t_sub = int(subsampled_length(jnp.array([n_frames]), 4)[0])
    assert out.log_probs.shape == (2, t_sub, 29)
    assert out.layer_feats.shape == (SMALL.n_layers, 2, t_sub, 32)
    # log-probs normalized
    np.testing.assert_allclose(
        np.asarray(jnp.sum(jnp.exp(out.log_probs), axis=-1)), 1.0, atol=1e-4)
    # training mode runs with specaug + dropout rngs
    out_t, _ = model.apply(
        variables, sig, lens, True, mutable=["batch_stats"],
        rngs={"specaug": jax.random.PRNGKey(3), "dropout": jax.random.PRNGKey(4)})
    assert out_t.log_probs.shape == (2, t_sub, 29)
