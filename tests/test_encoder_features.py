"""Local (limited-context) attention + stochastic depth tests — mirrors
NeMo's test_asr_local_attn.py / test_conformer_encoder.py stochastic-depth
coverage (SURVEY.md §4)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_asr.config import EncoderConfig
from tpu_asr.models.conformer import (ConformerEncoder,
                                      RelPositionMultiHeadAttention,
                                      rel_positional_encoding)


def _enc_cfg(**kw):
    base = dict(feat_in=24, n_layers=2, d_model=32, n_heads=4,
                conv_kernel_size=7, conv_norm_type="layer_norm",
                dropout=0.0, dropout_pre_encoder=0.0, dropout_att=0.0)
    base.update(kw)
    return EncoderConfig(**base)


def test_local_attention_limits_context():
    """A query must not see keys outside [t-left, t+right]: perturbing a key
    outside the window must not change the query's output."""
    d, h, t = 32, 4, 20
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, t, d)),
                    jnp.float32)
    mask = jnp.ones((1, t), bool)
    pos = rel_positional_encoding(t, d)
    mha = RelPositionMultiHeadAttention(d, h, 0.0, jnp.float32,
                                        att_context_size=(2, 2))
    params = mha.init(jax.random.PRNGKey(0), x, pos, mask)
    y = mha.apply(params, x, pos, mask)

    # perturb position 10: outputs at |t-10| > 2 must be unchanged
    x2 = x.at[0, 10].add(5.0)
    y2 = mha.apply(params, x2, pos, mask)
    delta = np.abs(np.asarray(y2 - y)).max(axis=-1)[0]
    assert delta[10 - 3] == 0.0 and delta[10 + 3] == 0.0
    assert delta[10] > 0.0 and delta[10 - 2] > 0.0 and delta[10 + 2] > 0.0

    # unlimited context: everything changes
    mha_full = RelPositionMultiHeadAttention(d, h, 0.0, jnp.float32)
    params_f = mha_full.init(jax.random.PRNGKey(0), x, pos, mask)
    yf = mha_full.apply(params_f, x, pos, mask)
    yf2 = mha_full.apply(params_f, x2, pos, mask)
    assert np.abs(np.asarray(yf2 - yf)).max(axis=-1)[0].min() > 0.0


def test_stochastic_depth_train_vs_eval():
    cfg = _enc_cfg(stochastic_depth_drop_prob=0.5,
                   stochastic_depth_start_layer=0)
    enc = ConformerEncoder(cfg)
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(2, 24, 40)), jnp.float32)
    lengths = jnp.asarray([40, 40], jnp.int32)
    key = jax.random.PRNGKey(0)
    variables = enc.init({"params": key, "dropout": key, "layerdrop": key},
                         feats, lengths, train=True)

    # eval: deterministic, no rng needed
    out_e, _, _ = enc.apply(variables, feats, lengths, train=False)
    out_e2, _, _ = enc.apply(variables, feats, lengths, train=False)
    np.testing.assert_array_equal(np.asarray(out_e), np.asarray(out_e2))

    # train: varying the layerdrop rng must produce >1 distinct output
    # (with 2 layers at p=0.5 any single pair may collide by chance)
    outs = []
    for seed in range(8):
        o, _, _ = enc.apply(variables, feats, lengths, train=True,
                            rngs={"dropout": jax.random.PRNGKey(1),
                                  "layerdrop": jax.random.PRNGKey(seed)})
        outs.append(np.asarray(o).tobytes())
    assert len(set(outs)) > 1


def test_stochastic_depth_off_means_no_layerdrop_rng_needed():
    cfg = _enc_cfg()
    enc = ConformerEncoder(cfg)
    feats = jnp.asarray(np.random.default_rng(0).normal(size=(1, 24, 40)),
                        jnp.float32)
    lengths = jnp.asarray([40], jnp.int32)
    key = jax.random.PRNGKey(0)
    variables = enc.init({"params": key, "dropout": key}, feats, lengths,
                         train=True)
    enc.apply(variables, feats, lengths, train=True,
              rngs={"dropout": key})     # no layerdrop stream — must not fail


def test_encoder_local_attention_end_to_end():
    cfg = _enc_cfg(att_context_size=(4, 4))
    enc = ConformerEncoder(cfg)
    feats = jnp.asarray(np.random.default_rng(0).normal(size=(1, 24, 64)),
                        jnp.float32)
    lengths = jnp.asarray([64], jnp.int32)
    variables = enc.init(jax.random.PRNGKey(0), feats, lengths)
    out, out_len, lf = enc.apply(variables, feats, lengths)
    assert np.all(np.isfinite(np.asarray(out)))
    assert lf.shape[0] == cfg.n_layers


def test_remat_same_values_and_grads():
    """remat=True must be value- and gradient-identical (it only changes the
    backward-pass memory/recompute schedule)."""
    import jax

    cfg_a = _enc_cfg()
    cfg_b = _enc_cfg(remat=True)
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(2, 24, 40)), jnp.float32)
    lengths = jnp.asarray([40, 40], jnp.int32)
    enc_a = ConformerEncoder(cfg_a)
    enc_b = ConformerEncoder(cfg_b)
    variables = enc_a.init(jax.random.PRNGKey(0), feats, lengths)

    def loss(enc):
        def f(params):
            out, _, _ = enc.apply({"params": params}, feats, lengths)
            return jnp.sum(jnp.square(out))
        return f

    va, ga = jax.value_and_grad(loss(enc_a))(variables["params"])
    vb, gb = jax.value_and_grad(loss(enc_b))(variables["params"])
    np.testing.assert_allclose(float(va), float(vb), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        # recompute reassociates float ops; tolerance covers that only
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)
