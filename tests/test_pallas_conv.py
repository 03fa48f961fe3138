"""Fused conv-module kernel parity (interpret mode on CPU) against the
module's XLA math — folded-BN eval, LayerNorm, ragged masks, causal context,
and end-to-end through the encoder."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_asr.config import EncoderConfig
from tpu_asr.models.conformer import ConformerConvolution
from tpu_asr.ops.pallas_conv import fused_conv_module


def _cfg(norm, d=88, k=9, causal=False):
    return EncoderConfig(
        feat_in=24, n_layers=2, d_model=d, n_heads=4, conv_kernel_size=k,
        conv_norm_type=norm, dropout=0.0, dropout_pre_encoder=0.0,
        dropout_att=0.0,
        conv_context_size="causal" if causal else None)


def _setup(norm, d=88, k=9, b=3, t=50, causal=False, seed=0):
    cfg = _cfg(norm, d, k, causal)
    mod = ConformerConvolution(cfg, jnp.float32)
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(b, t, d)).astype(np.float32) * 0.5)
    lengths = np.asarray([t, t - 7, 11][:b])
    mask = jnp.arange(t)[None, :] < jnp.asarray(lengths)[:, None]
    variables = mod.init({"params": jax.random.PRNGKey(1)}, x, mask, False)
    # non-trivial BN stats so the fold actually matters
    if norm == "batch_norm":
        variables = {
            "params": variables["params"],
            "batch_stats": {"batch_norm": {
                "mean": jnp.asarray(rng.normal(size=d).astype(np.float32) * .1),
                "var": jnp.asarray(
                    1.0 + rng.random(d).astype(np.float32)),
            }},
        }
    return cfg, mod, variables, x, mask


def _fused_args(cfg, variables, norm):
    p = variables["params"]
    w1 = p["pointwise_conv1"]["kernel"]
    b1 = p["pointwise_conv1"]["bias"]
    wd = p["depthwise_conv"]["kernel"][:, 0, :]
    bd = p["depthwise_conv"]["bias"]
    w2 = p["pointwise_conv2"]["kernel"]
    b2 = p["pointwise_conv2"]["bias"]
    if norm == "batch_norm":
        s = variables["batch_stats"]["batch_norm"]
        scale, bias = p["batch_norm"]["scale"], p["batch_norm"]["bias"]
        inv = 1.0 / np.sqrt(np.asarray(s["var"]) + 1e-5)
        nw = jnp.asarray(np.asarray(scale) * inv)
        nb = jnp.asarray(np.asarray(bias) - np.asarray(s["mean"])
                         * np.asarray(scale) * inv)
        kind = "affine"
    else:
        nw, nb = p["norm"]["scale"], p["norm"]["bias"]
        kind = "layer_norm"
    return (w1, b1, wd, bd, nw, nb, w2, b2), kind


@pytest.mark.parametrize("norm", ["batch_norm", "layer_norm"])
def test_fused_conv_matches_xla(norm):
    cfg, mod, variables, x, mask = _setup(norm)
    want = mod.apply(variables, x, mask, False)
    (w1, b1, wd, bd, nw, nb, w2, b2), kind = _fused_args(cfg, variables, norm)
    got = fused_conv_module(x, mask, w1, b1, wd, bd, nw, nb, w2, b2,
                            pad_l=cfg.conv_context[0], norm=kind,
                            interpret=True)
    # kernel matmuls run bf16 (the compute-path contract); the fp32 XLA
    # oracle differs by bf16 operand rounding
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=1.2e-2)


def test_fused_conv_causal_context():
    cfg, mod, variables, x, mask = _setup("layer_norm", causal=True, seed=2)
    assert cfg.conv_context[1] == 0
    want = mod.apply(variables, x, mask, False)
    (w1, b1, wd, bd, nw, nb, w2, b2), kind = _fused_args(
        cfg, variables, "layer_norm")
    got = fused_conv_module(x, mask, w1, b1, wd, bd, nw, nb, w2, b2,
                            pad_l=cfg.conv_context[0], norm=kind,
                            interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=1.2e-2)


def test_fused_conv_rejects_full_lane_tile():
    with pytest.raises(ValueError, match="spare channel"):
        fused_conv_module(jnp.zeros((1, 8, 128)), jnp.ones((1, 8), bool),
                          *[jnp.zeros(s) for s in
                            [(128, 256), (256,), (9, 128), (128,), (128,),
                             (128,), (128, 128), (128,)]], pad_l=4)


def test_conv_backend_pallas_matches_xla_through_module(monkeypatch):
    """ConformerConvolution(conv_backend='pallas') end-to-end equals 'xla'."""
    import tpu_asr.ops.pallas_conv as pc
    orig = pc.fused_conv_module
    monkeypatch.setattr(pc, "fused_conv_module",
                        lambda *a, **kw: orig(*a, **{**kw, "interpret": True}))
    import dataclasses
    cfg, mod, variables, x, mask = _setup("batch_norm", seed=3)
    want = mod.apply(variables, x, mask, False)
    cfg_p = dataclasses.replace(cfg, conv_backend="pallas")
    mod_p = ConformerConvolution(cfg_p, jnp.float32)
    got = mod_p.apply(variables, x, mask, False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-3)
