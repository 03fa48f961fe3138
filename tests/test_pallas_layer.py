"""Parity for the whole-layer fused kernel (ops/pallas_layer.py) vs the XLA
ConformerLayer in eval, both conv-norm modes (folded BN / LN), with unequal
lengths so the pad-mask path is exercised. The kernel measured AT PARITY
with the default path on v5e (see its docstring) and is not wired into the
model — this test keeps the artifact honest."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_asr.config import EncoderConfig
from tpu_asr.models.conformer import ConformerLayer, rel_positional_encoding
from tpu_asr.ops.pallas_layer import fused_conformer_layer


def _extract(p, cfg, variables):
    d, h = cfg.d_model, cfg.n_heads
    att, conv = p["self_attn"], p["conv"]
    out = dict(
        s1=p["norm_feed_forward1"]["scale"], sb1=p["norm_feed_forward1"]["bias"],
        w11=p["feed_forward1"]["linear1"]["kernel"],
        bb11=p["feed_forward1"]["linear1"]["bias"],
        w12=p["feed_forward1"]["linear2"]["kernel"],
        bb12=p["feed_forward1"]["linear2"]["bias"],
        sa=p["norm_self_att"]["scale"], sab=p["norm_self_att"]["bias"],
        wq_full=att["linear_q"]["kernel"], bq=att["linear_q"]["bias"],
        wk_full=att["linear_k"]["kernel"], bk=att["linear_k"]["bias"],
        wv_full=att["linear_v"]["kernel"], bv=att["linear_v"]["bias"],
        wo_full=att["linear_out"]["kernel"], bo=att["linear_out"]["bias"],
        bias_u=att["pos_bias_u"], bias_v=att["pos_bias_v"],
        pos_kernel=att["linear_pos"]["kernel"].reshape(d, h, d // h),
        sc=p["norm_conv"]["scale"], scb=p["norm_conv"]["bias"],
        w1=conv["pointwise_conv1"]["kernel"], b1=conv["pointwise_conv1"]["bias"],
        wd=conv["depthwise_conv"]["kernel"], bd=conv["depthwise_conv"]["bias"],
        w2c=conv["pointwise_conv2"]["kernel"], b2c=conv["pointwise_conv2"]["bias"],
        s2=p["norm_feed_forward2"]["scale"], sb2=p["norm_feed_forward2"]["bias"],
        w21=p["feed_forward2"]["linear1"]["kernel"],
        bb21=p["feed_forward2"]["linear1"]["bias"],
        w22=p["feed_forward2"]["linear2"]["kernel"],
        bb22=p["feed_forward2"]["linear2"]["bias"],
        sf=p["norm_out"]["scale"], sfb=p["norm_out"]["bias"],
    )
    if cfg.conv_norm_type == "layer_norm":
        out["nw"], out["nb"] = conv["norm"]["scale"], conv["norm"]["bias"]
        return out, "layer_norm"
    bs = variables["batch_stats"]["conv"]["batch_norm"]
    inv = 1.0 / np.sqrt(np.asarray(bs["var"]) + 1e-5)
    sc_ = np.asarray(conv["batch_norm"]["scale"])
    out["nw"] = jnp.asarray(sc_ * inv)
    out["nb"] = jnp.asarray(np.asarray(conv["batch_norm"]["bias"])
                            - np.asarray(bs["mean"]) * sc_ * inv)
    return out, "affine"


@pytest.mark.parametrize("conv_norm_type", ["layer_norm", "batch_norm"])
def test_fused_layer_matches_xla(conv_norm_type):
    cfg = EncoderConfig(d_model=32, n_heads=4, n_layers=1,
                        conv_kernel_size=9, conv_norm_type=conv_norm_type,
                        attention_backend="xla", dropout=0.0, dropout_att=0.0)
    rng = np.random.default_rng(0)
    b, t = 2, 50
    x = jnp.asarray(rng.normal(size=(b, t, 32)).astype(np.float32) * 0.5)
    mask = jnp.arange(t)[None, :] < jnp.asarray([50, 33])[:, None]
    x = jnp.where(mask[..., None], x, 0.0)
    pos = rel_positional_encoding(t, 32)
    layer = ConformerLayer(cfg, dtype=jnp.float32)
    variables = layer.init(jax.random.key(0), x, pos, mask, train=False)
    if "batch_stats" in variables:
        bs = jax.tree_util.tree_map(
            lambda a: a + 0.3 * jnp.abs(jnp.asarray(
                rng.normal(size=a.shape).astype(np.float32))),
            variables["batch_stats"])
        variables = {"params": variables["params"], "batch_stats": bs}
    want = layer.apply(variables, x, pos, mask, train=False)
    prm, norm = _extract(variables["params"], cfg, variables)
    got = fused_conformer_layer(
        x, mask, prm, n_heads=4, conv_kernel_size=9,
        conv_pad_l=cfg.conv_context[0], conv_norm=norm, interpret=True)
    w = np.asarray(want, np.float32)
    np.testing.assert_allclose(np.asarray(got, np.float32), w,
                               rtol=0.05, atol=0.03 * np.abs(w).max())
