"""Encoder option tests: longformer-style global tokens and mid-stack time
reduction (reference conformer_encoder.py:456-458 and :395-404/:712-724)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_asr.config import EncoderConfig
from tpu_asr.models.conformer import ConformerEncoder


def _cfg(**kw):
    base = dict(feat_in=16, n_layers=1, d_model=32, n_heads=2,
                conv_kernel_size=7, conv_norm_type="layer_norm",
                dropout=0.0, dropout_att=0.0, dropout_pre_encoder=0.0)
    base.update(kw)
    return EncoderConfig(**base)


def _fwd(cfg, feats, lens, seed=0):
    enc = ConformerEncoder(cfg)
    v = enc.init(jax.random.PRNGKey(seed), feats, lens)
    out, out_len, _ = enc.apply(v, feats, lens)
    return np.asarray(out), np.asarray(out_len), v


def test_global_tokens_escape_local_window(rng):
    """With a (2,2) local window + small conv kernel, a perturbation at frame 0
    cannot reach a distant query — unless global tokens carry it."""
    t_raw = 256
    feats = jnp.asarray(rng.standard_normal((1, 16, t_raw)).astype(np.float32))
    lens = jnp.array([t_raw])
    bump = feats.at[:, :, :4].add(5.0)

    local = _cfg(att_context_size=(2, 2))
    out_a, _, v = _fwd(local, feats, lens)
    enc = ConformerEncoder(local)
    out_b = np.asarray(enc.apply(v, bump, lens)[0])
    # far query (frame 50 of 64 encoded) is outside the local+conv reach
    assert np.allclose(out_a[0, 50], out_b[0, 50], atol=1e-5)

    glob = _cfg(att_context_size=(2, 2), global_tokens=1)
    enc_g = ConformerEncoder(glob)
    vg = enc_g.init(jax.random.PRNGKey(0), feats, lens)
    ga = np.asarray(enc_g.apply(vg, feats, lens)[0])
    gb = np.asarray(enc_g.apply(vg, bump, lens)[0])
    # the global token at position 0 broadcasts the perturbation everywhere
    assert not np.allclose(ga[0, 50], gb[0, 50], atol=1e-5)


def test_global_attn_separate_projections(rng):
    feats = jnp.asarray(rng.standard_normal((2, 16, 64)).astype(np.float32))
    lens = jnp.array([64, 48])
    cfg = _cfg(att_context_size=(4, 4), global_tokens=2,
               global_tokens_spacing=3, global_attn_separate=True)
    out, out_len, v = _fwd(cfg, feats, lens)
    params = v["params"]["layers"]["self_attn"]
    assert "linear_q_global" in params and "linear_v_global" in params
    assert out.shape[-1] == 32 and np.isfinite(out).all()


@pytest.mark.parametrize("reduction", ["pooling", "striding"])
@pytest.mark.parametrize("position", [-1, 0])
def test_mid_stack_reduction(rng, reduction, position):
    t_raw = 60
    feats = jnp.asarray(rng.standard_normal((2, 16, t_raw)).astype(np.float32))
    lens = jnp.array([60, 41])
    cfg = _cfg(n_layers=2, reduction=reduction, reduction_factor=2,
               reduction_position=position)
    out, out_len, v = _fwd(cfg, feats, lens)
    # base: 60 -> 15 encoded; reduced by 2 -> ceil(15/2) = 8
    base = _cfg(n_layers=2)
    ref_out, ref_len, _ = _fwd(base, feats, lens)
    np.testing.assert_array_equal(out_len, (ref_len + 1) // 2)
    assert out.shape[1] == (ref_out.shape[1] + 1) // 2
    assert np.isfinite(out).all()
    if position == 0:
        enc = ConformerEncoder(cfg)
        names = set(v["params"].keys())
        assert "layers" in names and "layers_post" in names


def test_explicit_pallas_backend_rejects_incompatible_attention(rng):
    """ADVICE r2 (medium): attention_backend='pallas' with chunked or
    global-token attention must raise instead of silently running the
    kernel's sliding-window semantics."""
    feats = jnp.asarray(rng.standard_normal((1, 16, 64)).astype(np.float32))
    lens = jnp.array([64])
    for kw in (dict(att_context_style="chunked_limited",
                    att_context_size=(8, 3)),
               dict(att_context_size=(2, 2), global_tokens=1)):
        cfg = _cfg(attention_backend="pallas", **kw)
        enc = ConformerEncoder(cfg)
        with pytest.raises(ValueError, match="pallas"):
            enc.init(jax.random.PRNGKey(0), feats, lens)
