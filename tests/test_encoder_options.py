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


def test_pre_encode_variants_shapes_and_lengths():
    """NeMo pre-encode dispatch (conformer_encoder.py:371-392): dw_striding,
    stacking/stacking_norm (ceil-length contract), and the factor-1 Linear."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from tpu_asr.config import EncoderConfig
    from tpu_asr.models.conformer import ConformerEncoder, subsampled_length

    rng = np.random.default_rng(0)
    b, f, t = 2, 80, 61
    feats = jnp.asarray(rng.normal(size=(b, f, t)).astype(np.float32))
    lengths = jnp.asarray([61, 37], jnp.int32)

    cases = {
        "dw_striding": (4, (t - 1) // 2 // 2 + 1),
        "stacking": (4, -(-t // 4)),
        "stacking_norm": (4, -(-t // 4)),
        "striding": (1, t),                      # factor 1 -> Linear
    }
    for sub, (factor, t_out_full) in cases.items():
        cfg = EncoderConfig(n_layers=2, d_model=32, n_heads=2,
                            subsampling=sub, subsampling_factor=factor,
                            attention_backend="xla")
        enc = ConformerEncoder(cfg)
        variables = enc.init(jax.random.key(0), feats, lengths)
        out, out_len, lf = enc.apply(variables, feats, lengths)
        want_len = subsampled_length(lengths, factor, sub)
        assert out.shape[0] == b and out.shape[2] == 32, (sub, out.shape)
        assert out.shape[1] >= int(want_len[0]), (sub, out.shape)
        np.testing.assert_array_equal(np.asarray(out_len),
                                      np.asarray(want_len))
        assert int(want_len[0]) == ((t - 1) // 2 // 2 + 1
                                    if sub == "dw_striding" else t_out_full
                                    if sub != "striding" else t)


def test_bypass_pre_encode_and_feat_out():
    """bypass_pre_encode consumes (B, T, d_model) embeddings unchanged in
    length; feat_out projects the FINAL output (NeMo
    test_conformer_encoder.py:129-155 contract)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import pytest as _pytest
    from tpu_asr.config import EncoderConfig
    from tpu_asr.models.conformer import ConformerEncoder

    rng = np.random.default_rng(1)
    b, t, d, fo = 2, 17, 16, 8
    emb = jnp.asarray(rng.normal(size=(b, t, d)).astype(np.float32))
    lengths = jnp.full((b,), t, jnp.int32)

    cfg = EncoderConfig(feat_in=10, n_layers=3, d_model=d, n_heads=2,
                        feat_out=fo, attention_backend="xla")
    enc = ConformerEncoder(cfg)
    variables = enc.init(jax.random.key(0), emb, lengths,
                         bypass_pre_encode=True)
    out, out_len, lf = enc.apply(variables, emb, lengths,
                                 bypass_pre_encode=True)
    assert out.shape == (b, t, fo)               # length preserved, projected
    np.testing.assert_array_equal(np.asarray(out_len), np.asarray(lengths))
    assert lf.shape[-1] == d                     # layer feats stay d_model

    with _pytest.raises(ValueError):
        bad = jnp.zeros((b, t, d + 1), jnp.float32)
        enc.apply(variables, bad, lengths, bypass_pre_encode=True)
