"""Pipeline-parallel conformer stack (parallel/pipeline.py) on the virtual
8-device CPU mesh: forward parity vs the plain nn.scan encoder, gradient
parity through the transposed (backward) pipeline, and dp x pp composition.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_asr.config import DecoderConfig, EncoderConfig, ModelConfig
from tpu_asr.models.ctc_model import CTCModel
from tpu_asr.parallel.pipeline import (ctc_forward_pipelined,
                                       encode_pipelined, make_pp_mesh)


def _model():
    enc = EncoderConfig(n_layers=4, d_model=32, n_heads=4, conv_kernel_size=7,
                        conv_norm_type="layer_norm", attention_backend="xla",
                        dropout=0.0, dropout_pre_encoder=0.0, dropout_att=0.0)
    cfg = ModelConfig(spec_augment=None, encoder=enc,
                      decoder=DecoderConfig(feat_in=32, num_classes=16),
                      compute_dtype="float32")
    return CTCModel(cfg)


def _batch(b=8, samples=12000):
    rng = np.random.default_rng(0)
    sig = jnp.asarray(rng.normal(size=(b, samples)).astype(np.float32) * 0.1)
    sl = jnp.asarray(rng.integers(samples // 2, samples + 1, size=(b,)),
                     jnp.int32)
    return sig, sl


@pytest.mark.parametrize("dp,pp,n_micro", [(2, 4, 4), (1, 2, 8), (4, 2, 2)])
def test_pipelined_forward_parity(dp, pp, n_micro):
    model = _model()
    sig, sl = _batch()
    v = model.init({"params": jax.random.PRNGKey(0)}, sig, sl, train=False)
    want = model.apply(v, sig, sl, train=False)
    mesh = make_pp_mesh(dp_size=dp, pp_size=pp)

    @jax.jit
    def pp_fwd(v, sig, sl):
        return ctc_forward_pipelined(model, v, sig, sl, mesh, n_micro)

    got_lp, got_len = pp_fwd(v, sig, sl)
    np.testing.assert_array_equal(np.asarray(got_len),
                                  np.asarray(want.encoded_len))
    np.testing.assert_allclose(np.asarray(got_lp),
                               np.asarray(want.log_probs),
                               rtol=1e-5, atol=1e-5)


def test_pipelined_gradient_parity():
    """The reverse pipeline (scan + ppermute transposed by jax) produces the
    same parameter gradients as the plain stacked encoder."""
    model = _model()
    sig, sl = _batch(b=4, samples=8000)
    v = model.init({"params": jax.random.PRNGKey(0)}, sig, sl, train=False)
    mesh = make_pp_mesh(dp_size=2, pp_size=2)
    rng = np.random.default_rng(1)

    ref_out = model.apply(v, sig, sl, train=False)
    cot = jnp.asarray(rng.normal(size=ref_out.log_probs.shape)
                      .astype(np.float32))

    def loss_pp(params):
        lp, _ = ctc_forward_pipelined(model, {"params": params}, sig, sl,
                                      mesh, n_micro=2)
        return jnp.sum(lp * cot)

    def loss_ref(params):
        out = model.apply({"params": params}, sig, sl, train=False)
        return jnp.sum(out.log_probs * cot)

    g_pp = jax.jit(jax.grad(loss_pp))(v["params"])
    g_ref = jax.jit(jax.grad(loss_ref))(v["params"])
    flat_pp = jax.tree_util.tree_flatten_with_path(g_pp)[0]
    flat_ref = dict(jax.tree_util.tree_flatten_with_path(g_ref)[0])
    assert flat_pp and len(flat_pp) == len(flat_ref)
    for path, leaf in flat_pp:
        ref_leaf = flat_ref[path]
        # absolute-noise floor: leaves with a mathematically-zero gradient
        # (e.g. linear_k bias — softmax scores are invariant to a constant
        # per-query shift) carry only ~1e-6 float noise on both sides
        scale = float(jnp.max(jnp.abs(ref_leaf)))
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(ref_leaf), rtol=0,
            atol=max(1e-4 * scale, 2e-6),
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")


def test_pipelined_encode_matches_encoder_output():
    model = _model()
    sig, sl = _batch(b=4, samples=9000)
    v = model.init({"params": jax.random.PRNGKey(0)}, sig, sl, train=False)
    mesh = make_pp_mesh(dp_size=1, pp_size=4)
    from tpu_asr.ops.features import FilterbankFeatures

    feats, flen = FilterbankFeatures(model.cfg.preprocessor)(
        sig, sl, train=False, rng=None)
    enc, out_len = jax.jit(
        lambda v, f, l: encode_pipelined(model, v, f, l, mesh, n_micro=4)
    )(v, feats, flen)
    want = model.apply(v, sig, sl, train=False)
    np.testing.assert_allclose(np.asarray(enc), np.asarray(want.encoded),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(out_len),
                                  np.asarray(want.encoded_len))


def test_pipeline_config_guards():
    model = _model()
    sig, sl = _batch(b=4, samples=8000)
    v = model.init({"params": jax.random.PRNGKey(0)}, sig, sl, train=False)
    mesh = make_pp_mesh(dp_size=1, pp_size=2)
    from tpu_asr.ops.features import FilterbankFeatures

    feats, flen = FilterbankFeatures(model.cfg.preprocessor)(
        sig, sl, train=False, rng=None)
    with pytest.raises(ValueError, match="n_layers"):
        # 4 layers on a 3-stage pipe
        encode_pipelined(model, v, feats, flen,
                         make_pp_mesh(dp_size=1, pp_size=3, devices=jax.devices()[:3]),
                         n_micro=2)
    with pytest.raises(ValueError, match="n_micro"):
        encode_pipelined(model, v, feats, flen, mesh, n_micro=3)
