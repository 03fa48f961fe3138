"""Packed-segment inference (data/packing.py + CTCModel.forward_packed).

The load-bearing claim is EXACTNESS: a segment's log-probs inside a packed
row must equal the per-utterance forward (segment-block attention + guard
re-masking make packing a pure layout change, not an approximation). These
tests pin that claim on the XLA attention path in fp32; the Pallas kernel's
segment mask is pinned separately in tests/test_pallas_attention.py.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_asr.config import (DecoderConfig, EncoderConfig, ModelConfig,
                            PreprocessorConfig)
from tpu_asr.data.packing import (PackPlan, guard_frames, pack_frames,
                                  plan_packing, unpack_rows)
from tpu_asr.models.ctc_model import CTCModel


def test_guard_frames():
    assert guard_frames(31) == 16          # ceil(15 / 8) * 8
    assert guard_frames(7) == 8            # floor of 8
    assert guard_frames(65) == 32


def test_plan_packing_invariants():
    rng = np.random.default_rng(0)
    lengths = rng.integers(5, 120, size=37)
    guard, t_pack = 8, 128
    plan = plan_packing(lengths, t_pack=t_pack, guard=guard)

    # every utterance placed, within bounds, with its exact length span
    for i, ln in enumerate(lengths):
        r, s = plan.row[i], plan.start[i]
        assert 0 <= r < plan.n_rows and s + ln <= t_pack
        span = plan.seg_id[r, s:s + ln]
        assert (span == span[0]).all() and span[0] > 0
        np.testing.assert_array_equal(plan.src_utt[r, s:s + ln], i)
        np.testing.assert_array_equal(plan.src_pos[r, s:s + ln],
                                      np.arange(ln))
    # total valid frames match, i.e. no overlap anywhere
    assert int((plan.seg_id > 0).sum()) == int(lengths.sum())
    # guard gap between consecutive segments in each row
    for r in range(plan.n_rows):
        segs = plan.seg_id[r]
        prev_end = None
        for v in np.unique(segs[segs > 0]):
            idx = np.flatnonzero(segs == v)
            if prev_end is not None:
                assert idx[0] - prev_end >= guard
            prev_end = idx[-1] + 1
    # FFD stays close to the ideal row count (and beats 1-utt-per-row)
    ideal = -(-int(lengths.sum()) // t_pack)
    assert plan.n_rows <= int(1.4 * ideal) + 1
    assert plan.fill_ratio > 0.6


def test_plan_packing_row_multiple_and_errors():
    plan = plan_packing([10, 10, 10], t_pack=64, guard=4, row_multiple=4)
    assert plan.n_rows == 4
    with pytest.raises(ValueError):
        plan_packing([100], t_pack=64, guard=4)
    with pytest.raises(ValueError):
        plan_packing([0, 10], t_pack=64, guard=4)


def test_unpack_roundtrip():
    rng = np.random.default_rng(1)
    lengths = rng.integers(3, 40, size=11)
    plan = plan_packing(lengths, t_pack=64, guard=8)
    feats = rng.standard_normal((11, 40, 5)).astype(np.float32)
    packed = np.asarray(pack_frames(jnp.asarray(feats), plan))
    # guard/pad positions zeroed
    assert (packed[plan.seg_id == 0] == 0).all()
    back = unpack_rows(packed, plan)
    for i, ln in enumerate(lengths):
        np.testing.assert_array_equal(back[i], feats[i, :ln])


@pytest.fixture(scope="module")
def packed_model():
    cfg = ModelConfig(
        preprocessor=PreprocessorConfig(features=24),
        spec_augment=None,
        encoder=EncoderConfig(feat_in=24, n_layers=2, d_model=32, n_heads=4,
                              conv_kernel_size=7, conv_norm_type="layer_norm",
                              dropout=0.0, dropout_pre_encoder=0.0,
                              dropout_att=0.0),
        decoder=DecoderConfig(feat_in=32, num_classes=16),
        compute_dtype="float32",
    )
    model = CTCModel(cfg)
    sig = jnp.zeros((1, 8000), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), sig,
                           jnp.asarray([8000], jnp.int32))
    return model, variables, cfg


def _mel(cfg, sig, sig_len):
    from tpu_asr.ops.features import FilterbankFeatures
    return FilterbankFeatures(cfg.preprocessor)(sig, sig_len, train=False,
                                                rng=None)


def test_packed_forward_matches_per_utterance(packed_model):
    """End-to-end: per-utterance log-probs == packed log-probs at the
    corresponding positions (fp32, XLA attention path)."""
    model, variables, cfg = packed_model
    rng = np.random.default_rng(2)
    n = 7
    samp = [int(s) for s in rng.integers(4000, 16000, size=n)]
    t_sig = max(samp)
    sig = np.zeros((n, t_sig), np.float32)
    for i, s in enumerate(samp):
        sig[i, :s] = rng.normal(size=s).astype(np.float32) * 0.1
    sig = jnp.asarray(sig)
    sig_len = jnp.asarray(samp, jnp.int32)

    # reference: ordinary batched forward
    out = model.apply(variables, sig, sig_len, train=False)
    ref_logp, ref_len = np.asarray(out.log_probs), np.asarray(out.encoded_len)

    # packed: featurize -> pre_encode -> pack -> forward_packed
    feats, feat_len = _mel(cfg, sig, sig_len)
    pre, pre_len = model.apply(variables, feats, feat_len,
                               method=CTCModel.pre_encode)
    lengths = np.asarray(pre_len)
    np.testing.assert_array_equal(lengths, ref_len)

    guard = guard_frames(cfg.encoder.conv_kernel_size)
    plan = plan_packing(lengths, t_pack=64, guard=guard)
    packed = pack_frames(pre, plan)
    logp, greedy = model.apply(variables, packed, jnp.asarray(plan.seg_id),
                               method=CTCModel.forward_packed)
    per_utt = unpack_rows(np.asarray(logp), plan)
    for i in range(n):
        np.testing.assert_allclose(per_utt[i], ref_logp[i, :lengths[i]],
                                   rtol=2e-5, atol=2e-5)
    # greedy ids identical (the serving contract)
    g = unpack_rows(np.asarray(greedy), plan)
    for i in range(n):
        np.testing.assert_array_equal(
            g[i], np.argmax(ref_logp[i, :lengths[i]], axis=-1))


def test_packed_training_supported_reduction_rejected(packed_model):
    """Round-5: seg_id + train is SUPPORTED (packed-segment training,
    VERDICT r4 next #3); mid-stack reduction stays rejected (pooling would
    merge frames across segments)."""
    import dataclasses

    from tpu_asr.models.ctc_model import CTCModel

    model, variables, _ = packed_model
    x = jnp.zeros((2, 16, 32), jnp.float32)
    seg = jnp.ones((2, 16), jnp.int32)
    enc = model.bind(variables,
                     rngs={"dropout": jax.random.PRNGKey(0),
                           "layerdrop": jax.random.PRNGKey(1)}).encoder
    y = enc(x, jnp.asarray([16, 16], jnp.int32), train=True,
            bypass_pre_encode=True, seg_id=seg)
    assert np.all(np.isfinite(np.asarray(y[0])))

    red_cfg = dataclasses.replace(
        model.cfg, encoder=dataclasses.replace(
            model.cfg.encoder, reduction="pooling", reduction_factor=2))
    red = CTCModel(red_cfg)
    vs = red.init({"params": jax.random.PRNGKey(0)},
                  jnp.zeros((1, 8000), jnp.float32),
                  jnp.asarray([8000], jnp.int32), train=False)
    with pytest.raises(ValueError):
        red.bind(vs).encoder(x, jnp.asarray([16, 16], jnp.int32),
                             train=False, bypass_pre_encode=True, seg_id=seg)


def test_packed_transcriber_matches_plain(packed_model):
    """PackedTranscriber text output == Transcriber text output on a mixed
    duration batch (the serving contract)."""
    from tpu_asr.data.tokenizer import train_bpe
    from tpu_asr.models.transcribe import PackedTranscriber, Transcriber

    model, variables, _ = packed_model
    tok = train_bpe(["a b c d e f g h"], vocab_size=16)
    rng = np.random.default_rng(3)
    waves = [rng.normal(size=int(s)).astype(np.float32) * 0.05
             for s in rng.integers(4000, 16000, size=6)]
    plain = Transcriber(model, variables, tok, batch_size=3)
    packed = PackedTranscriber(model, variables, tok, t_pack=64,
                               pre_batch=3, row_multiple=2)
    assert packed.transcribe(waves) == plain.transcribe(waves)


@pytest.mark.parametrize("seed", range(8))
def test_plan_packing_invariants_random_sweep(seed):
    """Property sweep over random length mixes, guards, t_pack, and
    row_multiple: placement exactness, no overlap, guard gaps — the same
    invariants as above across a wider parameter space (pure numpy, fast)."""
    rng = np.random.default_rng(100 + seed)
    t_pack = int(rng.choice([64, 128, 256, 512]))
    guard = int(rng.integers(0, 12))
    rm = int(rng.choice([1, 2, 4, 8]))
    n = int(rng.integers(1, 60))
    lengths = rng.integers(1, t_pack + 1, size=n)
    plan = plan_packing(lengths, t_pack=t_pack, guard=guard, row_multiple=rm)
    assert plan.n_rows % rm == 0
    for i, ln in enumerate(lengths):
        r, s = plan.row[i], plan.start[i]
        assert 0 <= r < plan.n_rows and s + ln <= t_pack
        np.testing.assert_array_equal(plan.src_utt[r, s:s + ln], i)
        np.testing.assert_array_equal(plan.src_pos[r, s:s + ln],
                                      np.arange(ln))
    assert int((plan.seg_id > 0).sum()) == int(lengths.sum())
    for r in range(plan.n_rows):
        segs = plan.seg_id[r]
        prev_end = None
        for v in np.unique(segs[segs > 0]):
            idx = np.flatnonzero(segs == v)
            assert (np.diff(idx) == 1).all()       # contiguous segment
            if prev_end is not None:
                assert idx[0] - prev_end >= guard
            prev_end = idx[-1] + 1
