"""Cache-aware streaming tests: streaming output == offline output on audio
crossing multiple chunks (the reference capability at NeMo
conformer_encoder.py:523-546, validated here the way NeMo's
test_streaming_utils does — stepwise vs full-context equality)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_asr.config import (DecoderConfig, EncoderConfig, ModelConfig,
                            PreprocessorConfig)
from tpu_asr.models.conformer import ConformerEncoder, rel_shift, subsampled_length
from tpu_asr.models.ctc_model import CTCModel
from tpu_asr.models.streaming import (CacheAwareStreamer,
                                      get_initial_cache_state,
                                      setup_streaming_params)

STREAM_CFG = EncoderConfig(
    feat_in=16, n_layers=3, d_model=32, n_heads=2,
    conv_kernel_size=9,
    dropout=0.0, dropout_att=0.0, dropout_pre_encoder=0.0,
    causal_downsampling=True,
    conv_context_size="causal",
    att_context_style="chunked_limited",
    att_context_size=(8, 3),          # left 8 = 2 chunks, chunk = 4 encoded
)


def test_rel_shift_rectangular(rng):
    """rel_shift generalizes to Tkv > Tq (cached keys prepended)."""
    b, h, tq, c = 2, 3, 5, 4
    t_kv = tq + c
    p = tq + t_kv - 1
    x = jnp.asarray(rng.standard_normal((b, h, tq, p)).astype(np.float32))
    got = np.asarray(rel_shift(x, t_kv=t_kv))
    assert got.shape == (b, h, tq, t_kv)
    x_np = np.asarray(x)
    for t in range(tq):
        for s in range(t_kv):
            j = tq - 1 - t + s
            np.testing.assert_allclose(got[:, :, t, s], x_np[:, :, t, j], rtol=1e-6)


def test_causal_subsampling_length_contract(rng):
    """Causal (left-pad) subsampling keeps the standard length formula and is
    translation covariant (frame j depends only on inputs <= 4j)."""
    enc = ConformerEncoder(STREAM_CFG)
    feats = jnp.asarray(rng.standard_normal((1, 16, 40)).astype(np.float32))
    lens = jnp.array([40])
    v = enc.init(jax.random.PRNGKey(0), feats, lens)
    out, out_len, _ = enc.apply(v, feats, lens)
    assert int(out_len[0]) == int(subsampled_length(jnp.array([40]), 4)[0])
    # causality: mutating the tail must not change early encoded frames
    feats2 = feats.at[:, :, 30:].add(3.0)
    out2, _, _ = enc.apply(v, feats2, lens)
    np.testing.assert_allclose(np.asarray(out[:, :5]), np.asarray(out2[:, :5]),
                               atol=1e-5)


@pytest.mark.parametrize("t_raw", [48, 53, 61])   # multiple / partial chunks
def test_streaming_encoder_matches_offline(rng, t_raw):
    enc = ConformerEncoder(STREAM_CFG)
    feats = jnp.asarray(rng.standard_normal((1, 16, t_raw)).astype(np.float32))
    lens = jnp.array([t_raw])
    v = enc.init(jax.random.PRNGKey(0), feats, lens)

    offline, off_len, _ = enc.apply(v, feats, lens)
    n_off = int(off_len[0])

    sc = setup_streaming_params(STREAM_CFG)
    assert sc.chunk_size == 16 and sc.valid_out_len == 4
    cache = get_initial_cache_state(STREAM_CFG, 1)
    feat_tail = np.zeros((1, 16, sc.pre_encode_cache_size), np.float32)
    feats_np = np.asarray(feats)

    chunks = []
    pos = 0
    while pos < t_raw:
        take = min(sc.chunk_size, t_raw - pos)
        chunk = np.zeros((1, 16, sc.chunk_size), np.float32)
        chunk[:, :, :take] = feats_np[:, :, pos:pos + take]
        step_in = jnp.asarray(np.concatenate([feat_tail, chunk], axis=2))
        step_len = jnp.array([take + sc.pre_encode_cache_size], jnp.int32)
        out, out_len, _feats, cache = enc.apply(
            v, step_in, step_len, train=False, cache=cache,
            drop_extra_pre_encoded=sc.drop_extra_pre_encoded)
        k = int(out_len[0])
        chunks.append(np.asarray(out[0, :k]))
        feat_tail = np.asarray(step_in[:, :, -sc.pre_encode_cache_size:])
        pos += take

    streamed = np.concatenate(chunks, axis=0)
    assert streamed.shape[0] == n_off
    np.testing.assert_allclose(streamed, np.asarray(offline[0, :n_off]),
                               atol=2e-4, rtol=1e-3)


def test_streamer_end_to_end_matches_offline_greedy(rng):
    """Full-model streaming (featurizer tail + caches + greedy stitch) emits the
    same argmax frame ids as the offline forward."""
    pre = PreprocessorConfig(features=16)
    cfg = ModelConfig(
        preprocessor=pre, spec_augment=None,
        encoder=STREAM_CFG,
        decoder=DecoderConfig(feat_in=32, num_classes=8),
        compute_dtype="float32",
    )
    model = CTCModel(cfg)
    sig = jnp.asarray(rng.standard_normal((1, 16000)).astype(np.float32) * 0.1)
    ln = jnp.array([16000], jnp.int32)
    v = model.init(jax.random.PRNGKey(0), sig, ln)
    out = model.apply(v, sig, ln, train=False)
    n = int(out.encoded_len[0])
    offline_ids = np.asarray(out.greedy[0, :n]).tolist()

    streamer = CacheAwareStreamer(model, v)
    ids = streamer.stream(np.asarray(sig[0]), return_ids=True)
    assert ids == offline_ids


def test_batched_unequal_length_streams_match_offline(rng):
    """Per-sample valid-count cache rolls (VERDICT r3 item 9): one batch
    carries two streams of different lengths — stream B ends early (partial
    final chunk) and then rides along with chunk_len 0 while stream A keeps
    streaming real audio. Each stream must match its own offline encoder
    output exactly; before the per-sample rolls, B's partial chunk pushed
    pad frames into the shared-static roll and broke the right-aligned
    validity of EVERY stream's cache."""
    enc = ConformerEncoder(STREAM_CFG)
    t_a, t_b = 61, 37
    feats = np.zeros((2, 16, t_a), np.float32)
    feats[0, :, :t_a] = rng.standard_normal((16, t_a))
    feats[1, :, :t_b] = rng.standard_normal((16, t_b))
    lens = jnp.array([t_a, t_b])
    v = enc.init(jax.random.PRNGKey(0), jnp.asarray(feats), lens)

    offline, off_len, _ = enc.apply(v, jnp.asarray(feats), lens)

    sc = setup_streaming_params(STREAM_CFG)
    cache = get_initial_cache_state(STREAM_CFG, 2)
    feat_tail = np.zeros((2, 16, sc.pre_encode_cache_size), np.float32)
    # stream A: full chunks + final partial; stream B: ends early with a
    # partial final chunk, then exhausted (chunk_len 0) for the rest
    takes_a = [16, 16, 16, 13]
    takes_b = [16, 16, 5, 0]
    pos = [0, 0]
    got = [[], []]
    for ta, tb in zip(takes_a, takes_b):
        takes = [ta, tb]
        chunk = np.zeros((2, 16, sc.chunk_size), np.float32)
        for i, tk in enumerate(takes):
            chunk[i, :, :tk] = feats[i, :, pos[i]:pos[i] + tk]
        step_in = jnp.asarray(np.concatenate([feat_tail, chunk], axis=2))
        step_len = jnp.asarray([tk + sc.pre_encode_cache_size
                                for tk in takes], jnp.int32)
        out, out_len, _f, cache = enc.apply(
            v, step_in, step_len, train=False, cache=cache,
            drop_extra_pre_encoded=sc.drop_extra_pre_encoded)
        for i, tk in enumerate(takes):
            k = int(out_len[i])
            got[i].append(np.asarray(out[i, :k]))
            # per-sample feature tail (what CacheAwareStreamer.step does)
            j = tk + np.arange(sc.pre_encode_cache_size)
            feat_tail[i] = np.asarray(step_in[i][:, j])
            pos[i] += tk
    assert pos == [t_a, t_b]

    for i, n in enumerate([int(off_len[0]), int(off_len[1])]):
        streamed = np.concatenate(got[i], axis=0)
        assert streamed.shape[0] == n
        np.testing.assert_allclose(streamed, np.asarray(offline[i, :n]),
                                   atol=2e-4, rtol=1e-3)
