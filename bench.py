"""Headline benchmark: Conformer-CTC small greedy-inference RTFx.

Measures end-to-end inference throughput (featurizer -> encoder -> decoder ->
on-device greedy CTC decode) for the reference teacher architecture
(stt_en_conformer_ctc_small: d_model 176, 16 layers — conformer_ctc_bpe.yaml:7-18)
on whatever accelerator JAX sees, and prints ONE JSON line (the driver
contract).

`python bench.py --full` additionally prints one JSON line per extra
scenario BEFORE the headline (VERDICT r2 next #7 benchmark realism):
- batch-scaling sweep (B=32/64/128, uniform 15 s),
- a bucketed LibriSpeech-test-other-like duration distribution (RTFx counts
  REAL audio seconds only, not bucket padding),
- batched beam-search decode RTFx (model + ops/beam_search.py, W=16).

RTFx = seconds of audio processed per wall-clock second (higher is better).
`vs_baseline` divides by an A100 reference estimate for this model
(A100_RTFX_ESTIMATE below): the reference repo publishes no numbers
(BASELINE.md), so the denominator is a documented assumption held constant
across rounds; the north-star gate is >=10x A100 RTFx (BASELINE.json).
"""

from __future__ import annotations

import json
import time

import numpy as np

# NGC-class throughput estimate for stt_en_conformer_ctc_small greedy inference
# on one A100 (batch 32, ~15 s utterances). Documented assumption, fixed across
# rounds — the reference publishes no RTFx (BASELINE.md).
A100_RTFX_ESTIMATE = 2000.0

BATCH = 32
SECONDS = 15
SR = 16000
ITERS = 10


def _realistic_durations(n: int, rng: "np.random.Generator") -> "np.ndarray":
    """LibriSpeech-test-other-like utterance lengths: lognormal around ~6-7 s,
    clipped to the reference pipeline's [1.0, 16.7] s duration filter
    (SURVEY.md N11; conformer_ctc_bpe.yaml:59)."""
    d = rng.lognormal(mean=np.log(6.2), sigma=0.55, size=n)
    return np.clip(d, 1.0, 16.7)


def _bench_full(model, variables, infer, headline_rtfx) -> None:
    import jax
    import jax.numpy as jnp

    from tpu_asr.ops.beam_search import ctc_beam_search_batched
    from tpu_asr.utils.flops import compiled_flops, mfu

    rng = np.random.default_rng(1)

    # ---- batch-scaling sweep ----
    for b in (32, 64, 128):
        sig = jnp.asarray(
            rng.normal(size=(b, SECONDS * SR)).astype(np.float32) * 0.1)
        sl = jnp.full((b,), SECONDS * SR, jnp.int32)
        jax.block_until_ready(infer(sig, sl))
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = infer(sig, sl)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / ITERS
        fl = compiled_flops(infer, sig, sl)
        util = mfu(fl, dt)
        rtfx = b * SECONDS / dt
        print(json.dumps({
            "metric": f"greedy RTFx @ batch {b} (uniform 15 s)",
            "value": round(rtfx, 2), "unit": "x realtime",
            "vs_baseline": round(rtfx / A100_RTFX_ESTIMATE, 3),
            "mfu": round(util, 4) if util is not None else None}))

    # ---- bucketed realistic duration distribution ----
    n_utts = 256
    durs = _realistic_durations(n_utts, rng)
    order = np.argsort(durs)
    n_buckets = 4
    bucket_ids = np.array_split(order, n_buckets)
    total_audio = float(durs.sum())
    batches = []
    for ids in bucket_ids:
        cap = float(durs[ids].max())
        cap_samples = int(round(cap * SR))
        # per-bucket batch size, ~constant audio-seconds per batch (the
        # dataloader's bucketing_batch_size=int auto-scaling): short-utterance
        # buckets run bigger batches instead of idling the chip
        bsz = max(8, int(round(BATCH * SECONDS / cap / 8)) * 8)
        for i in range(0, len(ids), bsz):
            chunk = ids[i:i + bsz]
            # static-shape batch: pad rows to the bucket cap, cyclic-repeat
            # to the full batch size (the dataloader's padding contract)
            rows = np.resize(chunk, bsz)
            sig = (rng.normal(size=(bsz, cap_samples))
                   .astype(np.float32) * 0.1)
            sl = np.minimum((durs[rows] * SR).astype(np.int64),
                            cap_samples).astype(np.int32)
            batches.append((jnp.asarray(sig), jnp.asarray(sl)))
    for sig, sl in batches:                   # compile per bucket shape
        jax.block_until_ready(infer(sig, sl))
    t0 = time.perf_counter()
    for sig, sl in batches:
        out = infer(sig, sl)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    rtfx = total_audio / dt
    print(json.dumps({
        "metric": "greedy RTFx, bucketed realistic durations "
                  f"({n_utts} utts, lognormal~6s, {n_buckets} buckets, "
                  "audio-seconds-matched per-bucket batch)",
        "value": round(rtfx, 2), "unit": "x realtime",
        "vs_baseline": round(rtfx / A100_RTFX_ESTIMATE, 3)}))

    # ---- packed-segment serving on the SAME realistic utterances ----
    # (data/packing.py + CTCModel.forward_packed: several utterances per
    # encoder row with segment-block attention — exact per-utterance
    # semantics, none of the bucket-padding waste)
    from tpu_asr.data.packing import guard_frames, plan_packing
    from tpu_asr.models.ctc_model import CTCModel as _CTC
    from tpu_asr.ops.features import FilterbankFeatures

    feat = FilterbankFeatures(model.cfg.preprocessor)
    t_pack = 512

    # bucketed pre-encode batches WITHOUT cyclic duplicates (packing needs
    # each utterance once); same bucket caps as the bucketed bench above
    pk_batches, id_chunks = [], []
    for ids in bucket_ids:
        cap_samples = int(round(float(durs[ids].max()) * SR))
        bsz = max(8, int(round(BATCH * SECONDS / (cap_samples / SR) / 8)) * 8)
        for i in range(0, len(ids), bsz):
            chunk = ids[i:i + bsz]
            sig = (rng.normal(size=(len(chunk), cap_samples))
                   .astype(np.float32) * 0.1)
            sl = np.minimum((durs[chunk] * SR).astype(np.int64),
                            cap_samples).astype(np.int32)
            pk_batches.append((jnp.asarray(sig), jnp.asarray(sl)))
            id_chunks.append(chunk)

    t_src_cap = 1 + (int(16.7 * SR) // model.cfg.preprocessor.hop_length + 1)
    from tpu_asr.models.conformer import subsampled_length as _sublen
    t_src = int(_sublen(jnp.asarray(t_src_cap),
                        model.cfg.encoder.subsampling_factor))

    @jax.jit
    def pre_fn(sig, sl):
        f, fl = feat(sig, sl, train=False, rng=None)
        x, ln = model.apply(variables, f, fl, method=_CTC.pre_encode)
        pad = t_src - x.shape[1]
        return (jnp.pad(x, ((0, 0), (0, pad), (0, 0))) if pad > 0
                else x[:, :t_src]), ln

    packed_fn = jax.jit(lambda p, s: model.apply(
        variables, p, s, method=_CTC.forward_packed))
    gather_fn = jax.jit(lambda big, rows, pos, valid: jnp.where(
        valid[..., None], big[rows, pos], 0))

    # warmup pass also yields the true encoded lengths for the pack plan
    lengths = np.zeros(n_utts, np.int64)
    row_of = np.zeros(n_utts, np.int32)
    off = 0
    for (sig, sl), chunk in zip(pk_batches, id_chunks):
        _, ln = pre_fn(sig, sl)
        lengths[chunk] = np.asarray(ln)
        row_of[chunk] = off + np.arange(len(chunk))
        off += len(chunk)
    plan = plan_packing(lengths, t_pack=t_pack,
                        guard=guard_frames(model.cfg.encoder.conv_kernel_size),
                        row_multiple=4)
    src_rows = jnp.asarray(row_of[plan.src_utt])
    src_pos = jnp.asarray(plan.src_pos)
    valid = jnp.asarray(plan.seg_id > 0)
    seg_dev = jnp.asarray(plan.seg_id)

    def run_packed():
        outs = [pre_fn(sig, sl)[0] for sig, sl in pk_batches]
        big = jnp.concatenate(outs, axis=0)
        packed = gather_fn(big, src_rows, src_pos, valid)
        _, greedy = packed_fn(packed, seg_dev)
        return greedy

    int(jnp.sum(run_packed()))                 # compile + fence
    t0 = time.perf_counter()
    greedy = run_packed()
    int(jnp.sum(greedy))                       # host-transfer fence
    dt = time.perf_counter() - t0
    rtfx_packed = total_audio / dt
    print(json.dumps({
        "metric": "greedy RTFx, PACKED realistic durations (same "
                  f"{n_utts} utts; {plan.n_rows} rows x {t_pack} frames, "
                  f"fill {plan.fill_ratio:.2f}; exact per-utterance "
                  "semantics)",
        "value": round(rtfx_packed, 2), "unit": "x realtime",
        "vs_baseline": round(rtfx_packed / A100_RTFX_ESTIMATE, 3),
        "vs_bucketed": round(rtfx_packed / rtfx, 2)}))

    # ---- conformer-LARGE (121 M): framework MFU at production scale ----
    # The small model's ~9% MFU is intrinsic to d_model 176 / dk 44 on a
    # 128-lane MXU (ROADMAP roofline notes), not a framework property —
    # the Large row of the reference's size table (conformer_ctc_bpe.yaml:
    # 7-18: d 512, 18 layers, 8 heads, d_ff 2048) shows the same code at
    # production dims.
    from tpu_asr.config import (DecoderConfig as _Dec, EncoderConfig as _Enc,
                                ModelConfig as _MC)
    from tpu_asr.ops.ctc import ctc_greedy_decode as _greedy

    large_cfg = _MC(
        spec_augment=None,
        encoder=_Enc(n_layers=18, d_model=512, n_heads=8),
        decoder=_Dec(feat_in=512, num_classes=128))
    large = _CTC(large_cfg)
    b_l = 32
    sig = jnp.asarray(
        rng.normal(size=(b_l, SECONDS * SR)).astype(np.float32) * 0.1)
    sl = jnp.full((b_l,), SECONDS * SR, jnp.int32)
    # params as a jit ARGUMENT: closing over the 121M-param tree embeds it
    # as constants in the program shipped to the remote compiler (HTTP 413
    # through the axon tunnel)
    vars_l = large.init({"params": jax.random.PRNGKey(0)}, sig, sl,
                        train=False)

    @jax.jit
    def infer_large(vs, signal, signal_len):
        out = large.apply(vs, signal, signal_len, train=False)
        return _greedy(out.log_probs, out.encoded_len)

    # sustained scan over distinct batches (the headline's measurement
    # pattern): per-call wall time through the tunnel is host-dispatch
    # noise at this program size (measured 290-560 ms/call vs 36 ms/step
    # device time in traces)
    sigs_l = jnp.asarray(
        rng.normal(size=(ITERS, b_l, SECONDS * SR)).astype(np.float32) * 0.1)

    @jax.jit
    def infer_large_scan(vs, sigs, signal_len):
        def body(c, s):
            toks, n = infer_large(vs, s, signal_len)
            return c, (jnp.sum(toks), jnp.sum(n))
        return jax.lax.scan(body, 0, sigs)[1]

    np.asarray(infer_large_scan(vars_l, sigs_l, sl)[0])   # compile + fence
    t0 = time.perf_counter()
    r_l = infer_large_scan(vars_l, sigs_l, sl)
    np.asarray(r_l[0])                        # host-transfer fence
    dt = (time.perf_counter() - t0) / ITERS
    fl = compiled_flops(infer_large, vars_l, sig, sl)
    util = mfu(fl, dt)
    rtfx_l = b_l * SECONDS / dt
    print(json.dumps({
        "metric": "conformer-LARGE (121M, d512x18L) greedy RTFx @ batch 32, "
                  "sustained",
        "value": round(rtfx_l, 2), "unit": "x realtime",
        "vs_baseline": None,
        "mfu": round(util, 4) if util is not None else None,
        "tflops_per_step": round(fl / 1e12, 3) if fl else None}))

    # same checkpoint, int8 serving PTQ (EncoderConfig.quantization='int8':
    # fused int8 FFN kernel — ops/quant.py). Measured for production dims
    # only; at d176 the int8 path loses to bf16 (lane-padding tax), so the
    # small-model lines above stay bf16.
    import dataclasses as _dc
    large_q = _CTC(_dc.replace(
        large_cfg, encoder=_dc.replace(large_cfg.encoder,
                                       quantization="int8")))

    @jax.jit
    def infer_large_q_scan(vs, sigs, signal_len):
        def body(c, s):
            out = large_q.apply(vs, s, signal_len, train=False)
            toks, n = _greedy(out.log_probs, out.encoded_len)
            return c, (jnp.sum(toks), jnp.sum(n))
        return jax.lax.scan(body, 0, sigs)[1]

    np.asarray(infer_large_q_scan(vars_l, sigs_l, sl)[0])
    t0 = time.perf_counter()
    r_q = infer_large_q_scan(vars_l, sigs_l, sl)
    np.asarray(r_q[0])
    dt_q = (time.perf_counter() - t0) / ITERS
    rtfx_q = b_l * SECONDS / dt_q
    print(json.dumps({
        "metric": "conformer-LARGE int8 serving PTQ (same checkpoint; "
                  "fused int8 FFN kernel, per-token act scales) greedy "
                  "RTFx @ batch 32, sustained",
        "value": round(rtfx_q, 2), "unit": "x realtime",
        "vs_baseline": None,
        "vs_bf16": round(rtfx_q / rtfx_l, 3)}))

    # ---- conformer-XLarge (635 M): the size table's largest row ----
    # conformer_ctc_bpe.yaml:7-18: d 1024, 24 layers, 8 heads (dk 128 —
    # the first config where head_dim exactly fills the MXU lane tile, so
    # no lane-padding tax at all). d_model % 128 == 0 routes the conv
    # module and subsampling to their XLA paths (the fused kernels' spare-
    # lane / VMEM gates); attention stays on the block Pallas kernel.
    # conv_kernel_size=5: the XLarge row's own kernel size (the table's
    # other rows use 31) — without it the benched model has extra
    # depthwise-conv work vs the reference recipe (ADVICE r3)
    xl_cfg = _MC(
        spec_augment=None,
        encoder=_Enc(n_layers=24, d_model=1024, n_heads=8,
                     conv_kernel_size=5),
        decoder=_Dec(feat_in=1024, num_classes=128))
    xlarge = _CTC(xl_cfg)
    vars_xl = xlarge.init({"params": jax.random.PRNGKey(0)}, sig, sl,
                          train=False)

    @jax.jit
    def infer_xl_scan(vs, sigs, signal_len):
        def body(c, s):
            out = xlarge.apply(vs, s, signal_len, train=False)
            toks, n = _greedy(out.log_probs, out.encoded_len)
            return c, (jnp.sum(toks), jnp.sum(n))
        return jax.lax.scan(body, 0, sigs)[1]

    @jax.jit
    def infer_xl(vs, signal, signal_len):
        out = xlarge.apply(vs, signal, signal_len, train=False)
        return _greedy(out.log_probs, out.encoded_len)

    np.asarray(infer_xl_scan(vars_xl, sigs_l, sl)[0])
    t0 = time.perf_counter()
    r_xl = infer_xl_scan(vars_xl, sigs_l, sl)
    np.asarray(r_xl[0])
    dt_xl = (time.perf_counter() - t0) / ITERS
    fl_xl = compiled_flops(infer_xl, vars_xl, sig, sl)
    util_xl = mfu(fl_xl, dt_xl)
    rtfx_xl = b_l * SECONDS / dt_xl
    print(json.dumps({
        "metric": "conformer-XLarge (635M, d1024x24L) greedy RTFx @ "
                  "batch 32, sustained",
        "value": round(rtfx_xl, 2), "unit": "x realtime",
        "vs_baseline": None,
        "mfu": round(util_xl, 4) if util_xl is not None else None,
        "tflops_per_step": round(fl_xl / 1e12, 3) if fl_xl else None}))
    del vars_xl
    del vars_l, sigs_l

    # ---- batched beam-search decode (model + device beam, W=16) ----
    @jax.jit
    def infer_beam(signal, signal_len):
        out = model.apply(variables, signal, signal_len, train=False)
        return ctc_beam_search_batched(
            out.log_probs.astype(jnp.float32), out.encoded_len,
            beam_width=16)

    sig = jnp.asarray(
        rng.normal(size=(BATCH, SECONDS * SR)).astype(np.float32) * 0.1)
    sl = jnp.full((BATCH,), SECONDS * SR, jnp.int32)
    jax.block_until_ready(infer_beam(sig, sl))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = infer_beam(sig, sl)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / ITERS
    rtfx = BATCH * SECONDS / dt
    print(json.dumps({
        "metric": "beam-search (W=16) inference RTFx",
        "value": round(rtfx, 2), "unit": "x realtime",
        "vs_baseline": round(rtfx / A100_RTFX_ESTIMATE, 3)}))

    # ---- cache-aware streaming (the serving path): per-chunk latency ----
    import dataclasses

    from tpu_asr.config import ModelConfig
    from tpu_asr.models.ctc_model import CTCModel
    from tpu_asr.models.streaming import (CacheAwareStreamer,
                                          setup_streaming_params)

    cfg_s = ModelConfig()
    cfg_s = dataclasses.replace(
        cfg_s,
        encoder=dataclasses.replace(
            cfg_s.encoder, causal_downsampling=True,
            conv_context_size="causal", att_context_style="chunked_limited",
            # chunk = right+1 = 4 encoded frames = 16 mel = 160 ms audio;
            # left 108 encoded ~ 4.3 s attention context
            att_context_size=(108, 3)))
    model_s = CTCModel(cfg_s)
    b_s = 1                                   # single-session serving
    sec_chunk = 0.160
    sc = setup_streaming_params(cfg_s.encoder)
    sig1 = jnp.asarray(rng.normal(size=(b_s, SR)).astype(np.float32) * 0.1)
    vars_s = model_s.init({"params": jax.random.PRNGKey(0)}, sig1,
                          jnp.full((b_s,), SR, jnp.int32), train=False)
    streamer = CacheAwareStreamer(model_s, vars_s)
    n_mel = cfg_s.preprocessor.features
    chunk = jnp.asarray(
        rng.normal(size=(b_s, n_mel, sc.chunk_size)).astype(np.float32))
    clen = jnp.full((b_s,), sc.chunk_size, jnp.int32)
    state = streamer.init_state(b_s)
    lp, el, state = streamer.step(state, chunk, clen)   # compile
    float(jnp.sum(el))
    n_steps = 50
    t0 = time.perf_counter()
    for _ in range(n_steps):
        lp, el, state = streamer.step(state, chunk, clen)
    float(jnp.sum(el))
    lat_ms = (time.perf_counter() - t0) / n_steps * 1e3
    print(json.dumps({
        "metric": "cache-aware streaming per-chunk latency, B=1 "
                  "(160 ms chunks, 4.3 s attention context; wall incl. "
                  "host dispatch)",
        "value": round(lat_ms, 2), "unit": "ms",
        "vs_baseline": round(sec_chunk * 1e3 / lat_ms, 2)}))

    # multi-stream serving: B concurrent streams share one step dispatch —
    # the per-chunk host/dispatch floor (which dominates B=1 through the
    # tunnel) amortizes 1/B per stream
    b_m = 8
    chunk_m = jnp.asarray(
        rng.normal(size=(b_m, n_mel, sc.chunk_size)).astype(np.float32))
    clen_m = jnp.full((b_m,), sc.chunk_size, jnp.int32)
    state_m = streamer.init_state(b_m)
    lp, el, state_m = streamer.step(state_m, chunk_m, clen_m)   # compile
    float(jnp.sum(el))
    t0 = time.perf_counter()
    for _ in range(n_steps):
        lp, el, state_m = streamer.step(state_m, chunk_m, clen_m)
    float(jnp.sum(el))
    lat_m = (time.perf_counter() - t0) / n_steps * 1e3
    print(json.dumps({
        "metric": f"cache-aware streaming, {b_m} concurrent streams: "
                  "per-chunk step latency (160 ms chunks; per-stream "
                  "realtime budget is still 160 ms)",
        "value": round(lat_m, 2), "unit": "ms",
        "vs_baseline": round(b_m * sec_chunk * 1e3 / lat_m, 2)}))


def main() -> None:
    import jax

    # persistent compile cache: the remote TPU compile of the 16-layer model
    # takes minutes cold; cached runs start in seconds
    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from tpu_asr.config import ModelConfig
    from tpu_asr.models.ctc_model import CTCModel
    from tpu_asr.ops.ctc import ctc_greedy_decode

    model = CTCModel(ModelConfig())          # bf16 compute path by default
    rng_np = np.random.default_rng(0)
    signal = jnp.asarray(
        rng_np.normal(size=(BATCH, SECONDS * SR)).astype(np.float32) * 0.1)
    signal_len = jnp.full((BATCH,), SECONDS * SR, jnp.int32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, signal,
                           signal_len, train=False)

    @jax.jit
    def infer(signal, signal_len):
        out = model.apply(variables, signal, signal_len, train=False)
        tokens, n_tokens = ctc_greedy_decode(out.log_probs, out.encoded_len)
        return tokens, n_tokens

    # compile + warmup
    jax.block_until_ready(infer(signal, signal_len))
    jax.block_until_ready(infer(signal, signal_len))

    start = time.perf_counter()
    for _ in range(ITERS):
        tokens, n_tokens = infer(signal, signal_len)
    jax.block_until_ready((tokens, n_tokens))
    elapsed = time.perf_counter() - start

    audio_seconds = BATCH * SECONDS * ITERS
    rtfx_dispatch = audio_seconds / elapsed

    # SUSTAINED throughput: ITERS distinct batches scanned inside ONE jit —
    # the deployment-representative number. Per-call dispatch through the
    # axon dev tunnel has a ~0.6-1 ms floor and the per-step Python loop
    # above pays ~3 ms/step of host gap that real pipelined serving (and the
    # device itself, which runs steps back-to-back at <10 us gap in traces)
    # does not. Distinct batches per step keep XLA from hoisting the
    # loop-invariant body out of the scan.
    sigs = jnp.asarray(
        rng_np.normal(size=(ITERS, BATCH, SECONDS * SR)).astype(np.float32)
        * 0.1)

    @jax.jit
    def infer_scan(sigs, signal_len):
        def body(c, sig):
            out = model.apply(variables, sig, signal_len, train=False)
            tokens, n_tokens = ctc_greedy_decode(out.log_probs,
                                                 out.encoded_len)
            return c, (jnp.sum(tokens), jnp.sum(n_tokens))
        return jax.lax.scan(body, 0, sigs)[1]

    degraded = False
    try:
        # host transfer as the completion fence: under the axon tunnel
        # block_until_ready can return before device completion (see
        # bench_train.py), which would wildly flatter a single-dispatch
        # measurement
        np.asarray(infer_scan(sigs, signal_len)[0])
        start = time.perf_counter()
        r = infer_scan(sigs, signal_len)
        np.asarray(r[0])
        elapsed = time.perf_counter() - start
        # degraded-dispatch self-check (VERDICT r4 weak #2): sustained must
        # be at least as fast as the per-call loop (it amortizes dispatch).
        # On violation re-measure once; stamp the headline if it persists.
        if audio_seconds / elapsed < rtfx_dispatch * 0.98:
            start = time.perf_counter()
            r = infer_scan(sigs, signal_len)
            np.asarray(r[0])
            elapsed = time.perf_counter() - start
            degraded = audio_seconds / elapsed < rtfx_dispatch * 0.98
    except Exception as e:                    # headline must always print
        print(json.dumps({"metric": "sustained-scan fallback",
                          "error": str(e)[:200]}))
        # keep the per-dispatch measurement as the headline
    rtfx = audio_seconds / elapsed

    # MFU vs the chip's dense bf16 peak (utils/flops.py) — roofline context
    # for the RTFx headline. None when the backend hides cost analysis.
    from tpu_asr.utils.flops import compiled_flops, mfu
    fl = compiled_flops(infer, signal, signal_len)
    util = mfu(fl, elapsed / ITERS)

    import sys
    if "--full" in sys.argv:
        _bench_full(model, variables, infer, rtfx)

    print(json.dumps({
        "metric": "greedy RTFx, per-call dispatch (includes axon-tunnel "
                  "~1 ms/step host floor)",
        "value": round(rtfx_dispatch, 2), "unit": "x realtime",
        "vs_baseline": round(rtfx_dispatch / A100_RTFX_ESTIMATE, 3)}))
    # the driver-contract headline stays the LAST line printed
    headline = {
        "metric": "librispeech-style greedy inference RTFx (conformer-ctc-small)",
        "value": round(rtfx, 2),
        "unit": "x realtime",
        "vs_baseline": round(rtfx / A100_RTFX_ESTIMATE, 3),
        "mfu": round(util, 4) if util is not None else None,
        "tflops_per_step": round(fl / 1e12, 3) if fl else None,
    }
    if degraded:
        headline["degraded"] = True
    print(json.dumps(headline))


if __name__ == "__main__":
    main()
