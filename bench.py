"""Headline benchmark: Conformer-CTC small greedy-inference RTFx.

Measures end-to-end inference throughput (featurizer -> encoder -> decoder ->
on-device greedy CTC decode) for the reference teacher architecture
(stt_en_conformer_ctc_small: d_model 176, 16 layers — conformer_ctc_bpe.yaml:7-18)
on whatever accelerator JAX sees, and prints ONE JSON line.

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
    rtfx = audio_seconds / elapsed

    # MFU vs the chip's dense bf16 peak (utils/flops.py) — roofline context
    # for the RTFx headline. None when the backend hides cost analysis.
    from tpu_asr.utils.flops import compiled_flops, mfu
    fl = compiled_flops(infer, signal, signal_len)
    util = mfu(fl, elapsed / ITERS)
    print(json.dumps({
        "metric": "librispeech-style greedy inference RTFx (conformer-ctc-small)",
        "value": round(rtfx, 2),
        "unit": "x realtime",
        "vs_baseline": round(rtfx / A100_RTFX_ESTIMATE, 3),
        "mfu": round(util, 4) if util is not None else None,
        "tflops_per_step": round(fl / 1e12, 3) if fl else None,
    }))


if __name__ == "__main__":
    main()
