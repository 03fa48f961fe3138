"""Component-level inference timing vs batch size.

ROADMAP open item: greedy RTFx at B=64 (23.5k) dips below B=32 (31.4k) —
this script splits the inference step (features -> encoder -> decoder ->
greedy decode) per batch size so the superlinear component is visible.

Run serially — on a 1-CPU host a concurrent pytest run starves the device
driver thread.

Usage: python scripts/profile_infer_batch.py [B ...]   (default 32 64 128)
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from tpu_asr.config import ModelConfig
    from tpu_asr.models.ctc_model import CTCModel
    from tpu_asr.ops.ctc import ctc_greedy_decode
    from tpu_asr.ops.features import FilterbankFeatures

    sec, sr = 15, 16000
    batches = [int(a) for a in sys.argv[1:]] or [32, 64, 128]
    cfg = ModelConfig()
    model = CTCModel(cfg)
    rng = np.random.default_rng(0)

    def timeit(f, *a, n=20):
        jax.block_until_ready(f(*a))
        jax.block_until_ready(f(*a))
        t0 = time.perf_counter()
        for _ in range(n):
            r = f(*a)
        jax.block_until_ready(r)
        return (time.perf_counter() - t0) / n * 1e3

    for b in batches:
        signal = jnp.asarray(
            rng.normal(size=(b, sec * sr)).astype(np.float32) * 0.1)
        slen = jnp.full((b,), sec * sr, jnp.int32)
        variables = model.init({"params": jax.random.PRNGKey(0)}, signal,
                               slen, train=False)

        full = jax.jit(lambda s, l: model.apply(variables, s, l, train=False))
        out = full(signal, slen)
        fb = FilterbankFeatures(cfg.preprocessor)
        feats = jax.jit(lambda s, l: fb(s, l, train=False))
        mel, mel_len = feats(signal, slen)

        enc = jax.jit(lambda m, ml: model.apply(
            variables, m, ml, train=False, method=CTCModel.forward_features))

        greedy = jax.jit(lambda lp, el: ctc_greedy_decode(lp, el))

        t_full = timeit(full, signal, slen)
        t_feat = timeit(feats, signal, slen)
        t_greedy = timeit(greedy, out.log_probs, out.encoded_len)
        t_enc = timeit(enc, mel, mel_len)
        rtfx = b * sec / (t_full / 1e3)
        print(f"B={b:4d}  full {t_full:7.2f} ms  feat {t_feat:6.2f}  "
              f"enc+dec {t_enc:7.2f}  greedy {t_greedy:6.2f}  "
              f"RTFx {rtfx:8.0f}  ms/utt {t_full / b:5.2f}")


if __name__ == "__main__":
    main()
