"""Attention-sublayer-only probe at conformer-LARGE train dims.

The ROADMAP round-3 probes localized the remaining LARGE-train headroom to
the block-attention kernel (3.04 ms/layer f+b at drop=0 vs a ~1.2-1.5 ms
executed-flops floor).  This probe isolates that one sublayer so hpp / VMEM
/ dtype experiments are a single fast run:

    python scripts/probe_attn_tuning.py                  # default budget
    TPU_ASR_ATTN_VMEM_MB=30 python scripts/probe_attn_tuning.py   # bwd hpp=4
    TPU_ASR_ATTN_VMEM_MB=40 python scripts/probe_attn_tuning.py   # fwd hpp=8

Prints the hpp each direction picks, fwd-only and f+b scan-amortized
times, and the drop=0.1 variant (in-kernel PRNG cost).
Measurement rules per ROADMAP: host-fenced float(), best-of over repeats.
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
    import flax.linen as nn

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from tpu_asr.config import EncoderConfig
    from tpu_asr.models import conformer as C
    from tpu_asr.ops import pallas_attention as PA

    b, t = 32, 376
    cfg = EncoderConfig(d_model=512, n_heads=8, n_layers=18)
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(b, t, cfg.d_model)).astype(np.float32))
    mask = jnp.ones((b, t), bool)
    pos = C.rel_positional_encoding(t, cfg.d_model, dtype=dt)
    key = jax.random.key(0, impl="rbg")

    tp = PA._round_up(t, PA.LANE)
    dk = cfg.d_model // cfg.n_heads
    half = cfg.d_model // 2
    budget = os.environ.get("TPU_ASR_ATTN_VMEM_MB", "40 (default)")
    for rate in (0.0, 0.1):
        hpp_f = PA._pick_hpp_block(cfg.n_heads, tp, dk, half,
                                   n_tt=3, n_tdh=6, n_tdk=8, rate=rate)
        hpp_b = PA._pick_hpp_block(cfg.n_heads, tp, dk, half,
                                   n_tt=4, n_tdh=8, n_tdk=12, rate=rate)
        print(f"budget={budget} MB drop={rate}: hpp fwd={hpp_f} "
              f"(grid {cfg.n_heads // hpp_f}x{b}), bwd={hpp_b} "
              f"(grid {cfg.n_heads // hpp_b}x{b})")

    class AttnSub(nn.Module):
        cfg: EncoderConfig
        drop: float

        @nn.compact
        def __call__(self, x, train):
            c = self.cfg
            h = nn.LayerNorm(dtype=dt, name="norm_self_att")(x)
            h = C.RelPositionMultiHeadAttention(
                c.d_model, c.n_heads, self.drop, dt,
                tuple(c.att_context_size), c.att_context_style,
                attention_backend="pallas", name="self_attn",
            )(h, pos, mask, deterministic=not train)
            if train and self.drop > 0:
                h = nn.Dropout(self.drop, deterministic=False)(h)
            return x + h

    N = 30

    def bench(mod, mode, n=N):
        vs = mod.init({"params": jax.random.PRNGKey(0), "dropout": key},
                      x0, True)
        params = vs["params"]

        def apply(p, x, train):
            return mod.apply({"params": p}, x, train, rngs={"dropout": key})

        if mode == "fwd":
            @jax.jit
            def run(p, x):
                def sc(carry, _):
                    # keep the apply LIVE: a *0 feedback is folded away by
                    # XLA's algebraic simplifier (mul(x,0)->0) and the whole
                    # attention would be DCE'd; 1e-9 perturbs negligibly
                    return carry + apply(p, carry, False)[:, :1] * 1e-9, ()
                xf, _ = jax.lax.scan(sc, x, None, length=n)
                return jnp.sum(xf[0, 0].astype(jnp.float32))
        else:
            body = jax.checkpoint(lambda p, x: apply(p, x, True))

            def loss(p, x):
                return jnp.sum(body(p, x).astype(jnp.float32) ** 2) * 1e-6

            @jax.jit
            def run(p, x):
                def sc(carry, _):
                    lv, (gp, gx) = jax.value_and_grad(loss, (0, 1))(p, carry)
                    return carry + 1e-3 * gx.astype(carry.dtype), lv
                xf, ls = jax.lax.scan(sc, x, None, length=n)
                return jnp.sum(ls) + jnp.sum(xf[0, 0].astype(jnp.float32))

        float(run(params, x0))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(params, x0))
            best = min(best, (time.perf_counter() - t0) / n * 1e3)
        return best

    for name, mod, mode in [
        ("fwd-only drop=0 ", AttnSub(cfg, 0.0), "fwd"),
        ("f+b      drop=0 ", AttnSub(cfg, 0.0), "fb"),
        ("f+b      drop=.1", AttnSub(cfg, 0.1), "fb"),
    ]:
        try:
            ms = bench(mod, mode)
            print(f"{name}: {ms:7.3f} ms/iter (scan-amortized)")
        except Exception as e:  # compile failures are data too
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
