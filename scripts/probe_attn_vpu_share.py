"""Bound the VPU (softmax/mask/elementwise) share of the block-attention
kernel at conformer-LARGE train dims.

The round-4 same-session A/B showed the grid-swap traffic elimination is
step-level FLAT: the kernel is compute-bound, not HBM-bound. This probe
separates the compute into 'matmul pipeline' vs 'score-tile elementwise
passes' by monkeypatching `_block_scores` with a WRONG-SEMANTICS variant
that skips the mask/scale/softmax chain (scores feed the value contraction
raw). Same matmuls, same shapes, no softmax chain. The delta vs the real
kernel is the elementwise/VPU share — the remaining tuning surface if
large, the padding/matmul floor if small.

Probe-only: never affects production code.
"""

from __future__ import annotations

import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from tpu_asr.ops import pallas_attention as PA

    real_scores = PA._block_scores

    def scores_no_softmax(x16, wq_ref, wk_ref, wv_ref, cu_ref, cv_ref,
                          bk_ref, bv_ref, wev_ref, wod_ref, sint_ref,
                          cost_ref, cos_ref, sin_ref, bias, *, t, dk_real,
                          left, right, seg=None):
        qt = PA._project_t(x16, wq_ref, cu_ref)
        q_vt = qt - cu_ref[:] + cv_ref[:]
        kt = PA._project_t(x16, wk_ref, bk_ref)
        vt = PA._project_t(x16, wv_ref, bv_ref)
        qu16, qv16, k16 = (a.astype(jnp.bfloat16) for a in (qt, q_vt, kt))
        cdn = (((1,), (1,)), ((0,), (0,)))
        ac = jax.lax.dot_general(qu16, k16, cdn,
                                 preferred_element_type=jnp.float32)
        wdn = (((1,), (1,)), ((0,), (0,)))
        wev16 = wev_ref[:].astype(jnp.bfloat16)
        wod16 = wod_ref[:].astype(jnp.bfloat16)
        u = jax.lax.dot_general(wev16, qv16, wdn,
                                preferred_element_type=jnp.float32)
        w = jax.lax.dot_general(wod16, qv16, wdn,
                                preferred_element_type=jnp.float32)
        a = (u + w).astype(jnp.bfloat16)          # no sin/cos rotation
        bmat = (w - u).astype(jnp.bfloat16)
        pdn = (((1,), (1,)), ((), ()))
        bd = jax.lax.dot_general(a, cos_ref[:].astype(jnp.bfloat16), pdn,
                                 preferred_element_type=jnp.float32)
        bd = bd + jax.lax.dot_general(bmat, sin_ref[:].astype(jnp.bfloat16),
                                      pdn, preferred_element_type=jnp.float32)
        attn = ac + bd                            # NO scale/mask/softmax
        return attn * (1.0 / 4096.0), qt, q_vt, kt, vt

    import flax.linen as nn

    from tpu_asr.config import EncoderConfig
    from tpu_asr.models import conformer as C

    b, t = 32, 376
    cfg = EncoderConfig(d_model=512, n_heads=8, n_layers=18)
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(b, t, cfg.d_model)).astype(np.float32))
    mask = jnp.ones((b, t), bool)
    pos = C.rel_positional_encoding(t, cfg.d_model, dtype=dt)
    key = jax.random.key(0, impl="rbg")

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
            return x + h

    N = 30

    def bench(mode):
        mod = AttnSub(cfg, 0.0)
        vs = mod.init({"params": jax.random.PRNGKey(0), "dropout": key},
                      x0, True)
        params = vs["params"]

        def apply(p, x, train):
            return mod.apply({"params": p}, x, train, rngs={"dropout": key})

        if mode == "fwd":
            @jax.jit
            def run(p, x):
                def sc(carry, _):
                    return carry + apply(p, carry, False)[:, :1] * 1e-9, ()
                xf, _ = jax.lax.scan(sc, x, None, length=N)
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
                xf, ls = jax.lax.scan(sc, x, None, length=N)
                return jnp.sum(ls) + jnp.sum(xf[0, 0].astype(jnp.float32))

        float(run(params, x0))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(params, x0))
            best = min(best, (time.perf_counter() - t0) / N * 1e3)
        return best

    for label, patched in [("real   ", False), ("no-soft", True)]:
        PA._block_scores = scores_no_softmax if patched else real_scores
        for mode in ("fwd", "fb"):
            try:
                ms = bench(mode)
                print(f"{label} {mode:3s}: {ms:7.3f} ms/iter")
            except Exception as e:
                print(f"{label} {mode:3s}: FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}")
    PA._block_scores = real_scores


if __name__ == "__main__":
    main()
