"""Per-sublayer f+b cost at conformer-LARGE train dims, with ablations.

Extends probe_conv_train.py to the attention and FFN sublayers using the
REAL flax modules (models/conformer.py), so backend gates, dropout, and
param layouts match the training path exactly. Scan-amortized, host-fenced
(ROADMAP measurement rules).

Usage: python scripts/probe_large_sublayers.py
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

    b, t = 32, 376
    cfg = EncoderConfig(d_model=512, n_heads=8, n_layers=18,
                        conv_kernel_size=31)
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(b, t, cfg.d_model)).astype(np.float32))
    mask = jnp.ones((b, t), bool)
    pos = C.rel_positional_encoding(t, cfg.d_model, dtype=dt)
    key = jax.random.key(0, impl="rbg")

    class AttnSub(nn.Module):
        cfg: EncoderConfig
        backend: str
        drop: float

        @nn.compact
        def __call__(self, x, train):
            c = self.cfg
            h = nn.LayerNorm(dtype=dt, name="norm_self_att")(x)
            h = C.RelPositionMultiHeadAttention(
                c.d_model, c.n_heads, self.drop, dt,
                tuple(c.att_context_size), c.att_context_style,
                attention_backend=self.backend, name="self_attn",
            )(h, pos, mask, deterministic=not train)
            if train and self.drop > 0:
                h = nn.Dropout(self.drop, deterministic=False)(h)
            return x + h

    class FFNSub(nn.Module):
        cfg: EncoderConfig
        drop: float

        @nn.compact
        def __call__(self, x, train):
            c = self.cfg
            h = nn.LayerNorm(dtype=dt, name="norm_feed_forward1")(x)
            h = C.FeedForward(c.d_model, c.d_ff, self.drop, dt,
                              name="feed_forward1")(h, not train)
            if train and self.drop > 0:
                h = nn.Dropout(self.drop, deterministic=False)(h)
            return x + 0.5 * h

    class ConvSub(nn.Module):
        cfg: EncoderConfig
        drop: float

        @nn.compact
        def __call__(self, x, train):
            h = nn.LayerNorm(dtype=dt, name="norm_conv")(x)
            h = C.ConformerConvolution(self.cfg, dt, name="conv")(
                h, mask, train, not train)
            if train and self.drop > 0:
                h = nn.Dropout(self.drop, deterministic=False)(h)
            return x + h

    N = 30

    def bench(mod, train=True, n=N):
        vs = mod.init({"params": jax.random.PRNGKey(0), "dropout": key},
                      x0, train)
        params = vs["params"]
        extra = {k: v for k, v in vs.items() if k != "params"}

        def apply(p, x):
            out = mod.apply({"params": p, **extra}, x, train,
                            rngs={"dropout": key},
                            mutable=list(extra.keys()) or False)
            return out[0] if extra else out

        body = jax.checkpoint(apply)

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
        for _ in range(2):
            t0 = time.perf_counter()
            float(run(params, x0))
            best = min(best, (time.perf_counter() - t0) / n * 1e3)
        return best

    peak = 197e12
    rows = b * t
    f_attn = (4 * rows * cfg.d_model ** 2 * 2          # qkvo proj
              + 2 * rows * cfg.d_model * cfg.d_model * 2  # pos proj approx
              + b * cfg.n_heads * t * t * (cfg.d_model // cfg.n_heads) * 2 * 3)
    f_ffn = 2 * rows * cfg.d_model * cfg.d_ff * 2
    f_conv = 2 * rows * cfg.d_model * (2 * cfg.d_model + cfg.d_model)
    print(f"ideal f+b+remat ms: attn={(f_attn*4/peak)*1e3:.2f} "
          f"ffn={(f_ffn*4/peak)*1e3:.2f} conv={(f_conv*4/peak)*1e3:.2f}")

    for name, mod in [
        ("attn pallas drop=0.1", AttnSub(cfg, "pallas", 0.1)),
        ("attn pallas drop=0  ", AttnSub(cfg, "pallas", 0.0)),
        ("attn xla    drop=0.1", AttnSub(cfg, "xla", 0.1)),
        ("ffn  xla    drop=0.1", FFNSub(cfg, 0.1)),
        ("ffn  xla    drop=0  ", FFNSub(cfg, 0.0)),
        ("conv xla    drop=0.1", ConvSub(cfg, 0.1)),
        ("conv xla    drop=0  ", ConvSub(cfg, 0.0)),
    ]:
        ms = bench(mod)
        print(f"{name}: {ms:7.3f} ms/iter (f+b, remat, scan-amortized)")


if __name__ == "__main__":
    main()
