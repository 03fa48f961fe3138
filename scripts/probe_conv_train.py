"""Decision probe: conformer conv-module TRAINING cost at production dims.

ROADMAP names a fused conv-module train kernel as the clearest remaining
LARGE-train lever (sublayer split at d512: attention 3.9, ffn 2.4 x2,
conv 2.2 ms/layer f+b — all at 20-40 TF/s of the 197 peak). Before writing
any kernel, this probe decomposes the conv sublayer's f+b cost on the real
chip, scan-amortized (the only measurement mode that survives the axon
tunnel's 1-25 ms dispatch floor — see ROADMAP measurement cautions):

  a) full conv module, current XLA path, batch_norm (the flagship config)
  b) same with layer_norm (the conv_norm_type='layer_norm' option)
  c) matmuls only (pw1+GLU+pw2, no depthwise/norm)  — MXU roofline share
  d) depthwise conv alone: conv_general_dilated vs k shifted adds (XLA)
  e) live BN alone (fp32 stats over (B,T))

Every variant is value_and_grad w.r.t. params AND x, under jax.remat
(training default), scanned N deep with a data dependency between steps.

Usage: python scripts/probe_conv_train.py [--small]
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

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    small = "--small" in sys.argv
    if small:
        b, t, d, k = 32, 376, 176, 31
    else:
        b, t, d, k = 32, 376, 512, 31
    pad_l = pad_r = (k - 1) // 2
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(b, t, d)).astype(np.float32))
    mask = jnp.ones((b, t), bool)

    def mk(shape):
        return jnp.asarray(
            rng.normal(size=shape).astype(np.float32) * 0.02)

    params = dict(
        w1=mk((d, 2 * d)), b1=mk((2 * d,)),
        wd=mk((k, 1, d)), bd=mk((d,)),
        scale=jnp.ones((d,), jnp.float32), bias=jnp.zeros((d,), jnp.float32),
        w2=mk((d, d)), b2=mk((d,)),
    )

    def conv_module(p, x, norm, depthwise="conv"):
        h = x.astype(dt) @ p["w1"].astype(dt) + p["b1"].astype(dt)
        lin, gate = h[..., :d], h[..., d:]
        h = lin * jax.nn.sigmoid(gate)
        h = jnp.where(mask[..., None], h, 0.0)
        if depthwise == "conv":
            h = jax.lax.conv_general_dilated(
                h.astype(dt), p["wd"].astype(dt), window_strides=(1,),
                padding=((pad_l, pad_r),), feature_group_count=d,
                dimension_numbers=("NWC", "WIO", "NWC")) + p["bd"].astype(dt)
        else:  # k static shifted FMAs
            acc = jnp.zeros_like(h)
            for j in range(k):
                off = j - pad_l
                if off < 0:
                    sh = jnp.pad(h[:, :t + off], ((0, 0), (-off, 0), (0, 0)))
                elif off > 0:
                    sh = jnp.pad(h[:, off:], ((0, 0), (0, off), (0, 0)))
                else:
                    sh = h
                acc = acc + sh * p["wd"][j, 0][None, None, :].astype(dt)
            h = acc + p["bd"].astype(dt)
        if norm == "batch_norm":
            xf = h.astype(jnp.float32)
            mean = jnp.mean(xf, axis=(0, 1))
            var = jnp.mean(jnp.square(xf - mean[None, None]), axis=(0, 1))
            inv = jax.lax.rsqrt(var + 1e-5)
            h = ((xf - mean[None, None]) * inv[None, None] * p["scale"]
                 + p["bias"]).astype(dt)
        elif norm == "layer_norm":
            hf = h.astype(jnp.float32)
            mean = jnp.mean(hf, axis=-1, keepdims=True)
            var = jnp.maximum(jnp.mean(jnp.square(hf), axis=-1,
                                       keepdims=True) - jnp.square(mean), 0.0)
            hf = (hf - mean) * jax.lax.rsqrt(var + 1e-6)
            h = (hf * p["scale"] + p["bias"]).astype(dt)
        h = jax.nn.silu(h)
        return h.astype(dt) @ p["w2"].astype(dt) + p["b2"].astype(dt)

    def matmuls_only(p, x, *_):
        h = x.astype(dt) @ p["w1"].astype(dt) + p["b1"].astype(dt)
        lin, gate = h[..., :d], h[..., d:]
        h = lin * jax.nn.sigmoid(gate)
        return h @ p["w2"].astype(dt) + p["b2"].astype(dt)

    def depthwise_only(p, x, _, depthwise="conv"):
        h = x.astype(dt)
        if depthwise == "conv":
            h = jax.lax.conv_general_dilated(
                h, p["wd"].astype(dt), window_strides=(1,),
                padding=((pad_l, pad_r),), feature_group_count=d,
                dimension_numbers=("NWC", "WIO", "NWC")) + p["bd"].astype(dt)
        else:
            acc = jnp.zeros_like(h)
            for j in range(k):
                off = j - pad_l
                if off < 0:
                    sh = jnp.pad(h[:, :t + off], ((0, 0), (-off, 0), (0, 0)))
                elif off > 0:
                    sh = jnp.pad(h[:, off:], ((0, 0), (0, off), (0, 0)))
                else:
                    sh = h
                acc = acc + sh * p["wd"][j, 0][None, None, :].astype(dt)
            h = acc + p["bd"].astype(dt)
        return h

    def bn_only(p, x, *_):
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(0, 1))
        var = jnp.mean(jnp.square(xf - mean[None, None]), axis=(0, 1))
        inv = jax.lax.rsqrt(var + 1e-5)
        return ((xf - mean[None, None]) * inv[None, None] * p["scale"]
                + p["bias"]).astype(dt)

    N = 30

    def bench(fn, *fargs, n=N):
        body = jax.checkpoint(lambda p, x: fn(p, x, *fargs))

        def step(p, x):
            def loss(p, x):
                return jnp.sum(body(p, x).astype(jnp.float32) ** 2) * 1e-6
            lv, (gp, gx) = jax.value_and_grad(loss, argnums=(0, 1))(p, x)
            return x + 1e-3 * gx.astype(x.dtype), lv

        @jax.jit
        def run(p, x):
            def sc(carry, _):
                xn, lv = step(p, carry)
                return xn, lv
            xf, ls = jax.lax.scan(sc, x, None, length=n)
            return jnp.sum(ls) + jnp.sum(xf[0, 0].astype(jnp.float32))

        r = run(params, x0)
        float(r)  # fence with host transfer
        t0 = time.perf_counter()
        r = run(params, x0)
        float(r)
        el = (time.perf_counter() - t0) / n * 1e3
        t0 = time.perf_counter()
        r = run(params, x0)
        float(r)
        el2 = (time.perf_counter() - t0) / n * 1e3
        return min(el, el2)

    flops_mm = 2 * b * t * d * (2 * d + d)      # pw1 + pw2 fwd
    print(f"dims: B={b} T={t} D={d} k={k}; fwd matmul GF={flops_mm/1e9:.1f}; "
          f"ideal f+b+remat ms={(flops_mm * 4 / 197e12) * 1e3:.3f}")
    for name, fn, fargs in [
        ("full module, batch_norm, dw=conv   ", conv_module, ("batch_norm", "conv")),
        ("full module, batch_norm, dw=shifts ", conv_module, ("batch_norm", "shifts")),
        ("full module, layer_norm, dw=conv   ", conv_module, ("layer_norm", "conv")),
        ("matmuls only (pw1+GLU+pw2)         ", matmuls_only, ()),
        ("depthwise only, conv_general       ", depthwise_only, (None, "conv")),
        ("depthwise only, shifted adds       ", depthwise_only, (None, "shifts")),
        ("live BN only                       ", bn_only, ()),
    ]:
        ms = bench(fn, *fargs)
        print(f"{name}: {ms:7.3f} ms/iter (f+b, remat, scan-amortized)")


if __name__ == "__main__":
    main()
