"""Fused flow-matching Euler loop as one Pallas kernel (fwd + bwd).

The FM-KT sampler (reference FlowMatchingModule, asr_train.py:1318-1360) with
the `mlp` meta encoder is, per feature position, a tiny row-wise recurrence:

    for j = 0 .. N-1:                      # t = (N-j)/N
        h = relu(x @ W1x + t * a + c)      # fc1 with the time embedding
        v = h @ W2 + b2                    #   folded into (a, c) — see below
        x = x - v / N                      # Euler step
    last_v = v                             # (the training loss uses only it)

The XLA `nn.scan` version round-trips x (and the last-velocity carry) through
HBM on EVERY Euler step — for the flowkd training step that is
~4 arrays x (L*B, T, 88) per step x 8 steps of pure HBM traffic for ~10 ms of
MXU-tiny matmuls (ROADMAP round-3 profile: 5.05 ms fwd + ~3 ms bwd of a
44 ms step). This kernel keeps x IN VMEM across all `max_steps` iterations:
HBM sees one read of x0 and one write each of (x_final, last_v); every
intermediate (h, v, per-step x) lives and dies in VMEM.

Time-embedding fold: the reference computes
`h = relu(concat[x, Dense(t)] @ W1 + b1)` where Dense(t) = t*We + be is the
Linear(1 -> time_embed_dim) on the scalar t broadcast over positions.
Splitting W1 into its x-rows W1x and time-rows W1t gives
`h = relu(x @ W1x + t * (We @ W1t) + (be @ W1t + b1))`; the caller passes
a = We @ W1t and c = be @ W1t + b1 (computed in JAX so autodiff reaches the
original parameters for free), and the kernel never materialises the
(rows, T, time_embed_dim) embedding at all.

Per-row step counts (the DynamicStepRouter's `group` strategy,
asr_train.py:627-635) ride in as an f32 (rows, 1, 1) operand: iteration j is
masked by j < N_row, and last_v is captured at j == N_row - 1 — identical
semantics to the masked `nn.scan` in kd/flow_matching.py.

Backward (custom VJP): flash-style recompute. The bwd kernel replays the
forward once, parking each step's input x_j in a VMEM scratch
(max_steps, rb, T, C), then walks j = N-1 .. 0 accumulating dW1x/da/dc/dW2/db2
in VMEM registers and carrying dL/dx_j; weight-grad partials are emitted
per program and summed outside (house pattern of ops/pallas_ffn.py — under
GSPMD the outer sum becomes the cross-shard psum automatically).

Numerics: dots run in the module compute dtype (bf16 on the TPU path) with
f32 accumulation, and x/v round to the compute dtype at exactly the points
the flax scan path rounds its carry — so the two backends are
checkpoint- AND trajectory-interchangeable (tests/test_pallas_fm.py pins
fp32 near-exactness and bf16 tolerance).

GSPMD: wrapped with the batch partition rule (parallel/kernel_sharding.py);
rows = (B-major) x layers, so the dp-sharded batch axis stays sharded.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round(x, cdt):
    """Round an f32 intermediate to the compute dtype (no-op for f32) and
    return it as f32 — mirrors the flax scan path's bf16 carry."""
    if cdt == jnp.float32:
        return x
    return x.astype(cdt).astype(jnp.float32)


def _step_pre(x_cdt, w1, a_ref, c_ref, t):
    """fc1 pre-activation in f32: x @ W1x + t * a + c (dot in x's dtype)."""
    dn = (((2,), (0,)), ((), ()))
    p = jax.lax.dot_general(x_cdt, w1, dn,
                            preferred_element_type=jnp.float32)
    return p + t * a_ref[:] + c_ref[:]


def _velocity(h, w2, b2_ref, cdt):
    dn = (((2,), (0,)), ((), ()))
    v = jax.lax.dot_general(h.astype(cdt), w2, dn,
                            preferred_element_type=jnp.float32)
    return _round(v + b2_ref[:], cdt)


def _fm_fwd_kernel(n_ref, x_ref, w1_ref, a_ref, c_ref, w2_ref, b2_ref,
                   xo_ref, vo_ref, *, ms, cdt):
    """Carries (x, last_v) live in VMEM in the COMPUTE dtype — they are
    cdt-rounded values anyway (the scan path's carry dtype), and halving
    the resident planes halves the grid's program count, which is the
    dominant cost at these matmul sizes (~10-20 us fixed per program)."""
    n = n_ref[:]                                       # (rb, 1, 1) f32
    x = x_ref[:].astype(cdt)                           # (rb, T, C)
    w1 = w1_ref[:].astype(cdt)
    w2 = w2_ref[:].astype(cdt)
    last_v = jnp.zeros_like(x)
    for j in range(ms):
        t = (n - j) / n
        p = _step_pre(x, w1, a_ref, c_ref, t)
        h = _round(jnp.maximum(p, 0.0), cdt)
        v = _velocity(h, w2, b2_ref, cdt)
        active = j < n
        x = jnp.where(active,
                      (x.astype(jnp.float32) - v / n).astype(cdt), x)
        last_v = jnp.where(j == n - 1.0, v.astype(cdt), last_v)
    xo_ref[:] = x.astype(xo_ref.dtype)
    vo_ref[:] = last_v.astype(vo_ref.dtype)


def _fm_bwd_kernel(n_ref, x_ref, w1_ref, a_ref, c_ref, w2_ref, b2_ref,
                   gx_ref, gv_ref, dx_ref, dw1_ref, da_ref, dc_ref,
                   dw2_ref, db2_ref, xs, *, ms, cdt):
    n = n_ref[:]
    w1 = w1_ref[:].astype(cdt)
    w2 = w2_ref[:].astype(cdt)
    rb, tp, c_dim = x_ref.shape
    h_dim = w1_ref.shape[1]

    # forward replay, parking each step's INPUT x_j in VMEM scratch (in the
    # compute dtype — the values are cdt-rounded anyway, and the scratch is
    # the dominant VMEM consumer: halving it doubles rows-per-program)
    x = x_ref[:].astype(cdt)
    for j in range(ms):
        xs[j] = x
        t = (n - j) / n
        p = _step_pre(x, w1, a_ref, c_ref, t)
        h = _round(jnp.maximum(p, 0.0), cdt)
        v = _velocity(h, w2, b2_ref, cdt)
        x = jnp.where(j < n,
                      (x.astype(jnp.float32) - v / n).astype(cdt), x)

    gx = gx_ref[:].astype(jnp.float32)                 # dL/dx_{j+1} carry
    gv = gv_ref[:].astype(jnp.float32)
    dw1 = jnp.zeros((c_dim, h_dim), jnp.float32)
    da = jnp.zeros((1, 1, h_dim), jnp.float32)
    dc = jnp.zeros((1, 1, h_dim), jnp.float32)
    dw2 = jnp.zeros((h_dim, c_dim), jnp.float32)
    db2 = jnp.zeros((1, 1, c_dim), jnp.float32)
    tdn = (((2,), (1,)), ((), ()))                     # (rb,T,K) @ (M,K)^T
    for j in range(ms - 1, -1, -1):
        xj = xs[j]                                     # (rb,T,C) cdt
        t = (n - j) / n
        p = _step_pre(xj, w1, a_ref, c_ref, t)
        h = _round(jnp.maximum(p, 0.0), cdt)
        active = j < n
        dv = (jnp.where(active, -gx / n, 0.0)
              + jnp.where(j == n - 1.0, gv, 0.0))     # (rb,T,C)
        dv16 = dv.astype(cdt)
        h2 = h.astype(cdt).reshape(rb * tp, h_dim)
        dv2 = dv16.reshape(rb * tp, c_dim)
        kdn = (((0,), (0,)), ((), ()))                 # contract rows
        dw2 = dw2 + jax.lax.dot_general(
            h2, dv2, kdn, preferred_element_type=jnp.float32)
        db2 = db2 + jnp.sum(dv, axis=(0, 1))[None, None]
        dh = jax.lax.dot_general(dv16, w2, tdn,
                                 preferred_element_type=jnp.float32)
        dp = jnp.where(p > 0.0, dh, 0.0)
        dp16 = dp.astype(cdt)
        x2 = xj.reshape(rb * tp, c_dim)
        dw1 = dw1 + jax.lax.dot_general(
            x2, dp16.reshape(rb * tp, h_dim), kdn,
            preferred_element_type=jnp.float32)
        da = da + jnp.sum(t * dp, axis=(0, 1))[None, None]
        dc = dc + jnp.sum(dp, axis=(0, 1))[None, None]
        gx = gx + jax.lax.dot_general(dp16, w1, tdn,
                                      preferred_element_type=jnp.float32)
    dx_ref[:] = gx.astype(dx_ref.dtype)
    dw1_ref[:] = dw1[None]                             # (1, C, H) block
    da_ref[:] = da
    dc_ref[:] = dc
    dw2_ref[:] = dw2[None]                             # (1, H, C) block
    db2_ref[:] = db2


def _pick_rb(b: int, tp: int, bytes_per_elem: int) -> int:
    """Rows per program under a ~14 MB VMEM budget. `bytes_per_elem` is the
    per-(row, frame) byte count of all live (rb, tp, 128-lane) planes —
    pipelined IO blocks + resident carries + f32 transients (Mosaic pads the
    C=88 lanes to 128 in-register). Maximising rb matters: per-program fixed
    cost is ~10-20 us, which dominates matmuls this small."""
    rb = b
    while rb > 1 and (rb % 2 == 0) and rb * tp * 128 * bytes_per_elem > 14 * 2 ** 20:
        rb //= 2
    while b % rb:
        rb -= 1
    return rb


def _specs(rb, tp, c_dim, h_dim):
    x_spec = pl.BlockSpec((rb, tp, c_dim), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    n_spec = pl.BlockSpec((rb, 1, 1), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    w1_spec = pl.BlockSpec((c_dim, h_dim), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    vh = pl.BlockSpec((1, 1, h_dim), lambda i: (0, 0, 0),
                      memory_space=pltpu.VMEM)
    w2_spec = pl.BlockSpec((h_dim, c_dim), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    vc = pl.BlockSpec((1, 1, c_dim), lambda i: (0, 0, 0),
                      memory_space=pltpu.VMEM)
    return x_spec, n_spec, w1_spec, vh, w2_spec, vc


@functools.lru_cache(maxsize=None)
def _fm_fwd_partitioned(ms, cdt_name, interpret):
    from tpu_asr.parallel.kernel_sharding import batch_partitioned
    cdt = jnp.dtype(cdt_name)

    def fun(x, n3, w1, a, c, w2, b2):
        b, t, c_dim = x.shape
        h_dim = w1.shape[1]
        tp = (t + 7) // 8 * 8
        x_p = jnp.pad(x, ((0, 0), (0, tp - t), (0, 0)))
        # pipelined IO (x0 in + 2 outs, double-buffered) = 6 cdt planes,
        # resident x/last_v = 2 cdt planes, ~3 f32 transients (p/h/v)
        cs = cdt.itemsize
        rb = _pick_rb(b, tp, bytes_per_elem=8 * cs + 12)
        x_spec, n_spec, w1_spec, vh, w2_spec, vc = _specs(rb, tp, c_dim,
                                                          h_dim)
        kernel = functools.partial(_fm_fwd_kernel, ms=ms, cdt=cdt)
        xo, vo = pl.pallas_call(
            kernel,
            grid=(b // rb,),
            in_specs=[n_spec, x_spec, w1_spec, vh, vh, w2_spec, vc],
            out_specs=(x_spec, x_spec),
            out_shape=(jax.ShapeDtypeStruct((b, tp, c_dim), x.dtype),
                       jax.ShapeDtypeStruct((b, tp, c_dim), x.dtype)),
            cost_estimate=pl.CostEstimate(
                flops=4 * ms * b * tp * c_dim * h_dim,
                bytes_accessed=3 * 4 * b * tp * c_dim,
                transcendentals=0,
            ),
            interpret=interpret,
        )(n3, x_p, w1, a[None, None], c[None, None], w2, b2[None, None])
        return xo[:, :t], vo[:, :t]

    arg_specs = ((3, 0), (3, 0), (2, None), (1, None), (1, None), (2, None),
                 (1, None))
    return batch_partitioned(fun, arg_specs, ((3, 0), (3, 0)), tuple_out=True)


@functools.lru_cache(maxsize=None)
def _fm_bwd_partitioned(ms, cdt_name, interpret):
    from tpu_asr.parallel.kernel_sharding import batch_partitioned
    cdt = jnp.dtype(cdt_name)

    def fun(x, n3, w1, a, c, w2, b2, gx, gv):
        b, t, c_dim = x.shape
        h_dim = w1.shape[1]
        tp = (t + 7) // 8 * 8
        pad_t = lambda z: jnp.pad(z.astype(x.dtype),
                                  ((0, 0), (0, tp - t), (0, 0)))
        x_p, gx_p, gv_p = pad_t(x), pad_t(gx), pad_t(gv)
        # ms cdt scratch planes + pipelined IO (3 in + dx out, double-
        # buffered) = 8 cdt planes + gx carry f32 + ~4 f32 transients
        cs = cdt.itemsize
        rb = _pick_rb(b, tp, bytes_per_elem=(ms + 8) * cs + 20)
        x_spec, n_spec, w1_spec, vh, w2_spec, vc = _specs(rb, tp, c_dim,
                                                          h_dim)
        nprog = b // rb
        pw1 = pl.BlockSpec((1, c_dim, h_dim), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
        pw2 = pl.BlockSpec((1, h_dim, c_dim), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
        pvh = pl.BlockSpec((1, 1, h_dim), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
        pvc = pl.BlockSpec((1, 1, c_dim), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
        kernel = functools.partial(_fm_bwd_kernel, ms=ms, cdt=cdt)
        f32 = jnp.float32
        out = pl.pallas_call(
            kernel,
            grid=(nprog,),
            in_specs=[n_spec, x_spec, w1_spec, vh, vh, w2_spec, vc,
                      x_spec, x_spec],
            out_specs=(x_spec, pw1, pvh, pvh, pw2, pvc),
            out_shape=(jax.ShapeDtypeStruct((b, tp, c_dim), x.dtype),
                       jax.ShapeDtypeStruct((nprog, c_dim, h_dim), f32),
                       jax.ShapeDtypeStruct((nprog, 1, h_dim), f32),
                       jax.ShapeDtypeStruct((nprog, 1, h_dim), f32),
                       jax.ShapeDtypeStruct((nprog, h_dim, c_dim), f32),
                       jax.ShapeDtypeStruct((nprog, 1, c_dim), f32)),
            scratch_shapes=[pltpu.VMEM((ms, rb, tp, c_dim), cdt)],
            cost_estimate=pl.CostEstimate(
                flops=12 * ms * b * tp * c_dim * h_dim,
                bytes_accessed=4 * 4 * b * tp * c_dim,
                transcendentals=0,
            ),
            interpret=interpret,
        )(n3, x_p, w1, a[None, None], c[None, None], w2, b2[None, None],
          gx_p, gv_p)
        return (out[0][:, :t],) + out[1:]

    arg_specs = ((3, 0), (3, 0), (2, None), (1, None), (1, None), (2, None),
                 (1, None), (3, 0), (3, 0))
    out_specs = ((3, 0), (3, 0), (3, 0), (3, 0), (3, 0), (3, 0))
    return batch_partitioned(fun, arg_specs, out_specs, tuple_out=True)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def _fm_core(x, n3, w1, a, c, w2, b2, ms, cdt_name, interpret):
    return _fm_fwd_partitioned(ms, cdt_name, interpret)(x, n3, w1, a, c,
                                                        w2, b2)


def _fm_core_fwd(x, n3, w1, a, c, w2, b2, ms, cdt_name, interpret):
    out = _fm_fwd_partitioned(ms, cdt_name, interpret)(x, n3, w1, a, c,
                                                       w2, b2)
    return out, (x, n3, w1, a, c, w2, b2)


def _fm_core_bwd(ms, cdt_name, interpret, res, g):
    x, n3, w1, a, c, w2, b2 = res
    gx, gv = g
    dx, dw1_p, da_p, dc_p, dw2_p, db2_p = _fm_bwd_partitioned(
        ms, cdt_name, interpret)(x, n3, w1, a, c, w2, b2, gx, gv)
    sm = lambda z, ref: jnp.sum(z, axis=0).astype(ref.dtype)
    sv = lambda z, ref: jnp.sum(z, axis=0)[0].astype(ref.dtype)
    return (dx.astype(x.dtype), np.zeros(n3.shape, jax.dtypes.float0),
            sm(dw1_p, w1), sv(da_p, a), sv(dc_p, c), sm(dw2_p, w2),
            sv(db2_p, b2))


_fm_core.defvjp(_fm_core_fwd, _fm_core_bwd)


def fused_fm_euler(
    x0: jnp.ndarray,            # (rows, T, C) student features
    steps: jnp.ndarray,         # (rows,) int32 per-row Euler step counts
    w1x: jnp.ndarray,           # (C, H) fc1 kernel rows for x
    avec: jnp.ndarray,          # (H,)  We @ W1t  (time-embed fold)
    cvec: jnp.ndarray,          # (H,)  be @ W1t + b1
    w2: jnp.ndarray,            # (H, C) fc2 kernel
    b2: jnp.ndarray,            # (C,)
    *,
    max_steps: int,
    compute_dtype=jnp.float32,
    interpret: bool = False,
):
    """Returns (x_final, last_velocity), both (rows, T, C) in x0.dtype.

    Iteration j (0-based) runs with t = (N-j)/N and is active while j < N,
    N = steps[row]; last_velocity is the j == N-1 velocity — the masked-scan
    semantics of kd/flow_matching.py exactly (reference asr_train.py:1320).
    """
    cdt = jnp.dtype(compute_dtype)
    n3 = jnp.maximum(steps.astype(jnp.float32), 1.0)[:, None, None]
    f32 = jnp.float32
    return _fm_core(x0, n3, w1x.astype(cdt), avec.astype(f32),
                    cvec.astype(f32), w2.astype(cdt), b2.astype(f32),
                    int(max_steps), cdt.name, bool(interpret))
