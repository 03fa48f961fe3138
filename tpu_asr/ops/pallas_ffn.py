"""Fused Conformer feed-forward sublayer as one Pallas kernel (fwd + bwd).

out = x + 0.5 * drop2( silu( LN(x) @ W1 + b1 ) |> drop1 @ W2 + b2 )

— the whole half-step FFN sublayer of the Conformer layer (NeMo
ConformerLayer's `norm_feed_forward{1,2}` + `feed_forward{1,2}` + the 0.5
residual; SURVEY.md N6), VMEM-resident per program: the (T, d_ff)
activation never touches HBM and the LN statistics, SiLU, both dropout
masks and the residual ride in the same pass as the two matmuls.

Training support: both dropout masks (inner, on the post-SiLU activation —
NeMo FeedForward's Dropout — and outer, on the sublayer output before the
0.5 residual — ConformerLayer's `0.5 * dropout(h)`) are generated from the
Mosaic hardware PRNG keyed on a PER-BATCH-ROW seed operand; the backward
kernel regenerates them bit-identically, so neither mask exists in HBM.
The flash-style backward recomputes LN/activations in VMEM and emits dx
plus PER-ROW weight/bias grad partials (summed over the batch outside —
the same pattern as the attention kernel's dWev).

LayerNorm matches flax.linen.LayerNorm exactly: fast variance
(E[x^2] - E[x]^2), eps 1e-6, scale+bias. D stays at its LOGICAL size
(Mosaic pads lanes in-register), so feature-axis reductions need no lane
masking.

GSPMD: wrapped with the batch partition rule (parallel/kernel_sharding.py)
so the batch axis stays sharded under a mesh; dropout streams ride in the
(B,) seed operand, making bits invariant to sharding and to the rows-per-
program choice.

Default OFF (`EncoderConfig.ffn_backend='auto'` resolves to the XLA path)
until measured faster on real hardware — the same measured-not-assumed
contract as ops/pallas_features.py and ops/pallas_conv.py.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_asr.ops.pallas_attention import _dropout_keep

EPS = 1e-6


def _ln_fwd(x_ref, s_ref, sb_ref):
    xf = x_ref[:].astype(jnp.float32)                  # (rb, T, D)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu
    r = jax.lax.rsqrt(var + EPS)
    xhat = (xf - mu) * r
    y = xhat * s_ref[:] + sb_ref[:]
    return xf, xhat, r, y


def _row_keeps(seed_ref, i, rb, shape2d, rate, salt, interpret):
    """(rb, *shape2d) keep-masks, one PRNG stream per GLOBAL batch row.
    `salt` separates the inner/outer mask namespaces (streams interleave as
    2*seed[row] + salt); seeds ride in data so bits are invariant to rb and
    to batch sharding (kernel_sharding contract)."""
    keeps = []
    for l in range(rb):
        s = seed_ref[i * rb + l] * 2 + salt
        keeps.append(_dropout_keep(s, 1, shape2d, rate, interpret)[0])
    return jnp.stack(keeps)


def _ffn_kernel(seed_ref, x_ref, s_ref, sb_ref, w1_ref, b1_ref, w2_ref,
                b2_ref, o_ref, *, rate, rb, interpret):
    _, _, _, y = _ln_fwd(x_ref, s_ref, sb_ref)
    dn = (((2,), (0,)), ((), ()))
    h = jax.lax.dot_general(y.astype(jnp.bfloat16),
                            w1_ref[:].astype(jnp.bfloat16), dn,
                            preferred_element_type=jnp.float32)
    h = h + b1_ref[:]
    h = h * jax.nn.sigmoid(h)                          # SiLU
    if rate > 0.0:
        keep1 = _row_keeps(seed_ref, pl.program_id(0), rb, h.shape[1:],
                           rate, 0, interpret)
        h = jnp.where(keep1, h * (1.0 / (1.0 - rate)), 0.0)
    o = jax.lax.dot_general(h.astype(jnp.bfloat16),
                            w2_ref[:].astype(jnp.bfloat16), dn,
                            preferred_element_type=jnp.float32)
    o = o + b2_ref[:]
    if rate > 0.0:
        keep2 = _row_keeps(seed_ref, pl.program_id(0), rb, o.shape[1:],
                           rate, 1, interpret)
        o = jnp.where(keep2, o * (1.0 / (1.0 - rate)), 0.0)
    o_ref[:] = (x_ref[:].astype(jnp.float32) + 0.5 * o).astype(o_ref.dtype)


def _ffn_bwd_kernel(seed_ref, x_ref, s_ref, sb_ref, w1_ref, b1_ref, w2_ref,
                    b2_ref, g_ref, dx_ref, ds_ref, dsb_ref, dw1_ref, db1_ref,
                    dw2_ref, db2_ref, *, rate, rb, interpret):
    """Recompute-everything backward; PER-ROW weight grad partials."""
    xf, xhat, r, y = _ln_fwd(x_ref, s_ref, sb_ref)
    y16 = y.astype(jnp.bfloat16)
    w1_16 = w1_ref[:].astype(jnp.bfloat16)
    w2_16 = w2_ref[:].astype(jnp.bfloat16)
    dn = (((2,), (0,)), ((), ()))
    h1 = jax.lax.dot_general(y16, w1_16, dn,
                             preferred_element_type=jnp.float32) + b1_ref[:]
    sig = jax.nn.sigmoid(h1)
    hs = h1 * sig                                      # silu(h1)
    scale = 1.0 / (1.0 - rate) if rate > 0.0 else 1.0
    if rate > 0.0:
        keep1 = _row_keeps(seed_ref, pl.program_id(0), rb, h1.shape[1:],
                           rate, 0, interpret)
        hd = jnp.where(keep1, hs * scale, 0.0)
    else:
        hd = hs

    g = g_ref[:].astype(jnp.float32)                   # (rb, T, D)
    do = 0.5 * g
    if rate > 0.0:
        keep2 = _row_keeps(seed_ref, pl.program_id(0), rb, g.shape[1:],
                           rate, 1, interpret)
        do = jnp.where(keep2, do * scale, 0.0)
    do16 = do.astype(jnp.bfloat16)
    # dW2[row, F, D] = sum_t hd[row,t,F] do[row,t,D]
    gdn = (((1,), (1,)), ((0,), (0,)))
    dw2_ref[:] = jax.lax.dot_general(hd.astype(jnp.bfloat16), do16, gdn,
                                     preferred_element_type=jnp.float32)
    db2_ref[:] = jnp.sum(do, axis=1, keepdims=True)
    # dh_drop = do @ W2^T
    tdn = (((2,), (1,)), ((), ()))
    dhd = jax.lax.dot_general(do16, w2_16, tdn,
                              preferred_element_type=jnp.float32)
    if rate > 0.0:
        dhd = jnp.where(keep1, dhd * scale, 0.0)
    # silu'(z) = sigmoid(z) * (1 + z * (1 - sigmoid(z)))
    dh1 = dhd * sig * (1.0 + h1 * (1.0 - sig))
    dh1_16 = dh1.astype(jnp.bfloat16)
    dw1_ref[:] = jax.lax.dot_general(y16, dh1_16, gdn,
                                     preferred_element_type=jnp.float32)
    db1_ref[:] = jnp.sum(dh1, axis=1, keepdims=True)
    dy = jax.lax.dot_general(dh1_16, w1_16, tdn,
                             preferred_element_type=jnp.float32)
    ds_ref[:] = jnp.sum(dy * xhat, axis=1, keepdims=True)
    dsb_ref[:] = jnp.sum(dy, axis=1, keepdims=True)
    # LayerNorm backward (fast-variance form)
    dxhat = dy * s_ref[:]
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx_ln = r * (dxhat - m1 - xhat * m2)
    dx_ref[:] = (g + dx_ln).astype(dx_ref.dtype)


def _ffn_int8_kernel(x_ref, s_ref, sb_ref, w1_ref, s1_ref, b1_ref, w2_ref,
                     s2_ref, b2_ref, o_ref):
    """int8 serving forward (ops/quant.py math, fused): LN -> per-token
    int8 quant -> int8 MXU dot -> dequant+bias -> SiLU -> quant -> int8
    dot -> dequant+bias -> 0.5 residual — all VMEM-resident, so the
    per-token scales and the (T, d_ff) intermediate never touch HBM (the
    XLA lowering of the same math loses the int8 rate to exactly that
    traffic; measured notes in the ROADMAP)."""
    _, _, _, y = _ln_fwd(x_ref, s_ref, sb_ref)         # (rb, T, D) fp32
    sx = jnp.maximum(jnp.max(jnp.abs(y), axis=-1, keepdims=True),
                     1e-8 * 127.0) * (1.0 / 127.0)
    yq = jnp.clip(jnp.round(y * (1.0 / sx)), -127, 127).astype(jnp.int8)
    dn = (((2,), (0,)), ((), ()))
    acc = jax.lax.dot_general(yq, w1_ref[:], dn,
                              preferred_element_type=jnp.int32)
    h = acc.astype(jnp.float32) * sx * s1_ref[:] + b1_ref[:]
    h = h * jax.nn.sigmoid(h)                          # SiLU
    sh = jnp.maximum(jnp.max(jnp.abs(h), axis=-1, keepdims=True),
                     1e-8 * 127.0) * (1.0 / 127.0)
    hq = jnp.clip(jnp.round(h * (1.0 / sh)), -127, 127).astype(jnp.int8)
    acc2 = jax.lax.dot_general(hq, w2_ref[:], dn,
                               preferred_element_type=jnp.int32)
    o = acc2.astype(jnp.float32) * sh * s2_ref[:] + b2_ref[:]
    o_ref[:] = (x_ref[:].astype(jnp.float32) + 0.5 * o).astype(o_ref.dtype)


@functools.lru_cache(maxsize=None)
def _ffn_int8_partitioned(interpret):
    from tpu_asr.parallel.kernel_sharding import batch_partitioned

    def fun(x, s, sb, w1q, s1, b1, w2q, s2, b2):
        b, t, d = x.shape
        d_ff = w1q.shape[1]
        tp = (t + 7) // 8 * 8
        x_p = jnp.pad(x, ((0, 0), (0, tp - t), (0, 0)))
        rb = _require_rb(_pick_rb(b, tp, d, d_ff, words=2),
                         "fwd", b, tp, d, d_ff)
        x_spec, vd, vf, m1, m2, _ = _specs(rb, tp, d, d_ff, b)
        out = pl.pallas_call(
            _ffn_int8_kernel,
            grid=(b // rb,),
            in_specs=[x_spec, vd, vd, m1, vf, vf, m2, vd, vd],
            out_specs=x_spec,
            out_shape=jax.ShapeDtypeStruct((b, tp, d), x.dtype),
            cost_estimate=pl.CostEstimate(
                flops=4 * b * tp * d * d_ff,
                bytes_accessed=4 * b * tp * d,
                transcendentals=b * tp * d_ff,
            ),
            interpret=interpret,
        )(x_p, s[None, None], sb[None, None], w1q, s1[None, None],
          b1[None, None], w2q, s2[None, None], b2[None, None])
        return out[:, :t]

    arg_specs = ((3, 0), (1, None), (1, None), (2, None), (1, None),
                 (1, None), (2, None), (1, None), (1, None))
    return batch_partitioned(fun, arg_specs, ((3, 0),), tuple_out=False)


def fused_ffn_sublayer_int8(
    x: jnp.ndarray,              # (B, T, D) sublayer input (pre-LN)
    ln_scale: jnp.ndarray,       # (D,)
    ln_bias: jnp.ndarray,        # (D,)
    w1: jnp.ndarray,             # (D, d_ff) linear1 kernel (float)
    b1: jnp.ndarray,             # (d_ff,)
    w2: jnp.ndarray,             # (d_ff, D) linear2 kernel (float)
    b2: jnp.ndarray,             # (D,)
    interpret: bool = False,
) -> jnp.ndarray:
    """Serving-PTQ forward of the FFN sublayer: x + 0.5 * FFN_int8(LN(x)).
    Weight quantization (per-channel symmetric, ops/quant.py) runs in-graph
    outside the kernel; activations quantize per token IN the kernel.
    Eval-only (no VJP) — training uses the bf16 kernel above."""
    from tpu_asr.ops.quant import quantize_weight
    f32 = jnp.float32
    w1q, s1 = quantize_weight(w1.astype(f32))
    w2q, s2 = quantize_weight(w2.astype(f32))
    return _ffn_int8_partitioned(interpret)(
        x, ln_scale.astype(f32), ln_bias.astype(f32), w1q, s1[0], b1.astype(f32),
        w2q, s2[0], b2.astype(f32))


def _vmem_bytes(rb: int, t: int, d: int, d_ff: int, words: int,
                bwd: bool) -> int:
    """Scoped-VMEM working-set model, calibrated against Mosaic's own
    accounting (it reported 30.8 MB for the bwd program at d512/d_ff2048/
    tp376/rb1; the small-model bwd at d176/d_ff704/tp384/rb2 compiles):
    `words` live fp32 (T, d_ff) intermediates, double-buffered per-row
    weight-grad partials (bwd only), and the weight operands."""
    inter = rb * words * t * d_ff * 4
    grads = 4 * rb * d * d_ff * 4 if bwd else 0   # pw1+pw2 f32, dbl-buffered
    weights = 2 * d * d_ff * 4
    return inter + grads + weights


def _pick_rb(b: int, t: int, d: int, d_ff: int, words: int,
             bwd: bool = False) -> Optional[int]:
    """Largest rows-per-program fitting the ~15 MB scoped-VMEM budget, or
    None when even rb=1 exceeds it (the caller must fall back / raise —
    Mosaic fails at compile otherwise, the conformer-LARGE training cliff)."""
    rb = b
    while rb > 1 and (rb % 2 == 0) and \
            _vmem_bytes(rb, t, d, d_ff, words, bwd) > 15 * 2 ** 20:
        rb //= 2
    while b % rb:
        rb -= 1
    if _vmem_bytes(rb, t, d, d_ff, words, bwd) > 15 * 2 ** 20:
        return None
    return rb


def ffn_train_kernel_fits(b: int, t: int, d: int, d_ff: int) -> bool:
    """True when BOTH the fwd and flash-bwd fused-FFN programs fit scoped
    VMEM at these dims — the EncoderConfig.ffn_backend='auto' gate. At
    production dims (d512/d_ff2048) the bwd's per-row weight-grad partials
    alone exceed the budget, so training falls back to the XLA path there."""
    tp = (t + 7) // 8 * 8
    return (_pick_rb(b, tp, d, d_ff, words=2) is not None
            and _pick_rb(b, tp, d, d_ff, words=4, bwd=True) is not None)


def _require_rb(rb: Optional[int], what: str, b, t, d, d_ff) -> int:
    if rb is None:
        raise ValueError(
            f"fused FFN {what} does not fit scoped VMEM at B={b}, T={t}, "
            f"d={d}, d_ff={d_ff} (even one row per program exceeds the "
            "budget). Use ffn_backend='xla' (or 'auto', which checks "
            "ffn_train_kernel_fits) at these dims.")
    return rb


def _specs(rb, tp, d, d_ff, b):
    x_spec = pl.BlockSpec((rb, tp, d), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    vd = pl.BlockSpec((1, 1, d), lambda i: (0, 0, 0),
                      memory_space=pltpu.VMEM)
    vf = pl.BlockSpec((1, 1, d_ff), lambda i: (0, 0, 0),
                      memory_space=pltpu.VMEM)
    m1 = pl.BlockSpec((d, d_ff), lambda i: (0, 0), memory_space=pltpu.VMEM)
    m2 = pl.BlockSpec((d_ff, d), lambda i: (0, 0), memory_space=pltpu.VMEM)
    seed = pl.BlockSpec((b,), lambda i: (0,), memory_space=pltpu.SMEM)
    return x_spec, vd, vf, m1, m2, seed


@functools.lru_cache(maxsize=None)
def _ffn_fwd_partitioned(rate, interpret):
    from tpu_asr.parallel.kernel_sharding import batch_partitioned

    def fun(x, s, sb, w1, b1, w2, b2, seeds):
        b, t, d = x.shape
        d_ff = w1.shape[1]
        tp = (t + 7) // 8 * 8
        x_p = jnp.pad(x, ((0, 0), (0, tp - t), (0, 0)))
        rb = _require_rb(_pick_rb(b, tp, d, d_ff, words=2),
                         "fwd", b, tp, d, d_ff)
        x_spec, vd, vf, m1, m2, seed = _specs(rb, tp, d, d_ff, b)
        kernel = functools.partial(_ffn_kernel, rate=rate, rb=rb,
                                   interpret=interpret)
        out = pl.pallas_call(
            kernel,
            grid=(b // rb,),
            in_specs=[seed, x_spec, vd, vd, m1, vf, m2, vd],
            out_specs=x_spec,
            out_shape=jax.ShapeDtypeStruct((b, tp, d), x.dtype),
            cost_estimate=pl.CostEstimate(
                flops=4 * b * tp * d * d_ff,
                bytes_accessed=4 * b * tp * d,
                transcendentals=b * tp * d_ff,
            ),
            interpret=interpret,
        )(seeds, x_p, s[None, None], sb[None, None], w1, b1[None, None],
          w2, b2[None, None])
        return out[:, :t]

    # fun(x, s, sb, w1, b1, w2, b2, seeds): vectors are RANK-1 here (the
    # wrapper reshapes to (1, 1, dim) only when feeding the kernel)
    arg_specs = ((3, 0), (1, None), (1, None), (2, None), (1, None),
                 (2, None), (1, None), (1, 0))
    return batch_partitioned(fun, arg_specs, ((3, 0),), tuple_out=False)


@functools.lru_cache(maxsize=None)
def _ffn_bwd_partitioned(rate, interpret):
    from tpu_asr.parallel.kernel_sharding import batch_partitioned

    def fun(x, s, sb, w1, b1, w2, b2, seeds, g):
        b, t, d = x.shape
        d_ff = w1.shape[1]
        tp = (t + 7) // 8 * 8
        pad_t = lambda z: jnp.pad(z, ((0, 0), (0, tp - t), (0, 0)))
        x_p, g_p = pad_t(x), pad_t(g.astype(x.dtype))
        rb = _require_rb(_pick_rb(b, tp, d, d_ff, words=4, bwd=True),
                         "bwd", b, tp, d, d_ff)
        x_spec, vd, vf, m1, m2, seed = _specs(rb, tp, d, d_ff, b)
        kernel = functools.partial(_ffn_bwd_kernel, rate=rate, rb=rb,
                                   interpret=interpret)
        pw1 = pl.BlockSpec((rb, d, d_ff), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
        pw2 = pl.BlockSpec((rb, d_ff, d), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
        # vector partials ride as (B, 1, dim): Mosaic wants the last two
        # block dims 8/128-divisible OR equal to the array dims — (1, dim)
        # blocks of a (B, 1, dim) array satisfy the latter for any rb
        pvd = pl.BlockSpec((rb, 1, d), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
        pvf = pl.BlockSpec((rb, 1, d_ff), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
        f32 = jnp.float32
        out = pl.pallas_call(
            kernel,
            grid=(b // rb,),
            in_specs=[seed, x_spec, vd, vd, m1, vf, m2, vd, x_spec],
            out_specs=(x_spec, pvd, pvd, pw1, pvf, pw2, pvd),
            out_shape=(jax.ShapeDtypeStruct((b, tp, d), x.dtype),
                       jax.ShapeDtypeStruct((b, 1, d), f32),
                       jax.ShapeDtypeStruct((b, 1, d), f32),
                       jax.ShapeDtypeStruct((b, d, d_ff), f32),
                       jax.ShapeDtypeStruct((b, 1, d_ff), f32),
                       jax.ShapeDtypeStruct((b, d_ff, d), f32),
                       jax.ShapeDtypeStruct((b, 1, d), f32)),
            cost_estimate=pl.CostEstimate(
                flops=12 * b * tp * d * d_ff,
                bytes_accessed=8 * b * tp * d + 8 * b * d * d_ff,
                transcendentals=2 * b * tp * d_ff,
            ),
            interpret=interpret,
        )(seeds, x_p, s[None, None], sb[None, None], w1, b1[None, None],
          w2, b2[None, None], g_p)
        dx = out[0][:, :t]
        return (dx,) + out[1:]

    arg_specs = ((3, 0), (1, None), (1, None), (2, None), (1, None),
                 (2, None), (1, None), (1, 0), (3, 0))
    out_specs = ((3, 0), (3, 0), (3, 0), (3, 0), (3, 0), (3, 0), (3, 0))
    return batch_partitioned(fun, arg_specs, out_specs, tuple_out=True)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def _ffn_core(x, s, sb, w1, b1, w2, b2, seeds, rate, interpret):
    return _ffn_fwd_partitioned(rate, interpret)(x, s, sb, w1, b1, w2, b2,
                                                 seeds)


def _ffn_core_fwd(x, s, sb, w1, b1, w2, b2, seeds, rate, interpret):
    out = _ffn_fwd_partitioned(rate, interpret)(x, s, sb, w1, b1, w2, b2,
                                                seeds)
    return out, (x, s, sb, w1, b1, w2, b2, seeds)


def _ffn_core_bwd(rate, interpret, res, g):
    x, s, sb, w1, b1, w2, b2, seeds = res
    dx, ds_b, dsb_b, dw1_b, db1_b, dw2_b, db2_b = _ffn_bwd_partitioned(
        rate, interpret)(x, s, sb, w1, b1, w2, b2, seeds, g)
    sm = lambda z, ref: jnp.sum(z, axis=0).astype(ref.dtype)
    sv = lambda z, ref: jnp.sum(z, axis=0)[0].astype(ref.dtype)
    return (dx.astype(x.dtype), sv(ds_b, s), sv(dsb_b, sb), sm(dw1_b, w1),
            sv(db1_b, b1), sm(dw2_b, w2), sv(db2_b, b2),
            np.zeros(seeds.shape, jax.dtypes.float0))


_ffn_core.defvjp(_ffn_core_fwd, _ffn_core_bwd)


def fused_ffn_sublayer(
    x: jnp.ndarray,              # (B, T, D) sublayer input (pre-LN)
    ln_scale: jnp.ndarray,       # (D,)
    ln_bias: jnp.ndarray,        # (D,)
    w1: jnp.ndarray,             # (D, d_ff) linear1 kernel
    b1: jnp.ndarray,             # (d_ff,)
    w2: jnp.ndarray,             # (d_ff, D) linear2 kernel
    b2: jnp.ndarray,             # (D,)
    dropout_rate: float = 0.0,
    dropout_seed=None,           # int32, any shape; scalar used
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns x + 0.5 * drop(FFN(LN(x))) in x.dtype. dropout_rate > 0
    applies BOTH the inner (post-SiLU) and outer (sublayer-output) dropout
    masks from the in-kernel PRNG (requires dropout_seed); the custom-VJP
    backward regenerates identical masks."""
    b = x.shape[0]
    f32 = jnp.float32
    cdt = x.dtype
    if dropout_seed is None:
        seeds = jnp.zeros((b,), jnp.int32)
    else:
        base = jnp.reshape(dropout_seed.astype(jnp.int32), (-1,))[0]
        seeds = base + jnp.arange(b, dtype=jnp.int32)
    return _ffn_core(x, ln_scale.astype(f32), ln_bias.astype(f32),
                     w1.astype(cdt), b1.astype(f32), w2.astype(cdt),
                     b2.astype(f32), seeds, float(dropout_rate), interpret)
