"""Fused relative-position attention as a Pallas TPU kernel.

Replaces the XLA attention's HBM-bound intermediates for INFERENCE: per
(batch, head) program, the content scores, the (T, 2T) position scores, the
rel-shift, masking, softmax, and the value contraction all stay in VMEM — the
(B, H, T, T) score and (B, H, T, 2T-1) position tensors (the encoder's
largest intermediates) never touch HBM. Reference semantics: NeMo
RelPositionMultiHeadAttention (SURVEY.md N6; cuDNN attention per §2.3).

The Transformer-XL rel-shift needs a per-row shift y[t, s] = qp[t, s+T-1-t],
whose classic pad/reshape trick requires an odd (2T-1) lane width Mosaic
cannot relayout. Implemented instead as a LOG-STEP BUTTERFLY of uniform
`pltpu.roll`s: decompose the per-row left-shift amount (T-1-t) in binary; for
each bit k roll the whole tile by k and keep the rolled rows where the bit is
set. log2(T) roll+select passes over a VMEM-resident tile, exact to the bit
(verified against models/conformer.rel_shift in tests/test_pallas_attention).

Differentiation: the kernel carries a `jax.custom_vjp` whose backward is the
VJP of the numerically-identical XLA attention math — forward runs at kernel
speed, gradients (e.g. when the frozen teacher sits on a linearized path, or
if a caller differentiates through an eval forward) are exact.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _attn_kernel(qu_ref, qv_ref, k_ref, v_ref, p_ref, bias_ref, o_ref, *,
                 t: int, dk_real: int, left: int, right: int, hpp: int):
    """One program handles `hpp` heads (batched matmuls) — a per-(b,h) grid
    is program-overhead bound at ASR sizes (measured on v5e)."""
    # bf16 MXU operands with fp32 accumulation (matches the XLA path's
    # precision: einsum(..., preferred_element_type=f32) over bf16 inputs)
    qu = qu_ref[0].astype(jnp.bfloat16)            # (hpp, T, dkp)
    qv = qv_ref[0].astype(jnp.bfloat16)
    kk = k_ref[0].astype(jnp.bfloat16)
    vv = v_ref[0].astype(jnp.bfloat16)
    pp = p_ref[:].astype(jnp.bfloat16)             # (hpp, 2T, dkp)

    bdn = (((2,), (2,)), ((0,), (0,)))             # contract dk, batch heads
    ac = jax.lax.dot_general(qu, kk, bdn, preferred_element_type=jnp.float32)
    qp2 = jax.lax.dot_general(qv, pp, bdn, preferred_element_type=jnp.float32)
    # butterfly rel-shift: y[h, t, s] = qp2[h, t, s + T-1-t] — fp32
    # (Mosaic's rotate supports only 32-bit element types)
    amt = t - 1 - jax.lax.broadcasted_iota(jnp.int32, (1, t, 1), 1)
    y = qp2
    kbit = 1
    while kbit < t:
        rolled = pltpu.roll(y, shift=2 * t - kbit, axis=2)   # left-roll kbit
        y = jnp.where((amt & kbit) != 0, rolled, y)
        kbit *= 2
    bd = y[:, :, :t]

    scores = (ac + bd) * (1.0 / math.sqrt(dk_real))
    scores = scores + bias_ref[0]    # (1, 1, tp) broadcasts over heads/rows
    if left >= 0 or right >= 0:
        rel = (jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
               - jax.lax.broadcasted_iota(jnp.int32, (t, t), 0))   # s - t
        ok = jnp.ones((t, t), jnp.bool_)
        if left >= 0:
            ok &= rel >= -left
        if right >= 0:
            ok &= rel <= right
        scores = jnp.where(ok[None], scores, -1e30)

    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    attn = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(jnp.bfloat16)
    adn = (((2,), (1,)), ((0,), (0,)))             # attn (h,t,s) @ v (h,s,d)
    out = jax.lax.dot_general(attn, vv, adn,
                              preferred_element_type=jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


def _xla_attention_math(q_u, q_v, k, v, p, key_bias, att_context_size):
    """Reference math (fp32) — used for the custom-VJP backward."""
    b, h, t, dk = q_u.shape
    f32 = jnp.float32
    ac = jnp.einsum("bhtd,bhsd->bhts", q_u.astype(f32), k.astype(f32))
    bd = jnp.einsum("bhtd,phd->bhtp", q_v.astype(f32), p.astype(f32))
    # rel_shift (same as models/conformer.rel_shift, inlined to avoid cycle)
    pcols = bd.shape[-1]
    bd = jnp.pad(bd, ((0, 0), (0, 0), (0, 0), (1, 0)))
    bd = bd.reshape(b, h, pcols + 1, t)[:, :, 1:, :].reshape(b, h, t, pcols)
    bd = bd[..., :t]
    scores = (ac + bd) / math.sqrt(dk) + key_bias[:, None, None, :]
    left, right = att_context_size
    if left >= 0 or right >= 0:
        rel = jnp.arange(t)[None, :] - jnp.arange(t)[:, None]
        ok = jnp.ones((t, t), bool)
        if left >= 0:
            ok = ok & (rel >= -left)
        if right >= 0:
            ok = ok & (rel <= right)
        scores = jnp.where(ok[None, None], scores, -1e30)
    attn = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhts,bhsd->bhtd", attn, v.astype(f32))


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _fused_attention_core(q_u, q_v, k, v, p, key_bias, att_context_size,
                          interpret):
    return _pallas_attention(q_u, q_v, k, v, p, key_bias, att_context_size,
                             interpret)


def _core_fwd(q_u, q_v, k, v, p, key_bias, att_context_size, interpret):
    out = _pallas_attention(q_u, q_v, k, v, p, key_bias, att_context_size,
                            interpret)
    return out, (q_u, q_v, k, v, p, key_bias)


def _core_bwd(att_context_size, interpret, res, g):
    q_u, q_v, k, v, p, key_bias = res
    _, vjp = jax.vjp(
        lambda a, b, c, d, e: _xla_attention_math(a, b, c, d, e, key_bias,
                                                  att_context_size),
        q_u, q_v, k, v, p)
    dq_u, dq_v, dk_, dv, dp = vjp(g.astype(jnp.float32))
    return (dq_u.astype(q_u.dtype), dq_v.astype(q_v.dtype),
            dk_.astype(k.dtype), dv.astype(v.dtype), dp.astype(p.dtype),
            jnp.zeros_like(key_bias))


_fused_attention_core.defvjp(_core_fwd, _core_bwd)


def fused_relpos_attention(
    q_u: jnp.ndarray,            # (B, H, T, dk)  q + pos_bias_u
    q_v: jnp.ndarray,            # (B, H, T, dk)  q + pos_bias_v
    k: jnp.ndarray,              # (B, H, T, dk)
    v: jnp.ndarray,              # (B, H, T, dk)
    p: jnp.ndarray,              # (2T-1, H, dk)  projected rel pos embeddings
    mask: jnp.ndarray,           # (B, T) bool, True = valid key
    att_context_size: Tuple[int, int] = (-1, -1),
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns (B, H, T, dk) context, fp32. Pads T to a lane multiple and dk
    to 128 internally; padded keys are masked, padded query rows are garbage
    (callers re-mask padded positions, as the conformer layer does)."""
    key_bias = jnp.where(mask, 0.0, -1e30).astype(jnp.float32)
    return _fused_attention_core(q_u, q_v, k, v, p, key_bias,
                                 tuple(att_context_size), interpret)


def _pallas_attention(q_u, q_v, k, v, p, key_bias, att_context_size,
                      interpret):
    b, h, t, dk = q_u.shape
    tp = _round_up(t, LANE)
    dkp = _round_up(dk, LANE)

    def pad_qkv(x):
        return jnp.pad(x, ((0, 0), (0, 0), (0, tp - t), (0, dkp - dk)))

    q_u_p, q_v_p, k_p, v_p = (pad_qkv(x) for x in (q_u, q_v, k, v))
    # p rows i cover rel = t-1-i; re-center into 2*tp rows (rel = tp-1-j)
    p_p = jnp.zeros((2 * tp, h, dkp), p.dtype)
    p_p = jax.lax.dynamic_update_slice(
        p_p, jnp.pad(p, ((0, 0), (0, 0), (0, dkp - dk))), (tp - t, 0, 0))
    p_p = jnp.transpose(p_p, (1, 0, 2))            # (H, 2tp, dkp)

    bias = jnp.pad(key_bias, ((0, 0), (0, tp - t)), constant_values=-1e30)
    bias = bias[:, None, None, :]                  # (B, 1, 1, tp)

    # heads per program: fewer, fatter programs amortize per-program overhead;
    # bounded by VMEM (qp2 + its roll double-buffer dominate at ~2*hpp*T*2T*4B)
    hpp = h
    while hpp > 1 and hpp * (2 * tp * dkp * 2 + 3 * tp * 2 * tp) * 4 > 10 * 2 ** 20:
        hpp //= 2
    while h % hpp:
        hpp -= 1
    n_hgroups = h // hpp

    kernel = functools.partial(_attn_kernel, t=tp, dk_real=dk,
                               left=att_context_size[0],
                               right=att_context_size[1], hpp=hpp)
    qkv_spec = pl.BlockSpec((1, hpp, tp, dkp), lambda i, j: (i, j, 0, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(b, n_hgroups),
        in_specs=[
            qkv_spec, qkv_spec, qkv_spec, qkv_spec,
            pl.BlockSpec((hpp, 2 * tp, dkp), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, tp), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hpp, tp, dkp), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, tp, dkp), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * tp * dkp * (tp + 2 * tp + tp),
            bytes_accessed=4 * b * h * tp * dkp * 5,
            transcendentals=b * h * tp * tp,
        ),
        interpret=interpret,
    )(q_u_p, q_v_p, k_p, v_p, p_p, bias)
    return out[:, :, :t, :dk]
