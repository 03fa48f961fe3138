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

Training uses the XLA path (this kernel defines no VJP); the encoder routes
here only for deterministic forward passes on TPU.
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
                 t: int, dk_real: int, left: int, right: int):
    qu = qu_ref[0, 0].astype(jnp.float32)          # (T, dkp)
    qv = qv_ref[0, 0].astype(jnp.float32)
    kk = k_ref[0, 0].astype(jnp.float32)
    vv = v_ref[0, 0].astype(jnp.float32)
    pp = p_ref[0].astype(jnp.float32)              # (2T, dkp)

    dn = (((1,), (1,)), ((), ()))                  # contract dk
    ac = jax.lax.dot_general(qu, kk, dn, preferred_element_type=jnp.float32)
    qp2 = jax.lax.dot_general(qv, pp, dn, preferred_element_type=jnp.float32)
    # butterfly rel-shift: y[t, s] = qp2[t, s + T-1-t]
    amt = t - 1 - jax.lax.broadcasted_iota(jnp.int32, (t, 1), 0)
    y = qp2
    kbit = 1
    while kbit < t:
        rolled = pltpu.roll(y, shift=2 * t - kbit, axis=1)   # left-roll kbit
        y = jnp.where((amt & kbit) != 0, rolled, y)
        kbit *= 2
    bd = y[:, :t]

    scores = (ac + bd) * (1.0 / math.sqrt(dk_real))
    scores = scores + bias_ref[0]    # (1, tp) broadcasts over rows
    if left >= 0 or right >= 0:
        rel = (jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
               - jax.lax.broadcasted_iota(jnp.int32, (t, t), 0))   # s - t
        ok = jnp.ones((t, t), jnp.bool_)
        if left >= 0:
            ok &= rel >= -left
        if right >= 0:
            ok &= rel <= right
        scores = jnp.where(ok, scores, -1e30)

    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    attn = e / jnp.sum(e, axis=-1, keepdims=True)
    out = jnp.dot(attn, vv, preferred_element_type=jnp.float32)
    o_ref[0, 0] = out.astype(o_ref.dtype)


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

    neg = jnp.float32(-1e30)
    bias = jnp.where(jnp.pad(mask, ((0, 0), (0, tp - t))), 0.0, neg)
    bias = bias[:, None, :]                        # (B, 1, tp): tile-legal block

    kernel = functools.partial(_attn_kernel, t=tp, dk_real=dk,
                               left=att_context_size[0],
                               right=att_context_size[1])
    out = pl.pallas_call(
        kernel,
        grid=(b, h),
        in_specs=[
            pl.BlockSpec((1, 1, tp, dkp), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tp, dkp), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tp, dkp), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tp, dkp), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * tp, dkp), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tp), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, tp, dkp), lambda i, j: (i, j, 0, 0),
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
