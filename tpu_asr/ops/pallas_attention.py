"""Fused relative-position attention as Pallas TPU kernels (fwd + bwd).

Replaces the XLA attention's HBM-bound intermediates: per (batch, head-group)
program, the content scores, the (T, 2T) position scores, the rel-shift,
masking, softmax, dropout and the value contraction all stay in VMEM — the
(B, H, T, T) score and (B, H, T, 2T-1) position tensors (the encoder's
largest intermediates) never touch HBM, in either direction. Reference
semantics: NeMo RelPositionMultiHeadAttention (SURVEY.md N6; cuDNN attention
per §2.3).

The Transformer-XL rel-shift needs a per-row shift y[t, s] = qp[t, s+T-1-t],
whose classic pad/reshape trick requires an odd (2T-1) lane width Mosaic
cannot relayout. Implemented instead as a LOG-STEP BUTTERFLY of uniform
`pltpu.roll`s: decompose the per-row left-shift amount (T-1-t) in binary; for
each bit k roll the whole tile by k and keep the rolled rows where the bit is
set. log2(T) roll+select passes over a VMEM-resident tile, exact to the bit
(verified against models/conformer.rel_shift in tests/test_pallas_attention).
The backward pass applies the REVERSE butterfly (right-rolls) to scatter
dscores back onto the (T, 2T) position grid.

Training support: attention-probability dropout runs IN-KERNEL from the Mosaic
hardware PRNG — the mask is regenerated bit-identically in the backward kernel
from the same per-program seed, so the (B, H, T, T) mask never exists in HBM
(the XLA path's mask generation + traffic was ~30% of the train step before
the rbg-PRNG change; here it is free).
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


def _butterfly_left(y, t):
    """y[..., t_row, s] <- y[..., t_row, s + (t-1-t_row)] over a 2t lane axis."""
    amt = t - 1 - jax.lax.broadcasted_iota(jnp.int32, (1, t, 1), 1)
    kbit = 1
    while kbit < t:
        rolled = pltpu.roll(y, shift=2 * t - kbit, axis=2)   # left-roll kbit
        y = jnp.where((amt & kbit) != 0, rolled, y)
        kbit *= 2
    return y


def _butterfly_right(y, t):
    """Transpose of _butterfly_left: y[..., t_row, j] <- y[..., t_row, j-(t-1-t_row)].

    With the nonzero payload confined to the first t lanes, right-rolling by
    at most t-1 never wraps (j + amt <= 2t-1), so the circular roll equals the
    zero-fill shift the math needs."""
    amt = t - 1 - jax.lax.broadcasted_iota(jnp.int32, (1, t, 1), 1)
    kbit = 1
    while kbit < t:
        rolled = pltpu.roll(y, shift=kbit, axis=2)           # right-roll kbit
        y = jnp.where((amt & kbit) != 0, rolled, y)
        kbit *= 2
    return y


def _local_mask(t, left, right):
    rel = (jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
           - jax.lax.broadcasted_iota(jnp.int32, (t, t), 0))   # s - t
    ok = jnp.ones((t, t), jnp.bool_)
    if left >= 0:
        ok &= rel >= -left
    if right >= 0:
        ok &= rel <= right
    return ok


def _recompute_attn(qu, qv, kk, pp, bias, *, t, dk_real, left, right):
    """Scores -> softmax, shared by fwd and bwd kernels. All VMEM-resident.
    Returns attn, fp32 (hpp, t, t)."""
    bdn = (((2,), (2,)), ((0,), (0,)))             # contract dk, batch heads
    ac = jax.lax.dot_general(qu, kk, bdn, preferred_element_type=jnp.float32)
    qp2 = jax.lax.dot_general(qv, pp, bdn, preferred_element_type=jnp.float32)
    bd = _butterfly_left(qp2, t)[:, :, :t]
    scores = (ac + bd) * (1.0 / math.sqrt(dk_real))
    scores = scores + bias
    if left >= 0 or right >= 0:
        scores = jnp.where(_local_mask(t, left, right)[None], scores, -1e30)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _dropout_mask(seed, shape, rate, interpret=False):
    """Deterministic keep-mask from the Mosaic hardware PRNG; identical bits
    are regenerated in the backward kernel from the same seed.

    Interpret mode (CPU tests) lacks the prng_* primitives; a counter-based
    murmur3-finalizer hash stands in — same determinism property, so the
    fwd/bwd mask-consistency contract is exercised on CPU too."""
    if not interpret:
        pltpu.prng_seed(seed)
        bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    else:
        idx = jnp.zeros(shape, jnp.uint32)
        stride = 1
        for d in reversed(range(len(shape))):
            idx = idx + jax.lax.broadcasted_iota(
                jnp.uint32, shape, d) * jnp.uint32(stride)
            stride *= shape[d]
        x = idx * jnp.uint32(2654435761) + seed.astype(jnp.uint32) * \
            jnp.uint32(0x9E3779B9)
        x = x ^ (x >> 16)
        x = x * jnp.uint32(0x85EBCA6B)
        x = x ^ (x >> 13)
        x = x * jnp.uint32(0xC2B2AE35)
        bits = x ^ (x >> 16)
    thresh = np.uint32(min(int(rate * 4294967296.0), 4294967295))
    return bits >= thresh


def _attn_fwd_kernel(seed_ref, qu_ref, qv_ref, k_ref, v_ref, p_ref, bias_ref,
                     o_ref, *, t, dk_real, left, right, hpp, rate,
                     interpret=False):
    """One program handles `hpp` heads (batched matmuls) — a per-(b,h) grid
    is program-overhead bound at ASR sizes (measured on v5e)."""
    # bf16 MXU operands with fp32 accumulation (matches the XLA path's
    # precision: einsum(..., preferred_element_type=f32) over bf16 inputs)
    qu = qu_ref[0].astype(jnp.bfloat16)            # (hpp, T, dkp)
    qv = qv_ref[0].astype(jnp.bfloat16)
    kk = k_ref[0].astype(jnp.bfloat16)
    vv = v_ref[0].astype(jnp.bfloat16)
    pp = p_ref[:].astype(jnp.bfloat16)             # (hpp, 2T, dkp)

    attn = _recompute_attn(qu, qv, kk, pp, bias_ref[0],
                           t=t, dk_real=dk_real, left=left, right=right)
    if rate > 0.0:
        prog = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)
        keep = _dropout_mask(seed_ref[0, 0] + prog, attn.shape, rate,
                             interpret)
        attn = jnp.where(keep, attn * (1.0 / (1.0 - rate)), 0.0)

    adn = (((2,), (1,)), ((0,), (0,)))             # attn (h,t,s) @ v (h,s,d)
    out = jax.lax.dot_general(attn.astype(jnp.bfloat16), vv, adn,
                              preferred_element_type=jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


def _attn_bwd_kernel(seed_ref, qu_ref, qv_ref, k_ref, v_ref, p_ref, bias_ref,
                     g_ref, dqu_ref, dqv_ref, dk_ref, dv_ref, dp_ref, *,
                     t, dk_real, left, right, hpp, rate, n_hgroups,
                     interpret=False):
    """Flash-style backward: recompute attn in VMEM, then all five grads.

    Grid is (n_hgroups, batch) — batch INNERMOST so the dp accumulator block
    (index depends only on the head-group) stays resident across the batch
    sweep and can be accumulated in-place."""
    qu = qu_ref[0].astype(jnp.bfloat16)
    qv = qv_ref[0].astype(jnp.bfloat16)
    kk = k_ref[0].astype(jnp.bfloat16)
    vv = v_ref[0].astype(jnp.bfloat16)
    pp = p_ref[:].astype(jnp.bfloat16)
    g = g_ref[0].astype(jnp.bfloat16)              # (hpp, T, dkp)

    attn = _recompute_attn(qu, qv, kk, pp, bias_ref[0],
                           t=t, dk_real=dk_real, left=left, right=right)
    if rate > 0.0:
        # same per-program seed as the forward: grid here is (j, i) while the
        # forward's is (i, j) — recover the forward's linear program index
        prog = pl.program_id(1) * pl.num_programs(0) + pl.program_id(0)
        keep = _dropout_mask(seed_ref[0, 0] + prog, attn.shape, rate,
                             interpret)
        attn_d = jnp.where(keep, attn * (1.0 / (1.0 - rate)), 0.0)
    else:
        attn_d = attn

    a16 = attn_d.astype(jnp.bfloat16)
    # dv[h,s,d] = sum_t attn_d[h,t,s] g[h,t,d]
    tdn = (((1,), (1,)), ((0,), (0,)))             # contract t
    dv = jax.lax.dot_general(a16, g, tdn, preferred_element_type=jnp.float32)
    # dattn_d[h,t,s] = sum_d g[h,t,d] v[h,s,d]
    ddn = (((2,), (2,)), ((0,), (0,)))             # contract dk
    dattn = jax.lax.dot_general(g, vv, ddn, preferred_element_type=jnp.float32)
    if rate > 0.0:
        dattn = jnp.where(keep, dattn * (1.0 / (1.0 - rate)), 0.0)
    # softmax VJP: ds = attn * (dattn - sum_s dattn*attn)
    ds = attn * (dattn - jnp.sum(dattn * attn, axis=-1, keepdims=True))
    ds = ds * (1.0 / math.sqrt(dk_real))
    # padded/masked keys have attn == 0 -> ds == 0: no explicit re-masking
    ds16 = ds.astype(jnp.bfloat16)

    sdn = (((2,), (1,)), ((0,), (0,)))             # ds (h,t,s) @ k (h,s,d)
    dqu_ref[0] = jax.lax.dot_general(
        ds16, kk, sdn, preferred_element_type=jnp.float32).astype(dqu_ref.dtype)
    # dk[h,s,d] = sum_t ds[h,t,s] qu[h,t,d]
    dk_ref[0] = jax.lax.dot_general(
        ds16, qu, tdn, preferred_element_type=jnp.float32).astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)

    # position-score grads: scatter ds back onto the (T, 2T) grid
    dqp2 = jnp.pad(ds, ((0, 0), (0, 0), (0, t)))   # (hpp, T, 2T)
    dqp2 = _butterfly_right(dqp2, t)
    dqp16 = dqp2.astype(jnp.bfloat16)
    # dqv[h,t,d] = sum_j dqp2[h,t,j] p[h,j,d]
    jdn = (((2,), (1,)), ((0,), (0,)))
    dqv_ref[0] = jax.lax.dot_general(
        dqp16, pp, jdn, preferred_element_type=jnp.float32).astype(dqv_ref.dtype)
    # dp[h,j,d] = sum_b sum_t dqp2[h,t,j] qv[h,t,d] — accumulate over batch
    dp_cur = jax.lax.dot_general(
        dqp16, qv, tdn, preferred_element_type=jnp.float32)

    @pl.when(pl.program_id(1) == 0)
    def _():
        dp_ref[:] = dp_cur.astype(dp_ref.dtype)

    @pl.when(pl.program_id(1) != 0)
    def _():
        dp_ref[:] = dp_ref[:] + dp_cur.astype(dp_ref.dtype)


def _pick_hpp(h, tp, dkp, n_bufs_tt, n_bufs_t2t):
    """Heads per program, bounded by a ~10 MB VMEM working-set budget."""
    hpp = h
    while hpp > 1 and hpp * (n_bufs_t2t * tp * 2 * tp +
                             n_bufs_tt * tp * tp +
                             6 * tp * dkp) * 4 > 10 * 2 ** 20:
        hpp //= 2
    while h % hpp:
        hpp -= 1
    return hpp


def _pad_operands(q_u, q_v, k, v, p, key_bias):
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
    return q_u_p, q_v_p, k_p, v_p, p_p, bias, tp, dkp


def _pallas_attention(q_u, q_v, k, v, p, key_bias, seed, att_context_size,
                      dropout_rate, interpret):
    b, h, t, dk = q_u.shape
    q_u_p, q_v_p, k_p, v_p, p_p, bias, tp, dkp = _pad_operands(
        q_u, q_v, k, v, p, key_bias)
    hpp = _pick_hpp(h, tp, dkp, n_bufs_tt=1, n_bufs_t2t=2)
    n_hgroups = h // hpp

    kernel = functools.partial(_attn_fwd_kernel, t=tp, dk_real=dk,
                               left=att_context_size[0],
                               right=att_context_size[1], hpp=hpp,
                               rate=dropout_rate, interpret=interpret)
    qkv_spec = pl.BlockSpec((1, hpp, tp, dkp), lambda i, j: (i, j, 0, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(b, n_hgroups),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
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
    )(seed, q_u_p, q_v_p, k_p, v_p, p_p, bias)
    return out[:, :, :t, :dk]


def _pallas_attention_bwd(q_u, q_v, k, v, p, key_bias, seed, g,
                          att_context_size, dropout_rate, interpret):
    b, h, t, dk = q_u.shape
    q_u_p, q_v_p, k_p, v_p, p_p, bias, tp, dkp = _pad_operands(
        q_u, q_v, k, v, p, key_bias)
    g_p = jnp.pad(g.astype(jnp.float32),
                  ((0, 0), (0, 0), (0, tp - t), (0, dkp - dk)))
    hpp = _pick_hpp(h, tp, dkp, n_bufs_tt=3, n_bufs_t2t=3)
    n_hgroups = h // hpp

    kernel = functools.partial(_attn_bwd_kernel, t=tp, dk_real=dk,
                               left=att_context_size[0],
                               right=att_context_size[1], hpp=hpp,
                               rate=dropout_rate, n_hgroups=n_hgroups,
                               interpret=interpret)
    # batch INNERMOST (grid = (hgroup, batch)) so dp accumulates in-place
    qkv_spec = pl.BlockSpec((1, hpp, tp, dkp), lambda j, i: (i, j, 0, 0),
                            memory_space=pltpu.VMEM)
    dqkv_spec = pl.BlockSpec((1, hpp, tp, dkp), lambda j, i: (i, j, 0, 0),
                             memory_space=pltpu.VMEM)
    d_shape = jax.ShapeDtypeStruct((b, h, tp, dkp), jnp.float32)
    dq_u, dq_v, dk_, dv, dp = pl.pallas_call(
        kernel,
        grid=(n_hgroups, b),
        in_specs=[
            pl.BlockSpec((1, 1), lambda j, i: (0, 0),
                         memory_space=pltpu.SMEM),
            qkv_spec, qkv_spec, qkv_spec, qkv_spec,
            pl.BlockSpec((hpp, 2 * tp, dkp), lambda j, i: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, tp), lambda j, i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            qkv_spec,
        ],
        out_specs=(dqkv_spec, dqkv_spec, dqkv_spec, dqkv_spec,
                   pl.BlockSpec((hpp, 2 * tp, dkp), lambda j, i: (j, 0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(d_shape, d_shape, d_shape, d_shape,
                   jax.ShapeDtypeStruct((h, 2 * tp, dkp), jnp.float32)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * tp * dkp * (tp * 4 + 2 * tp * 3),
            bytes_accessed=4 * b * h * tp * dkp * 10,
            transcendentals=b * h * tp * tp,
        ),
        interpret=interpret,
    )(seed, q_u_p, q_v_p, k_p, v_p, p_p, bias, g_p)

    crop = lambda x: x[:, :, :t, :dk]
    # un-center dp back to the (2t-1, h, dk) layout of the projected pos input
    dp = jnp.transpose(dp, (1, 0, 2))[tp - t: tp + t - 1, :, :dk]
    return crop(dq_u), crop(dq_v), crop(dk_), crop(dv), dp


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def _fused_attention_core(q_u, q_v, k, v, p, key_bias, seed,
                          att_context_size, dropout_rate, interpret):
    return _pallas_attention(q_u, q_v, k, v, p, key_bias, seed,
                             att_context_size, dropout_rate, interpret)


def _core_fwd(q_u, q_v, k, v, p, key_bias, seed, att_context_size,
              dropout_rate, interpret):
    out = _pallas_attention(q_u, q_v, k, v, p, key_bias, seed,
                            att_context_size, dropout_rate, interpret)
    return out, (q_u, q_v, k, v, p, key_bias, seed)


def _core_bwd(att_context_size, dropout_rate, interpret, res, g):
    q_u, q_v, k, v, p, key_bias, seed = res
    dq_u, dq_v, dk_, dv, dp = _pallas_attention_bwd(
        q_u, q_v, k, v, p, key_bias, seed, g, att_context_size,
        dropout_rate, interpret)
    return (dq_u.astype(q_u.dtype), dq_v.astype(q_v.dtype),
            dk_.astype(k.dtype), dv.astype(v.dtype), dp.astype(p.dtype),
            jnp.zeros_like(key_bias),
            np.zeros(seed.shape, jax.dtypes.float0))


_fused_attention_core.defvjp(_core_fwd, _core_bwd)


def fused_relpos_attention(
    q_u: jnp.ndarray,            # (B, H, T, dk)  q + pos_bias_u
    q_v: jnp.ndarray,            # (B, H, T, dk)  q + pos_bias_v
    k: jnp.ndarray,              # (B, H, T, dk)
    v: jnp.ndarray,              # (B, H, T, dk)
    p: jnp.ndarray,              # (2T-1, H, dk)  projected rel pos embeddings
    mask: jnp.ndarray,           # (B, T) bool, True = valid key
    att_context_size: Tuple[int, int] = (-1, -1),
    dropout_rate: float = 0.0,
    dropout_seed: Optional[jnp.ndarray] = None,   # int32, any shape; scalar used
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns (B, H, T, dk) context, fp32. Pads T to a lane multiple and dk
    to 128 internally; padded keys are masked, padded query rows are garbage
    (callers re-mask padded positions, as the conformer layer does).

    dropout_rate > 0 applies attention-probability dropout with the in-kernel
    PRNG (requires dropout_seed); gradients flow through a fused Pallas
    backward kernel that regenerates the identical mask."""
    key_bias = jnp.where(mask, 0.0, -1e30).astype(jnp.float32)
    if dropout_seed is None:
        seed = jnp.zeros((1, 1), jnp.int32)
    else:
        seed = jnp.reshape(dropout_seed.astype(jnp.int32), (-1,))[:1]
        seed = jnp.reshape(seed, (1, 1))
    return _fused_attention_core(q_u, q_v, k, v, p, key_bias, seed,
                                 tuple(att_context_size), float(dropout_rate),
                                 interpret)
