"""Fused relative-position attention as Pallas TPU kernels (fwd + bwd).

Replaces the XLA attention's HBM-bound intermediates: per (batch, head-group)
program, the content scores, the position scores, masking, softmax, dropout
and the value contraction all stay in VMEM — the (B, H, T, T) score tensor
(the encoder's largest intermediate) never touches HBM, in either direction.
Reference semantics: NeMo RelPositionMultiHeadAttention (SURVEY.md N6; cuDNN
attention per §2.3).

THE REL-SHIFT IS GONE — replaced by a rotation factorization. The
Transformer-XL position score is bd[t, s] = <qW[t], PE[t-s]> with
qW = (q + pos_bias_v) @ linear_pos_kernel and PE the (non-learned) relative
sinusoid table (models/conformer.rel_positional_encoding). The angle-addition
identities sin((t-s)w) = sin(tw)cos(sw) - cos(tw)sin(sw) and
cos((t-s)w) = cos(tw)cos(sw) + sin(tw)sin(sw) factor this exactly into

    bd = [A(t) | B(t)] @ [cos(s w) | sin(s w)]^T
    A_i(t) =  a_i sin(t w_i) + b_i cos(t w_i)      (a, b = even/odd qW pairs)
    B_i(t) =  b_i sin(t w_i) - a_i cos(t w_i)

i.e. ONE standard (T, D) x (D, T) matmul against a PRECOMPUTED constant key
table — no (T, 2T) position tensor, no per-row shift. The previous
implementation's log-step butterfly of `pltpu.roll`s (and its reverse in the
backward) measured 43% of the forward and 53% of the fwd+bwd kernel time at
B=32 x T=376; this removes it entirely and halves the position-matmul width
(2T -> T). Exact to fp32 rounding vs. rel_shift (parity-tested).

Training support: attention-probability dropout runs IN-KERNEL from the
Mosaic hardware PRNG — the mask is regenerated bit-identically in the
backward kernel from the same per-program seed, so the (B, H, T, T) mask
never exists in HBM. The backward recomputes attention flash-style in VMEM
and emits all input grads; the position-key table is a constant with no
gradient, and the linear_pos kernel / q_v grads flow through the plain-JAX
rotation outside the custom_vjp boundary.
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


def position_tables(t: int, d_model: int):
    """(sin_t, cos_t, kpos): sin/cos(t w_i) tables (t, d/2) for the query-side
    rotation, and the constant position-key table kpos = [cos | sin] (t, d).
    Frequencies match rel_positional_encoding (w_i = 10000^(-2i/d))."""
    i = np.arange(0, d_model, 2, dtype=np.float32)
    omega = np.exp(-i * (math.log(10000.0) / d_model))     # (d/2,)
    idx = np.arange(t, dtype=np.float32)[:, None]
    sin_t = np.sin(idx * omega)
    cos_t = np.cos(idx * omega)
    kpos = np.concatenate([cos_t, sin_t], axis=1)          # (t, d)
    return jnp.asarray(sin_t), jnp.asarray(cos_t), jnp.asarray(kpos)


def rotate_pos_query(qw: jnp.ndarray, sin_t: jnp.ndarray,
                     cos_t: jnp.ndarray) -> jnp.ndarray:
    """qw: (..., T, D) position-projected queries -> (..., T, D) rotated
    [A | B] layout matching position_tables' [cos | sin] key table."""
    a = qw[..., 0::2]
    b = qw[..., 1::2]
    aa = a * sin_t + b * cos_t
    bb = b * sin_t - a * cos_t
    return jnp.concatenate([aa, bb], axis=-1)


def _local_mask(t, left, right):
    rel = (jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
           - jax.lax.broadcasted_iota(jnp.int32, (t, t), 0))   # s - t
    ok = jnp.ones((t, t), jnp.bool_)
    if left >= 0:
        ok &= rel >= -left
    if right >= 0:
        ok &= rel <= right
    return ok


def _recompute_attn(qu, qr, kk, kpos, bias, *, t, dk_real, left, right):
    """Scores -> softmax, shared by fwd and bwd kernels. All VMEM-resident.
    Returns fp32 (hpp, t, t) attention."""
    bdn = (((2,), (2,)), ((0,), (0,)))             # contract dk, batch heads
    ac = jax.lax.dot_general(qu, kk, bdn, preferred_element_type=jnp.float32)
    # position scores: one (t, D) x (D, t) matmul vs the constant key table
    pdn = (((2,), (1,)), ((), ()))
    bd = jax.lax.dot_general(qr, kpos, pdn, preferred_element_type=jnp.float32)
    scores = (ac + bd) * (1.0 / math.sqrt(dk_real))
    scores = scores + bias
    if left >= 0 or right >= 0:
        scores = jnp.where(_local_mask(t, left, right)[None], scores, -1e30)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _dropout_keep(seed_base, hpp, shape2d, rate, interpret=False):
    """(hpp, t, t) keep-mask, one PRNG stream PER GLOBAL HEAD.

    `seed_base` is the seed of this program's first head; head l uses
    seed_base + l. Keying the stream on (batch-row seed, global head) — never
    on program ids — makes the bits invariant to the head-group size (fwd and
    bwd may pick different hpp) and to batch sharding under GSPMD
    (parallel/kernel_sharding.py contract). The backward regenerates
    identical bits from the same residual seeds.

    Interpret mode (CPU tests) lacks the prng_* primitives; a counter-based
    murmur3-finalizer hash stands in — same determinism property, so the
    fwd/bwd mask-consistency contract is exercised on CPU too."""
    thresh = np.uint32(min(int(rate * 4294967296.0), 4294967295))
    keeps = []
    for l in range(hpp):
        s = seed_base + l
        if not interpret:
            pltpu.prng_seed(s)
            bits = pltpu.bitcast(pltpu.prng_random_bits(shape2d), jnp.uint32)
        else:
            idx = (jax.lax.broadcasted_iota(jnp.uint32, shape2d, 0)
                   * jnp.uint32(shape2d[1])
                   + jax.lax.broadcasted_iota(jnp.uint32, shape2d, 1))
            x = idx * jnp.uint32(2654435761) + s.astype(jnp.uint32) * \
                jnp.uint32(0x9E3779B9)
            x = x ^ (x >> 16)
            x = x * jnp.uint32(0x85EBCA6B)
            x = x ^ (x >> 13)
            x = x * jnp.uint32(0xC2B2AE35)
            bits = x ^ (x >> 16)
        keeps.append(bits >= thresh)
    return jnp.stack(keeps)


def _attn_fwd_kernel(seed_ref, qu_ref, qr_ref, k_ref, v_ref, kpos_ref,
                     bias_ref, o_ref, *, t, dk_real, left, right, hpp, rate,
                     interpret=False):
    """One program handles `hpp` heads (batched matmuls) — a per-(b,h) grid
    is program-overhead bound at ASR sizes (measured on v5e)."""
    # bf16 MXU operands with fp32 accumulation (matches the XLA path's
    # precision: einsum(..., preferred_element_type=f32) over bf16 inputs)
    qu = qu_ref[0].astype(jnp.bfloat16)            # (hpp, T, dkp)
    qr = qr_ref[0].astype(jnp.bfloat16)            # (hpp, T, Dp)
    kk = k_ref[0].astype(jnp.bfloat16)
    vv = v_ref[0].astype(jnp.bfloat16)
    kpos = kpos_ref[:].astype(jnp.bfloat16)        # (T, Dp)

    attn = _recompute_attn(qu, qr, kk, kpos, bias_ref[0],
                           t=t, dk_real=dk_real, left=left, right=right)
    if rate > 0.0:
        seed_base = seed_ref[pl.program_id(0), pl.program_id(1) * hpp]
        keep = _dropout_keep(seed_base, hpp, (t, t), rate, interpret)
        attn = jnp.where(keep, attn * (1.0 / (1.0 - rate)), 0.0)

    adn = (((2,), (1,)), ((0,), (0,)))             # attn (h,t,s) @ v (h,s,d)
    out = jax.lax.dot_general(attn.astype(jnp.bfloat16), vv, adn,
                              preferred_element_type=jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


def _attn_bwd_kernel(seed_ref, qu_ref, qr_ref, k_ref, v_ref, kpos_ref,
                     bias_ref, g_ref, dqu_ref, dqr_ref, dk_ref, dv_ref, *,
                     t, dk_real, left, right, hpp, rate, interpret=False):
    """Flash-style backward: recompute attn in VMEM, then all four grads.
    No cross-program accumulation — the position-key table is a constant."""
    qu = qu_ref[0].astype(jnp.bfloat16)
    qr = qr_ref[0].astype(jnp.bfloat16)
    kk = k_ref[0].astype(jnp.bfloat16)
    vv = v_ref[0].astype(jnp.bfloat16)
    kpos = kpos_ref[:].astype(jnp.bfloat16)
    g = g_ref[0].astype(jnp.bfloat16)              # (hpp, T, dkp)

    attn = _recompute_attn(qu, qr, kk, kpos, bias_ref[0],
                           t=t, dk_real=dk_real, left=left, right=right)
    if rate > 0.0:
        seed_base = seed_ref[pl.program_id(0), pl.program_id(1) * hpp]
        keep = _dropout_keep(seed_base, hpp, (t, t), rate, interpret)
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
    # dqr[h,t,D] = sum_s ds[h,t,s] kpos[s,D]
    qdn = (((2,), (0,)), ((), ()))
    dqr_ref[0] = jax.lax.dot_general(
        ds16, kpos, qdn, preferred_element_type=jnp.float32).astype(dqr_ref.dtype)
    # dk[h,s,d] = sum_t ds[h,t,s] qu[h,t,d]
    dk_ref[0] = jax.lax.dot_general(
        ds16, qu, tdn, preferred_element_type=jnp.float32).astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _pick_hpp(h, tp, dp, dkp, n_tt, n_tdk, n_tdp):
    """Heads per program, bounded by a ~10 MB VMEM working-set budget."""
    hpp = h
    while hpp > 1 and hpp * (n_tt * tp * tp + n_tdk * tp * dkp +
                             n_tdp * tp * dp) * 4 > 10 * 2 ** 20:
        hpp //= 2
    while h % hpp:
        hpp -= 1
    return hpp


def _pad_operands(q_u, q_r, k, v, kpos, key_bias):
    b, h, t, dk = q_u.shape
    d = q_r.shape[-1]
    tp = _round_up(t, LANE)
    dkp = _round_up(dk, LANE)
    dp = _round_up(d, LANE)

    pad_qkv = lambda x: jnp.pad(x, ((0, 0), (0, 0), (0, tp - t),
                                    (0, dkp - dk)))
    q_u_p, k_p, v_p = (pad_qkv(x) for x in (q_u, k, v))
    q_r_p = jnp.pad(q_r, ((0, 0), (0, 0), (0, tp - t), (0, dp - d)))
    kpos_p = jnp.pad(kpos, ((0, tp - t), (0, dp - d)))
    bias = jnp.pad(key_bias, ((0, 0), (0, tp - t)), constant_values=-1e30)
    bias = bias[:, None, None, :]                  # (B, 1, 1, tp)
    return q_u_p, q_r_p, k_p, v_p, kpos_p, bias, tp, dkp, dp


def _pallas_attention(q_u, q_r, k, v, kpos, key_bias, seed_rows,
                      att_context_size, dropout_rate, interpret):
    b, h, t, dk = q_u.shape
    q_u_p, q_r_p, k_p, v_p, kpos_p, bias, tp, dkp, dp = _pad_operands(
        q_u, q_r, k, v, kpos, key_bias)
    hpp = _pick_hpp(h, tp, dp, dkp, n_tt=2, n_tdk=4, n_tdp=1)
    n_hgroups = h // hpp

    kernel = functools.partial(_attn_fwd_kernel, t=tp, dk_real=dk,
                               left=att_context_size[0],
                               right=att_context_size[1], hpp=hpp,
                               rate=dropout_rate, interpret=interpret)
    qkv_spec = pl.BlockSpec((1, hpp, tp, dkp), lambda i, j: (i, j, 0, 0),
                            memory_space=pltpu.VMEM)
    qr_spec = pl.BlockSpec((1, hpp, tp, dp), lambda i, j: (i, j, 0, 0),
                           memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(b, n_hgroups),
        in_specs=[
            # whole (b, h) seed matrix in SMEM (Mosaic: block == array
            # dims); the kernel indexes (batch row, first head of its block)
            pl.BlockSpec((b, h), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            qkv_spec, qr_spec, qkv_spec, qkv_spec,
            pl.BlockSpec((tp, dp), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, tp), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hpp, tp, dkp), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        # context in the input dtype (bf16 on the compute path): the caller
        # casts to the compute dtype anyway, so an fp32 round trip through
        # HBM would be pure traffic
        out_shape=jax.ShapeDtypeStruct((b, h, tp, dkp), q_u.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * tp * (tp * dkp * 2 + tp * dp),
            bytes_accessed=4 * b * h * tp * (dkp * 5 + dp),
            transcendentals=b * h * tp * tp,
        ),
        interpret=interpret,
    )(seed_rows, q_u_p, q_r_p, k_p, v_p, kpos_p, bias)
    return out[:, :, :t, :dk]


# GSPMD partition rules (parallel/kernel_sharding.py): batch dim 0 ('b')
# AND head dim 1 ('h') stay sharded — heads are independent grid programs,
# so dp x tp meshes run the kernel on (local batch, local heads) blocks.
# Order: q_u, q_r, k, v, kpos (replicated), key_bias (B,T), seeds (B,H).
_BHXX = ("b", "h", None, None)
_ATTN_FWD_ARGS = (_BHXX, _BHXX, _BHXX, _BHXX, (None, None), ("b", None),
                  ("b", "h"))
_ATTN_BWD_ARGS = _ATTN_FWD_ARGS + (_BHXX,)


@functools.lru_cache(maxsize=None)
def _fwd_partitioned(att_context_size, dropout_rate, interpret):
    from tpu_asr.parallel.kernel_sharding import factor_partitioned

    def fun(q_u, q_r, k, v, kpos, key_bias, seed_rows):
        return _pallas_attention(q_u, q_r, k, v, kpos, key_bias, seed_rows,
                                 att_context_size, dropout_rate, interpret)

    return factor_partitioned(fun, _ATTN_FWD_ARGS, (_BHXX,),
                              tuple_out=False)


@functools.lru_cache(maxsize=None)
def _bwd_partitioned(att_context_size, dropout_rate, interpret):
    from tpu_asr.parallel.kernel_sharding import factor_partitioned

    def fun(q_u, q_r, k, v, kpos, key_bias, seed_rows, g):
        return _pallas_attention_bwd(q_u, q_r, k, v, kpos, key_bias,
                                     seed_rows, g, att_context_size,
                                     dropout_rate, interpret)

    return factor_partitioned(fun, _ATTN_BWD_ARGS,
                              (_BHXX, _BHXX, _BHXX, _BHXX), tuple_out=True)


def _pallas_attention_bwd(q_u, q_r, k, v, kpos, key_bias, seed, g,
                          att_context_size, dropout_rate, interpret):
    b, h, t, dk = q_u.shape
    d = q_r.shape[-1]
    q_u_p, q_r_p, k_p, v_p, kpos_p, bias, tp, dkp, dp = _pad_operands(
        q_u, q_r, k, v, kpos, key_bias)
    g_p = jnp.pad(g.astype(q_u.dtype),
                  ((0, 0), (0, 0), (0, tp - t), (0, dkp - dk)))
    hpp = _pick_hpp(h, tp, dp, dkp, n_tt=3, n_tdk=7, n_tdp=2)
    n_hgroups = h // hpp

    kernel = functools.partial(_attn_bwd_kernel, t=tp, dk_real=dk,
                               left=att_context_size[0],
                               right=att_context_size[1], hpp=hpp,
                               rate=dropout_rate, interpret=interpret)
    qkv_spec = pl.BlockSpec((1, hpp, tp, dkp), lambda i, j: (i, j, 0, 0),
                            memory_space=pltpu.VMEM)
    qr_spec = pl.BlockSpec((1, hpp, tp, dp), lambda i, j: (i, j, 0, 0),
                           memory_space=pltpu.VMEM)
    # grads in the residual dtype (bf16 on the compute path): the custom VJP
    # casts them to the input dtypes anyway — fp32 here is pure HBM traffic
    d_shape = jax.ShapeDtypeStruct((b, h, tp, dkp), q_u.dtype)
    dq_u, dq_r, dk_, dv = pl.pallas_call(
        kernel,
        grid=(b, n_hgroups),
        in_specs=[
            # whole (b, h) seed matrix in SMEM (Mosaic: block == array
            # dims); the kernel indexes (batch row, first head of its block)
            pl.BlockSpec((b, h), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            qkv_spec, qr_spec, qkv_spec, qkv_spec,
            pl.BlockSpec((tp, dp), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, tp), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            qkv_spec,
        ],
        out_specs=(qkv_spec, qr_spec, qkv_spec, qkv_spec),
        out_shape=(d_shape,
                   jax.ShapeDtypeStruct((b, h, tp, dp), q_r.dtype),
                   d_shape, d_shape),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * tp * (tp * dkp * 5 + tp * dp * 2),
            bytes_accessed=4 * b * h * tp * (dkp * 8 + dp * 2),
            transcendentals=b * h * tp * tp,
        ),
        interpret=interpret,
    )(seed, q_u_p, q_r_p, k_p, v_p, kpos_p, bias, g_p)

    crop = lambda x: x[:, :, :t, :dk]
    return crop(dq_u), dq_r[:, :, :t, :d], crop(dk_), crop(dv)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def _fused_attention_core(q_u, q_r, k, v, kpos, key_bias, seed_rows,
                          att_context_size, dropout_rate, interpret):
    return _fwd_partitioned(att_context_size, dropout_rate, interpret)(
        q_u, q_r, k, v, kpos, key_bias, seed_rows)


def _core_fwd(q_u, q_r, k, v, kpos, key_bias, seed_rows, att_context_size,
              dropout_rate, interpret):
    out = _fwd_partitioned(att_context_size, dropout_rate, interpret)(
        q_u, q_r, k, v, kpos, key_bias, seed_rows)
    return out, (q_u, q_r, k, v, kpos, key_bias, seed_rows)


def _core_bwd(att_context_size, dropout_rate, interpret, res, g):
    q_u, q_r, k, v, kpos, key_bias, seed_rows = res
    dq_u, dq_r, dk_, dv = _bwd_partitioned(
        att_context_size, dropout_rate, interpret)(
        q_u, q_r, k, v, kpos, key_bias, seed_rows, g)
    return (dq_u.astype(q_u.dtype), dq_r.astype(q_r.dtype),
            dk_.astype(k.dtype), dv.astype(v.dtype),
            jnp.zeros_like(kpos), jnp.zeros_like(key_bias),
            np.zeros(seed_rows.shape, jax.dtypes.float0))


_fused_attention_core.defvjp(_core_fwd, _core_bwd)


def fused_relpos_attention(
    q_u: jnp.ndarray,            # (B, H, T, dk)  q + pos_bias_u
    q_v: jnp.ndarray,            # (B, H, T, dk)  q + pos_bias_v
    k: jnp.ndarray,              # (B, H, T, dk)
    v: jnp.ndarray,              # (B, H, T, dk)
    pos_kernel: jnp.ndarray,     # (D, H, dk)  linear_pos weight, per head
    mask: jnp.ndarray,           # (B, T) bool, True = valid key
    att_context_size: Tuple[int, int] = (-1, -1),
    dropout_rate: float = 0.0,
    dropout_seed: Optional[jnp.ndarray] = None,   # int32, any shape; scalar used
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns (B, H, T, dk) context in the input dtype (bf16 on the compute
    path; accumulation is fp32 in-kernel). Pads T/dk/D to lane multiples
    internally; padded keys are masked, padded query rows are garbage
    (callers re-mask padded positions, as the conformer layer does).

    The position scores use the rotation factorization (module docstring):
    q_v is projected by `pos_kernel` (the linear_pos weight reshaped per
    head), rotated by the per-frame angle tables, and contracted against the
    constant [cos | sin] key table inside the kernel. Gradients to q_v and
    pos_kernel flow through this plain-JAX projection; the kernel's custom
    VJP supplies d(rotated query).

    dropout_rate > 0 applies attention-probability dropout with the in-kernel
    PRNG (requires dropout_seed); the backward kernel regenerates the
    identical mask."""
    b, h, t, dk = q_u.shape
    d_model = pos_kernel.shape[0]
    sin_t, cos_t, kpos = position_tables(t, d_model)
    # qW[b,h,t,D] = sum_dk q_v[b,h,t,dk] pos_kernel[D,h,dk], then rotate
    qw = jnp.einsum("bhtd,Dhd->bhtD", q_v, pos_kernel.astype(q_v.dtype),
                    preferred_element_type=jnp.float32)
    q_r = rotate_pos_query(qw.astype(jnp.float32), sin_t, cos_t)
    q_r = q_r.astype(q_v.dtype)

    key_bias = jnp.where(mask, 0.0, -1e30).astype(jnp.float32)
    # per-(batch-row, head) seeds: seeds[b, l] = base + b*H + l. Carrying the
    # GLOBAL stream id as data (sharded along batch AND heads) makes dropout
    # bits invariant to head-group size, batch sharding, and head sharding
    # (kernel_sharding.py contract) — a program-id-derived head offset would
    # renumber under tp.
    if dropout_seed is None:
        seed_rows = jnp.zeros((b, h), jnp.int32)
    else:
        base = jnp.reshape(dropout_seed.astype(jnp.int32), (-1,))[0]
        seed_rows = (base + jnp.arange(b, dtype=jnp.int32)[:, None] * h
                     + jnp.arange(h, dtype=jnp.int32)[None, :])
    return _fused_attention_core(q_u, q_r, k, v, kpos.astype(q_v.dtype),
                                 key_bias, seed_rows,
                                 tuple(att_context_size),
                                 float(dropout_rate), interpret)
