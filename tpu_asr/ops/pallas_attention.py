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

    bd = A @ cos(s w)^T + B @ sin(s w)^T
    A_i(t) =  a_i sin(t w_i) + b_i cos(t w_i)      (a, b = even/odd qW pairs)
    B_i(t) =  b_i sin(t w_i) - a_i cos(t w_i)

— standard matmuls against PRECOMPUTED constant tables, no (T, 2T) position
tensor, no per-row shift.

THE WHOLE POSITION CHAIN NOW RUNS IN-KERNEL. The linear_pos projection is a
per-head (dk, D) matmul; splitting its weight into even/odd output columns
(Wev, Wod — STATIC slices, done once in XLA on the tiny (D, D) parameter)
gives a = q_v @ Wev^T, b = q_v @ Wod^T, so A and B are two small VMEM
matmuls plus elementwise rotation. Earlier revisions computed
qW = einsum('bhtd,Dhd->bhtD') + strided-slice rotation in XLA and shipped
the rotated (B, H, T, D) q_r tensor to the kernel; on v5e that einsum
lowers to a grouped convolution with f32 output and the 0::2/1::2 slices
become layout copies — together they scaled SUPERLINEARLY in batch
(B=32 -> 64 tripled the encoder stack time). In-kernel, the projection is
two (T, dk) x (dk, D/2) MXU matmuls per head, the rotation is elementwise
fp32 in VMEM, and the largest shipped operand shrinks from (B, H, T, D) to
nothing — q_v was already an operand.

Training support: attention-probability dropout runs IN-KERNEL from the
Mosaic hardware PRNG — the mask is regenerated bit-identically in the
backward kernel from the same per-program seed, so the (B, H, T, T) mask
never exists in HBM. The backward recomputes attention flash-style in VMEM
and emits all input grads, including per-batch-program partials for the
Wev/Wod weight grads (summed over the batch outside the kernel; gradients
reach the linear_pos parameter through the plain-JAX even/odd slicing
outside the custom_vjp boundary).
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
    Frequencies match rel_positional_encoding (w_i = 10000^(-2i/d)).

    `kpos` is the concatenated form used by the rotation-factorization
    ORACLE (tests/test_pallas_attention.py); the kernel itself consumes the
    sin/cos halves separately."""
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
    [A | B] layout matching position_tables' [cos | sin] key table.
    Oracle form of the in-kernel rotation (kept for the parity tests)."""
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


def _rotated_queries(qv, wev, wod, sin, cos):
    """(A, B) fp32 (hpp, t, Dh): in-kernel linear_pos projection + rotation.
    qv/wev/wod bf16, sin/cos fp32; MXU matmuls accumulate in fp32 and the
    rotation is elementwise fp32 in VMEM."""
    hdn = (((2,), (1,)), ((0,), (0,)))     # (h,t,dk) @ (h,dk,Dh) -> (h,t,Dh)
    u = jax.lax.dot_general(qv, wev, hdn, preferred_element_type=jnp.float32)
    w = jax.lax.dot_general(qv, wod, hdn, preferred_element_type=jnp.float32)
    a = u * sin + w * cos
    b = w * sin - u * cos
    return a, b


def _recompute_attn(qu, qv, kk, wev, wod, sin, cos, bias, *, t, dk_real,
                    left, right):
    """Scores -> softmax, shared by fwd and bwd kernels. All VMEM-resident.
    Returns fp32 (hpp, t, t) attention."""
    bdn = (((2,), (2,)), ((0,), (0,)))             # contract dk, batch heads
    ac = jax.lax.dot_general(qu, kk, bdn, preferred_element_type=jnp.float32)
    # position scores: project + rotate in VMEM, then two (t, Dh) x (Dh, t)
    # matmuls against the constant sin/cos key tables
    a, b = _rotated_queries(qv, wev, wod, sin, cos)
    pdn = (((2,), (1,)), ((), ()))                 # contract Dh vs (s, Dh)
    cos16 = cos.astype(jnp.bfloat16)
    sin16 = sin.astype(jnp.bfloat16)
    bd = jax.lax.dot_general(a.astype(jnp.bfloat16), cos16, pdn,
                             preferred_element_type=jnp.float32)
    bd = bd + jax.lax.dot_general(b.astype(jnp.bfloat16), sin16, pdn,
                                  preferred_element_type=jnp.float32)
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


def _attn_fwd_kernel(seed_ref, qu_ref, qv_ref, k_ref, v_ref, wev_ref, wod_ref,
                     sin_ref, cos_ref, bias_ref, o_ref, *, t, dk_real, left,
                     right, hpp, rate, interpret=False):
    """One program handles `hpp` heads (batched matmuls) — a per-(b,h) grid
    is program-overhead bound at ASR sizes (measured on v5e)."""
    # bf16 MXU operands with fp32 accumulation (matches the XLA path's
    # precision: einsum(..., preferred_element_type=f32) over bf16 inputs)
    qu = qu_ref[0].astype(jnp.bfloat16)            # (hpp, T, dkp)
    qv = qv_ref[0].astype(jnp.bfloat16)            # (hpp, T, dkp)
    kk = k_ref[0].astype(jnp.bfloat16)
    vv = v_ref[0].astype(jnp.bfloat16)
    wev = wev_ref[:].astype(jnp.bfloat16)          # (hpp, dkp, Dh)
    wod = wod_ref[:].astype(jnp.bfloat16)
    sin = sin_ref[:]                               # (T, Dh) fp32
    cos = cos_ref[:]

    attn = _recompute_attn(qu, qv, kk, wev, wod, sin, cos, bias_ref[0],
                           t=t, dk_real=dk_real, left=left, right=right)
    if rate > 0.0:
        seed_base = seed_ref[pl.program_id(0), pl.program_id(1) * hpp]
        keep = _dropout_keep(seed_base, hpp, (t, t), rate, interpret)
        attn = jnp.where(keep, attn * (1.0 / (1.0 - rate)), 0.0)

    adn = (((2,), (1,)), ((0,), (0,)))             # attn (h,t,s) @ v (h,s,d)
    out = jax.lax.dot_general(attn.astype(jnp.bfloat16), vv, adn,
                              preferred_element_type=jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


def _attn_bwd_kernel(seed_ref, qu_ref, qv_ref, k_ref, v_ref, wev_ref, wod_ref,
                     sin_ref, cos_ref, bias_ref, g_ref, dqu_ref, dqv_ref,
                     dk_ref, dv_ref, dwev_ref, dwod_ref, *, t, dk_real, left,
                     right, hpp, rate, interpret=False):
    """Flash-style backward: recompute attn in VMEM, then all input grads.
    Wev/Wod grads are per-batch-program PARTIALS (summed outside the kernel:
    one small (B, H, dkp, Dh) tensor beats cross-program accumulation)."""
    qu = qu_ref[0].astype(jnp.bfloat16)
    qv = qv_ref[0].astype(jnp.bfloat16)
    kk = k_ref[0].astype(jnp.bfloat16)
    vv = v_ref[0].astype(jnp.bfloat16)
    wev = wev_ref[:].astype(jnp.bfloat16)
    wod = wod_ref[:].astype(jnp.bfloat16)
    sin = sin_ref[:]
    cos = cos_ref[:]
    g = g_ref[0].astype(jnp.bfloat16)              # (hpp, T, dkp)

    attn = _recompute_attn(qu, qv, kk, wev, wod, sin, cos, bias_ref[0],
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
    # dk[h,s,d] = sum_t ds[h,t,s] qu[h,t,d]
    dk_ref[0] = jax.lax.dot_general(
        ds16, qu, tdn, preferred_element_type=jnp.float32).astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)

    # position chain: bd = A @ cos^T + B @ sin^T with A = U sin + W cos,
    # B = W sin - U cos, U = qv Wev^T, W = qv Wod^T
    pdn = (((2,), (0,)), ((), ()))                 # ds (h,t,s) @ (s, Dh)
    cos16 = cos.astype(jnp.bfloat16)
    sin16 = sin.astype(jnp.bfloat16)
    da = jax.lax.dot_general(ds16, cos16, pdn,
                             preferred_element_type=jnp.float32)
    db = jax.lax.dot_general(ds16, sin16, pdn,
                             preferred_element_type=jnp.float32)
    du = (da * sin - db * cos).astype(jnp.bfloat16)     # (hpp, t, Dh)
    dw = (da * cos + db * sin).astype(jnp.bfloat16)
    wdn = (((2,), (2,)), ((0,), (0,)))             # contract Dh vs (h,dk,Dh)
    dqv = jax.lax.dot_general(du, wev, wdn, preferred_element_type=jnp.float32)
    dqv = dqv + jax.lax.dot_general(dw, wod, wdn,
                                    preferred_element_type=jnp.float32)
    dqv_ref[0] = dqv.astype(dqv_ref.dtype)
    # dWev[h,d,j] = sum_t qv[h,t,d] dU[h,t,j]  (this program's batch row only)
    gdn = (((1,), (1,)), ((0,), (0,)))             # contract t
    dwev_ref[0] = jax.lax.dot_general(
        qv, du, gdn, preferred_element_type=jnp.float32)
    dwod_ref[0] = jax.lax.dot_general(
        qv, dw, gdn, preferred_element_type=jnp.float32)


def _pick_hpp(h, tp, dkp, dh, n_tt, n_tdk, n_tdh):
    """Heads per program, bounded by a ~20 MB fp32 working-set budget
    (v5e VMEM is 128 MB; Mosaic double-buffers the operand blocks)."""
    hpp = h
    while hpp > 1 and hpp * (n_tt * tp * tp + n_tdk * tp * dkp +
                             n_tdh * tp * dh) * 4 > 20 * 2 ** 20:
        hpp //= 2
    while h % hpp:
        hpp -= 1
    return hpp


def _pad_operands(q_u, q_v, k, v, wev, wod, sin_t, cos_t, key_bias):
    b, h, t, dk = q_u.shape
    half = wev.shape[-1]
    tp = _round_up(t, LANE)
    # dk stays UNPADDED: it appears only as a contraction / output-minor dim,
    # so Mosaic pads it in-register — explicitly padding 44 -> 128 in XLA
    # tripled the q/k/v/out HBM bytes and showed up as pad+copy ops worth
    # ~0.9 ms across the 16-layer scan (B=32 x 15 s trace)
    dkp = dk
    dh = _round_up(half, LANE)

    pad_qkv = lambda x: jnp.pad(x, ((0, 0), (0, 0), (0, tp - t), (0, 0)))
    q_u_p, q_v_p, k_p, v_p = (pad_qkv(x) for x in (q_u, q_v, k, v))
    pad_w = lambda x: jnp.pad(x, ((0, 0), (0, 0), (0, dh - half)))
    wev_p, wod_p = pad_w(wev), pad_w(wod)
    # padded table rows (t >= T) multiply padded (zero) query rows; padded
    # columns (i >= D/2) hit zero weight columns — both contribute exactly 0
    pad_tab = lambda x: jnp.pad(x, ((0, tp - t), (0, dh - half)))
    sin_p, cos_p = pad_tab(sin_t), pad_tab(cos_t)
    bias = jnp.pad(key_bias, ((0, 0), (0, tp - t)), constant_values=-1e30)
    bias = bias[:, None, None, :]                  # (B, 1, 1, tp)
    return (q_u_p, q_v_p, k_p, v_p, wev_p, wod_p, sin_p, cos_p, bias,
            tp, dkp, dh)


def _pallas_attention(q_u, q_v, k, v, wev, wod, sin_t, cos_t, key_bias,
                      seed_rows, att_context_size, dropout_rate, interpret):
    b, h, t, dk = q_u.shape
    (q_u_p, q_v_p, k_p, v_p, wev_p, wod_p, sin_p, cos_p, bias,
     tp, dkp, dh) = _pad_operands(q_u, q_v, k, v, wev, wod, sin_t, cos_t,
                                  key_bias)
    hpp = _pick_hpp(h, tp, dkp, dh, n_tt=2, n_tdk=5, n_tdh=4)
    n_hgroups = h // hpp

    kernel = functools.partial(_attn_fwd_kernel, t=tp, dk_real=dk,
                               left=att_context_size[0],
                               right=att_context_size[1], hpp=hpp,
                               rate=dropout_rate, interpret=interpret)
    qkv_spec = pl.BlockSpec((1, hpp, tp, dkp), lambda i, j: (i, j, 0, 0),
                            memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((hpp, dkp, dh), lambda i, j: (j, 0, 0),
                          memory_space=pltpu.VMEM)
    tab_spec = pl.BlockSpec((tp, dh), lambda i, j: (0, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(b, n_hgroups),
        in_specs=[
            # whole (b, h) seed matrix in SMEM (Mosaic: block == array
            # dims); the kernel indexes (batch row, first head of its block)
            pl.BlockSpec((b, h), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            qkv_spec, qkv_spec, qkv_spec, qkv_spec,
            w_spec, w_spec, tab_spec, tab_spec,
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
            flops=2 * b * h * tp * (tp * dkp * 2 + tp * dh * 2
                                    + dkp * dh * 2),
            bytes_accessed=4 * b * h * tp * dkp * 5,
            transcendentals=b * h * tp * tp,
        ),
        interpret=interpret,
    )(seed_rows, q_u_p, q_v_p, k_p, v_p, wev_p, wod_p, sin_p, cos_p, bias)
    return out[:, :, :t, :dk]


# GSPMD partition rules (parallel/kernel_sharding.py): batch dim 0 ('b')
# AND head dim 1 ('h') stay sharded — heads are independent grid programs,
# so dp x tp meshes run the kernel on (local batch, local heads) blocks.
# Order: q_u, q_v, k, v, wev, wod (head-sharded), sin/cos (replicated),
# key_bias (B,T), seeds (B,H).
_BHXX = ("b", "h", None, None)
_HXX = ("h", None, None)
_TAB = (None, None)
_ATTN_FWD_ARGS = (_BHXX, _BHXX, _BHXX, _BHXX, _HXX, _HXX, _TAB, _TAB,
                  ("b", None), ("b", "h"))
_ATTN_BWD_ARGS = _ATTN_FWD_ARGS + (_BHXX,)
# bwd outs: dq_u, dq_v, dk, dv + per-batch Wev/Wod grad partials
_ATTN_BWD_OUTS = (_BHXX, _BHXX, _BHXX, _BHXX,
                  ("b", "h", None, None), ("b", "h", None, None))


@functools.lru_cache(maxsize=None)
def _fwd_partitioned(att_context_size, dropout_rate, interpret):
    from tpu_asr.parallel.kernel_sharding import factor_partitioned

    def fun(q_u, q_v, k, v, wev, wod, sin_t, cos_t, key_bias, seed_rows):
        return _pallas_attention(q_u, q_v, k, v, wev, wod, sin_t, cos_t,
                                 key_bias, seed_rows, att_context_size,
                                 dropout_rate, interpret)

    return factor_partitioned(fun, _ATTN_FWD_ARGS, (_BHXX,),
                              tuple_out=False)


@functools.lru_cache(maxsize=None)
def _bwd_partitioned(att_context_size, dropout_rate, interpret):
    from tpu_asr.parallel.kernel_sharding import factor_partitioned

    def fun(q_u, q_v, k, v, wev, wod, sin_t, cos_t, key_bias, seed_rows, g):
        return _pallas_attention_bwd(q_u, q_v, k, v, wev, wod, sin_t, cos_t,
                                     key_bias, seed_rows, g,
                                     att_context_size, dropout_rate,
                                     interpret)

    return factor_partitioned(fun, _ATTN_BWD_ARGS, _ATTN_BWD_OUTS,
                              tuple_out=True)


def _pallas_attention_bwd(q_u, q_v, k, v, wev, wod, sin_t, cos_t, key_bias,
                          seed, g, att_context_size, dropout_rate, interpret):
    b, h, t, dk = q_u.shape
    (q_u_p, q_v_p, k_p, v_p, wev_p, wod_p, sin_p, cos_p, bias,
     tp, dkp, dh) = _pad_operands(q_u, q_v, k, v, wev, wod, sin_t, cos_t,
                                  key_bias)
    g_p = jnp.pad(g.astype(q_u.dtype),
                  ((0, 0), (0, 0), (0, tp - t), (0, dkp - dk)))
    hpp = _pick_hpp(h, tp, dkp, dh, n_tt=3, n_tdk=8, n_tdh=6)
    n_hgroups = h // hpp

    kernel = functools.partial(_attn_bwd_kernel, t=tp, dk_real=dk,
                               left=att_context_size[0],
                               right=att_context_size[1], hpp=hpp,
                               rate=dropout_rate, interpret=interpret)
    qkv_spec = pl.BlockSpec((1, hpp, tp, dkp), lambda i, j: (i, j, 0, 0),
                            memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((hpp, dkp, dh), lambda i, j: (j, 0, 0),
                          memory_space=pltpu.VMEM)
    tab_spec = pl.BlockSpec((tp, dh), lambda i, j: (0, 0),
                            memory_space=pltpu.VMEM)
    dw_spec = pl.BlockSpec((1, hpp, dkp, dh), lambda i, j: (i, j, 0, 0),
                           memory_space=pltpu.VMEM)
    # grads in the residual dtype (bf16 on the compute path): the custom VJP
    # casts them to the input dtypes anyway — fp32 here is pure HBM traffic.
    # The Wev/Wod partials stay fp32: they are summed over the batch.
    d_shape = jax.ShapeDtypeStruct((b, h, tp, dkp), q_u.dtype)
    dw_shape = jax.ShapeDtypeStruct((b, h, dkp, dh), jnp.float32)
    dq_u, dq_v, dk_, dv, dwev_b, dwod_b = pl.pallas_call(
        kernel,
        grid=(b, n_hgroups),
        in_specs=[
            # whole (b, h) seed matrix in SMEM (Mosaic: block == array
            # dims); the kernel indexes (batch row, first head of its block)
            pl.BlockSpec((b, h), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            qkv_spec, qkv_spec, qkv_spec, qkv_spec,
            w_spec, w_spec, tab_spec, tab_spec,
            pl.BlockSpec((1, 1, 1, tp), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            qkv_spec,
        ],
        out_specs=(qkv_spec, qkv_spec, qkv_spec, qkv_spec, dw_spec, dw_spec),
        out_shape=(d_shape, d_shape, d_shape, d_shape, dw_shape, dw_shape),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * tp * (tp * dkp * 5 + tp * dh * 4
                                    + dkp * dh * 4),
            bytes_accessed=4 * b * h * tp * dkp * 9,
            transcendentals=b * h * tp * tp,
        ),
        interpret=interpret,
    )(seed, q_u_p, q_v_p, k_p, v_p, wev_p, wod_p, sin_p, cos_p, bias, g_p)

    crop = lambda x: x[:, :, :t, :dk]
    half = wev.shape[-1]
    crop_w = lambda x: x[:, :, :dk, :half]
    return (crop(dq_u), crop(dq_v), crop(dk_), crop(dv),
            crop_w(dwev_b), crop_w(dwod_b))


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12))
def _fused_attention_core(q_u, q_v, k, v, wev, wod, sin_t, cos_t, key_bias,
                          seed_rows, att_context_size, dropout_rate,
                          interpret):
    return _fwd_partitioned(att_context_size, dropout_rate, interpret)(
        q_u, q_v, k, v, wev, wod, sin_t, cos_t, key_bias, seed_rows)


def _core_fwd(q_u, q_v, k, v, wev, wod, sin_t, cos_t, key_bias, seed_rows,
              att_context_size, dropout_rate, interpret):
    out = _fwd_partitioned(att_context_size, dropout_rate, interpret)(
        q_u, q_v, k, v, wev, wod, sin_t, cos_t, key_bias, seed_rows)
    return out, (q_u, q_v, k, v, wev, wod, sin_t, cos_t, key_bias, seed_rows)


def _core_bwd(att_context_size, dropout_rate, interpret, res, g):
    q_u, q_v, k, v, wev, wod, sin_t, cos_t, key_bias, seed_rows = res
    dq_u, dq_v, dk_, dv, dwev_b, dwod_b = _bwd_partitioned(
        att_context_size, dropout_rate, interpret)(
        q_u, q_v, k, v, wev, wod, sin_t, cos_t, key_bias, seed_rows, g)
    # per-batch-row partials -> weight grads (a psum over the 'b' mesh axis
    # under GSPMD; one tiny (B, H, dk, D/2) tensor in fp32)
    dwev = jnp.sum(dwev_b, axis=0).astype(wev.dtype)
    dwod = jnp.sum(dwod_b, axis=0).astype(wod.dtype)
    return (dq_u.astype(q_u.dtype), dq_v.astype(q_v.dtype),
            dk_.astype(k.dtype), dv.astype(v.dtype), dwev, dwod,
            jnp.zeros_like(sin_t), jnp.zeros_like(cos_t),
            jnp.zeros_like(key_bias),
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
    path; accumulation is fp32 in-kernel). Pads T/dk/D internally; padded
    keys are masked, padded query rows are garbage (callers re-mask padded
    positions, as the conformer layer does).

    The position scores run ENTIRELY in-kernel (module docstring): the
    linear_pos weight is split into even/odd output columns (static slices
    of the (D, H, dk) parameter) and shipped per head; projection, rotation
    and the contraction against the constant sin/cos key tables all happen
    in VMEM. Gradients to q_v and pos_kernel flow through the kernel's
    custom VJP (weight grads as per-batch partials summed outside).

    dropout_rate > 0 applies attention-probability dropout with the in-kernel
    PRNG (requires dropout_seed); the backward kernel regenerates the
    identical mask."""
    b, h, t, dk = q_u.shape
    d_model = pos_kernel.shape[0]
    assert d_model % 2 == 0, d_model
    sin_t, cos_t, _ = position_tables(t, d_model)
    # even/odd output columns of linear_pos, per head: (D, H, dk) ->
    # (H, dk, D/2). Static slices of a tiny parameter — autodiff through
    # them reassembles d(pos_kernel) from the kernel's dWev/dWod.
    cdt = q_v.dtype
    wev = jnp.transpose(pos_kernel[0::2], (1, 2, 0)).astype(cdt)
    wod = jnp.transpose(pos_kernel[1::2], (1, 2, 0)).astype(cdt)

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
    return _fused_attention_core(q_u, q_v, k, v, wev, wod, sin_t, cos_t,
                                 key_bias, seed_rows,
                                 tuple(att_context_size),
                                 float(dropout_rate), interpret)


# ---------------------------------------------------------------------------
# Block attention: the ENTIRE attention sublayer in one kernel.
#
# fused_relpos_attention takes per-head q_u/q_v/k/v tensors that XLA must
# first produce (three (D, D) projections + bias adds + head-split
# transposes) and ships 4 x (B, H, T, dk) operands; afterwards XLA
# transposes the context back and applies linear_out. On v5e the
# surrounding ops are BANDWIDTH-bound (the projections lower to grouped
# convolutions, ~0.05 ms/layer; the context transpose is a 0.02 ms/layer
# layout copy — B=32 x 15 s trace). The block kernel consumes the (B, T, D)
# attention INPUT directly: q/k/v projections (+ their biases and the
# rel-pos u/v biases), content + rotated position scores, softmax, dropout,
# the value contraction AND the per-head output projection all run in VMEM.
# Operand traffic per layer drops from 4x(B,H,T,dk) + ctx to x + one
# (B, G, T, D) output partial per head-group (G=1 at ASR sizes), and the q
# projection runs ONCE for q_u/q_v instead of shipping both.
#
# Layout: projections live TRANSPOSED in VMEM — (heads, dk, T) with dk on
# SUBLANES — so the q/k score contraction streams dk through the MXU at
# sublane padding (44 -> 48) where the orientation allows, instead of a
# 128-padded lane dim. The position chain runs in the same transposed
# orientation against transposed sin/cos tables.
# ---------------------------------------------------------------------------


def _project_t(x16, w_ref, bias_ref):
    """x16 (T, D) bf16, w (hpp, D, dk), bias (hpp, dk, 1) fp32 ->
    fp32 (hpp, dk, T) transposed projection (+ bias broadcast over T)."""
    w16 = w_ref[:].astype(jnp.bfloat16)
    dn = (((1,), (1,)), ((), ()))            # (h,D,dk) x (T,D) -> (h,dk,T)
    p = jax.lax.dot_general(w16, x16, dn, preferred_element_type=jnp.float32)
    return p + bias_ref[:]


def _block_scores(x16, wq_ref, wk_ref, wv_ref, cu_ref, cv_ref, bk_ref,
                  bv_ref, wev_ref, wod_ref, sint_ref, cost_ref, cos_ref,
                  sin_ref, bias, *, t, dk_real, left, right, seg=None,
                  score_bf16=False):
    """Shared by fwd and bwd: projections + scores + softmax in VMEM.
    Returns (attn (hpp,T,S), qT, q_uT, q_vT, kT, vT (hpp,dk,T) fp32).

    `seg` (packed-segment serving): (segq (t, 1), segk (1, t)) fp32 segment
    maps of this batch row; query t attends key s iff seg[t] == seg[s] — two
    VMEM broadcasts + a compare, no (t, t) operand ships from HBM.

    `score_bf16` (flag-gated, VERDICT r4 next #2): the (T, T) score/softmax
    tiles live in bf16 — MXU accumulation stays fp32 internally and the
    softmax denominator accumulates fp32 (dtype= on the reduce); only tile
    STORAGE rounds to bf16 (~2^-8 relative on attention weights). Halves
    the dominant per-program working set, so hpp/bpp can double."""
    # Mosaic requires 32-bit matmul ACCUMULATORS (preferred_element_type=
    # bf16 fails verification: 'tpu.matmul op Expected matmul acc to be
    # 32-bit'), so the dots always produce fp32; score_bf16 downcasts the
    # combined score tile for STORAGE, halving e/attn and the softmax chain
    sdt = jnp.bfloat16 if score_bf16 else jnp.float32
    qt = _project_t(x16, wq_ref, cu_ref)               # carries bq + bias_u
    q_vt = qt - cu_ref[:] + cv_ref[:]                  # swap to bq + bias_v
    kt = _project_t(x16, wk_ref, bk_ref)
    vt = _project_t(x16, wv_ref, bv_ref)

    qu16, qv16, k16 = (a.astype(jnp.bfloat16) for a in (qt, q_vt, kt))
    # content scores: contract dk (sublanes), batch heads
    cdn = (((1,), (1,)), ((0,), (0,)))
    ac = jax.lax.dot_general(qu16, k16, cdn,
                             preferred_element_type=jnp.float32)
    # position scores, transposed rotation: u/w (hpp, Dh, T)
    wdn = (((1,), (1,)), ((0,), (0,)))       # (h,dk,Dh) x (h,dk,T)
    wev16 = wev_ref[:].astype(jnp.bfloat16)
    wod16 = wod_ref[:].astype(jnp.bfloat16)
    u = jax.lax.dot_general(wev16, qv16, wdn,
                            preferred_element_type=jnp.float32)
    w = jax.lax.dot_general(wod16, qv16, wdn,
                            preferred_element_type=jnp.float32)
    sint = sint_ref[:].astype(jnp.float32)   # (Dh, T) bf16 table, VPU fp32
    cost = cost_ref[:].astype(jnp.float32)
    a = (u * sint + w * cost).astype(jnp.bfloat16)
    bmat = (w * sint - u * cost).astype(jnp.bfloat16)
    # bd[h,t,s] = sum_j a[h,j,t] cos_s[s,j] + b[h,j,t] sin_s[s,j]
    pdn = (((1,), (1,)), ((), ()))           # (h,Dh,T) x (S,Dh) -> (h,T,S)
    bd = jax.lax.dot_general(a, cos_ref[:].astype(jnp.bfloat16), pdn,
                             preferred_element_type=jnp.float32)
    bd = bd + jax.lax.dot_general(bmat, sin_ref[:].astype(jnp.bfloat16), pdn,
                                  preferred_element_type=jnp.float32)
    # -1e30 is representable in bf16 (same exponent range as fp32)
    scores = ((ac + bd) * (1.0 / math.sqrt(dk_real))
              + bias).astype(sdt)
    if left >= 0 or right >= 0:
        scores = jnp.where(_local_mask(t, left, right)[None], scores,
                           sdt(-1e30))
    if seg is not None:
        segq, segk = seg
        same = (jnp.broadcast_to(segq, (t, t))
                == jnp.broadcast_to(segk, (t, t)))
        scores = jnp.where(same[None], scores, sdt(-1e30))
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    if score_bf16:
        # fp32-accumulated denominator ((hpp, T, 1) — no (T, T) fp32 tile)
        denom = jnp.sum(e, axis=-1, keepdims=True, dtype=jnp.float32)
        attn = e * (1.0 / denom).astype(sdt)
    else:
        # keep the EXACT original expression: the reciprocal-multiply form
        # nudged Mosaic's buffer allocation +1.36 MB at conformer-XLarge
        # dims (d1024/h8/T384) and pushed the fwd over the 16 MB scoped-
        # VMEM limit (round-5 bench regression)
        attn = e / jnp.sum(e, axis=-1, keepdims=True)
    return attn, qt, q_vt, kt, vt


def _block_fwd_kernel(seed_ref, x_ref, wq_ref, wk_ref, wv_ref, cu_ref,
                      cv_ref, bk_ref, bv_ref, wev_ref, wod_ref, sin_ref,
                      cos_ref, sint_ref, cost_ref, bias_ref, wo_ref, *rest,
                      t, dk_real, left, right, hpp, bpp, rate,
                      with_seg=False, score_bf16=False, interpret=False):
    if with_seg:
        segq_ref, segk_ref, o_ref = rest
    else:
        (o_ref,) = rest
    wo16 = wo_ref[:].astype(jnp.bfloat16)              # (hpp, dk, D)
    # bpp batch rows per program (static unroll): identical math per row,
    # amortizes the per-program fixed cost that bounds the small models
    for r in range(bpp):
        seg = (segq_ref[r], segk_ref[r]) if with_seg else None
        x16 = x_ref[r].astype(jnp.bfloat16)            # (T, D)
        attn, _, _, _, vt = _block_scores(
            x16, wq_ref, wk_ref, wv_ref, cu_ref, cv_ref, bk_ref, bv_ref,
            wev_ref, wod_ref, sint_ref, cost_ref, cos_ref, sin_ref,
            bias_ref[r], t=t, dk_real=dk_real, left=left, right=right,
            seg=seg, score_bf16=score_bf16)
        if rate > 0.0:
            seed_base = seed_ref[pl.program_id(1) * bpp + r,
                                 pl.program_id(0) * hpp]
            keep = _dropout_keep(seed_base, hpp, (t, t), rate, interpret)
            attn = jnp.where(keep, attn * (1.0 / (1.0 - rate)), 0.0)

        # ctx[h,t,d] = sum_s attn[h,t,s] v[h,d,s]
        a16 = attn.astype(jnp.bfloat16)
        v16 = vt.astype(jnp.bfloat16)
        adn = (((2,), (2,)), ((0,), (0,)))
        ctx = jax.lax.dot_general(a16, v16, adn,
                                  preferred_element_type=jnp.float32)
        # per-head output projection, accumulated over this program's heads
        ctx16 = ctx.astype(jnp.bfloat16)
        mdn = (((1,), (0,)), ((), ()))
        out = jax.lax.dot_general(ctx16[0], wo16[0], mdn,
                                  preferred_element_type=jnp.float32)
        for l in range(1, hpp):
            out = out + jax.lax.dot_general(ctx16[l], wo16[l], mdn,
                                            preferred_element_type=jnp.float32)
        # grid is (head_groups, batch) with batch INNERMOST: the weight
        # blocks (index map on dim 0 only) stay VMEM-resident across the
        # whole batch sweep instead of being refetched per program. Each
        # program writes its head group's (T, D) output-projection partials;
        # the caller sums over the (usually 1) head-group axis.
        o_ref[0, r] = out.astype(o_ref.dtype)


def _block_bwd_kernel(seed_ref, x_ref, wq_ref, wk_ref, wv_ref, cu_ref,
                      cv_ref, bk_ref, bv_ref, wev_ref, wod_ref, sin_ref,
                      cos_ref, sint_ref, cost_ref, bias_ref, wo_ref, g_ref,
                      *rest, t, dk_real, left, right, hpp, bpp, rate,
                      with_seg=False, score_bf16=False, interpret=False):
    """Flash-style backward: recompute projections + attention in VMEM.
    Grid is (head_groups, batch) with batch INNERMOST: weight/bias grads
    accumulate IN PLACE into their VMEM-resident block across the batch
    sweep (block index constant over the inner dim — grid-sequential
    accumulation), so only the final (h, dk, ·) sums ever reach HBM instead
    of per-(batch, head) partials (~168 MB/layer at conformer-LARGE). dx is
    emitted as a per-head-group partial, summed by the caller. `bpp` batch
    rows run per program (static unroll, grads summed across rows) to
    amortize the per-program fixed cost that bounds the small models.

    `with_seg` recomputes the packed-segment attention mask in the backward
    (packed-segment TRAINING): masked entries have attn == 0 -> ds == 0, so
    no extra masking of the grads is needed."""
    if with_seg:
        (segq_ref, segk_ref, dx_ref, dwq_ref, dwk_ref, dwv_ref, dwo_ref,
         dwev_ref, dwod_ref, dcu_ref, dcv_ref, dbk_ref, dbv_ref) = rest
    else:
        (dx_ref, dwq_ref, dwk_ref, dwv_ref, dwo_ref, dwev_ref, dwod_ref,
         dcu_ref, dcv_ref, dbk_ref, dbv_ref) = rest
    wo16 = wo_ref[:].astype(jnp.bfloat16)              # (hpp, dk, D)
    wev16 = wev_ref[:].astype(jnp.bfloat16)
    wod16 = wod_ref[:].astype(jnp.bfloat16)
    wq16 = wq_ref[:].astype(jnp.bfloat16)              # (h, D, dk)
    wk16 = wk_ref[:].astype(jnp.bfloat16)
    wv16 = wv_ref[:].astype(jnp.bfloat16)
    tot = None
    for r in range(bpp):
        x16 = x_ref[r].astype(jnp.bfloat16)
        g16 = g_ref[r].astype(jnp.bfloat16)            # (T, D)
        seg = (segq_ref[r], segk_ref[r]) if with_seg else None
        attn, qt, q_vt, kt, vt = _block_scores(
            x16, wq_ref, wk_ref, wv_ref, cu_ref, cv_ref, bk_ref, bv_ref,
            wev_ref, wod_ref, sint_ref, cost_ref, cos_ref, sin_ref,
            bias_ref[r], t=t, dk_real=dk_real, left=left, right=right,
            seg=seg, score_bf16=score_bf16)
        if rate > 0.0:
            seed_base = seed_ref[pl.program_id(1) * bpp + r,
                                 pl.program_id(0) * hpp]
            keep = _dropout_keep(seed_base, hpp, (t, t), rate, interpret)
            attn_d = jnp.where(keep, attn * (1.0 / (1.0 - rate)), 0.0)
        else:
            attn_d = attn

        qu16, qv16, k16, v16 = (z.astype(jnp.bfloat16)
                                for z in (qt, q_vt, kt, vt))
        a16 = attn_d.astype(jnp.bfloat16)

        # recompute ctx for the dWo grad: ctx[h,t,d] = sum_s attn[h,t,s] v[h,d,s]
        adn = (((2,), (2,)), ((0,), (0,)))
        ctx = jax.lax.dot_general(a16, v16, adn,
                                  preferred_element_type=jnp.float32)
        ctx16 = ctx.astype(jnp.bfloat16)
        # dWo[h,dk,D] = sum_t ctx[h,t,dk] g[t,D]
        gdn = (((1,), (0,)), ((), ()))       # (h,T,dk) x (T,D) -> (h,dk,D)
        dwo_val = jax.lax.dot_general(ctx16, g16, gdn,
                                      preferred_element_type=jnp.float32)
        # d_ctx, transposed: (h, dk, T) = (h,dk,D) x (T,D) contracting D
        ddn = (((2,), (1,)), ((), ()))
        dctx_t = jax.lax.dot_general(wo16, g16, ddn,
                                     preferred_element_type=jnp.float32)
        dct16 = dctx_t.astype(jnp.bfloat16)

        # dattn[h,t,s] = sum_dk dctx_t[h,dk,t] v[h,dk,s]
        cdn = (((1,), (1,)), ((0,), (0,)))
        dattn = jax.lax.dot_general(dct16, v16, cdn,
                                    preferred_element_type=jnp.float32)
        # NOTE: dattn comes out as (h, T, S) with the T axis from dctx_t's lanes
        if rate > 0.0:
            dattn = jnp.where(keep, dattn * (1.0 / (1.0 - rate)), 0.0)
        ds = attn * (dattn - jnp.sum(dattn * attn, axis=-1, keepdims=True))
        ds = ds * (1.0 / math.sqrt(dk_real))
        ds16 = ds.astype(jnp.bfloat16)

        # dv[h,s,dk] = sum_t attn_d[h,t,s] dctx_t[h,dk,t]
        tdn = (((1,), (2,)), ((0,), (0,)))
        dvs = jax.lax.dot_general(a16, dct16, tdn,
                                  preferred_element_type=jnp.float32)
        # dqu[h,t,dk] = sum_s ds[h,t,s] kT[h,dk,s]
        sdn = (((2,), (2,)), ((0,), (0,)))
        dqu = jax.lax.dot_general(ds16, k16, sdn,
                                  preferred_element_type=jnp.float32)
        # dkT via (h,S,dk): dk_[h,s,dk] = sum_t ds[h,t,s] q_uT[h,dk,t]
        kdn = (((1,), (2,)), ((0,), (0,)))
        dk_s = jax.lax.dot_general(ds16, qu16, kdn,
                                   preferred_element_type=jnp.float32)

        # position chain (transposed tables): da/db (h, T, Dh)
        pdn2 = (((2,), (0,)), ((), ()))      # (h,T,S) x (S,Dh) -> (h,T,Dh)
        cos16 = cos_ref[:].astype(jnp.bfloat16)
        sin16 = sin_ref[:].astype(jnp.bfloat16)
        da = jax.lax.dot_general(ds16, cos16, pdn2,
                                 preferred_element_type=jnp.float32)
        db = jax.lax.dot_general(ds16, sin16, pdn2,
                                 preferred_element_type=jnp.float32)
        sin_r = sin_ref[:].astype(jnp.float32)   # (T, Dh) bf16 table, row t
        cos_r = cos_ref[:].astype(jnp.float32)
        du = (da * sin_r[None] - db * cos_r[None]).astype(jnp.bfloat16)
        dw = (da * cos_r[None] + db * sin_r[None]).astype(jnp.bfloat16)
        # dqv[h,t,dk] = sum_j du[h,t,j] wev[h,dk,j] (+ wod term)
        qdn = (((2,), (2,)), ((0,), (0,)))
        dqv = jax.lax.dot_general(du, wev16, qdn,
                                  preferred_element_type=jnp.float32)
        dqv = dqv + jax.lax.dot_general(dw, wod16, qdn,
                                        preferred_element_type=jnp.float32)
        # dWev[h,dk,j] = sum_t q_vT[h,dk,t] du[h,t,j]
        vdn = (((2,), (1,)), ((0,), (0,)))
        dwev_val = jax.lax.dot_general(qv16, du, vdn,
                                       preferred_element_type=jnp.float32)
        dwod_val = jax.lax.dot_general(qv16, dw, vdn,
                                       preferred_element_type=jnp.float32)

        dq = dqu + dqv                                 # (h, T, dk)
        dq16 = dq.astype(jnp.bfloat16)
        dks16 = dk_s.astype(jnp.bfloat16)
        dvs16 = dvs.astype(jnp.bfloat16)

        # dx = sum_h dq_h Wq_h^T + dk_h Wk_h^T + dv_h Wv_h^T   (T, D)
        xdn = (((1,), (1,)), ((), ()))       # (T,dk) x (D,dk) -> (T,D)
        dx = jax.lax.dot_general(dq16[0], wq16[0], xdn,
                                 preferred_element_type=jnp.float32)
        dx = dx + jax.lax.dot_general(dks16[0], wk16[0], xdn,
                                      preferred_element_type=jnp.float32)
        dx = dx + jax.lax.dot_general(dvs16[0], wv16[0], xdn,
                                      preferred_element_type=jnp.float32)
        for l in range(1, hpp):
            dx = dx + jax.lax.dot_general(dq16[l], wq16[l], xdn,
                                          preferred_element_type=jnp.float32)
            dx = dx + jax.lax.dot_general(dks16[l], wk16[l], xdn,
                                          preferred_element_type=jnp.float32)
            dx = dx + jax.lax.dot_general(dvs16[l], wv16[l], xdn,
                                          preferred_element_type=jnp.float32)
        dx_ref[0, r] = dx.astype(dx_ref.dtype)

        # weight grads: dWq[h,dk,D] = sum_t dq[h,t,dk] x[t,D]
        wgd = (((1,), (0,)), ((), ()))       # (h,T,dk) x (T,D) -> (h,dk,D)
        dwq_val = jax.lax.dot_general(dq16, x16, wgd,
                                      preferred_element_type=jnp.float32)
        dwk_val = jax.lax.dot_general(dks16, x16, wgd,
                                      preferred_element_type=jnp.float32)
        dwv_val = jax.lax.dot_general(dvs16, x16, wgd,
                                      preferred_element_type=jnp.float32)
        # bias grads (summed over T; padded rows contribute 0 through the
        # zero-padded g). Emitted as (hpp, 1, dk): the unit axis keeps hpp
        # out of the block's last-two dims, which Mosaic requires to be
        # 8/128-multiples or full — (hpp, dk) would be illegal when the VMEM
        # budget picks hpp < h (e.g. d512/h8/dk64 training).
        dcu_val = jnp.sum(dqu, axis=1, keepdims=True)
        dcv_val = jnp.sum(dqv, axis=1, keepdims=True)
        dbk_val = jnp.sum(dk_s, axis=1, keepdims=True)
        dbv_val = jnp.sum(dvs, axis=1, keepdims=True)
        vals = [dwq_val, dwk_val, dwv_val, dwo_val, dwev_val, dwod_val,
                dcu_val, dcv_val, dbk_val, dbv_val]
        tot = vals if tot is None else [a + v for a, v in zip(tot, vals)]

    # grid-sequential accumulation over the inner batch dim: the blocks'
    # index maps ignore program_id(1), so they stay VMEM-resident across
    # consecutive batch iterations and only the final sums hit HBM.
    i = pl.program_id(1)
    refs = [dwq_ref, dwk_ref, dwv_ref, dwo_ref, dwev_ref, dwod_ref,
            dcu_ref, dcv_ref, dbk_ref, dbv_ref]

    @pl.when(i == 0)
    def _():
        for ref, val in zip(refs, tot):
            ref[:] = val

    @pl.when(i != 0)
    def _():
        for ref, val in zip(refs, tot):
            ref[:] = ref[:] + val


def _pick_hpp_block(h, tp, dk, half, n_tt, n_tdh, n_tdk, rate=0.0,
                    score_bytes=4):
    """Heads per program for the block kernels.

    The working-set model is a per-head fp32 byte count against a 40 MB
    budget CALIBRATED on the v5e's hard 16.00 MB scoped-VMEM limit (the
    model over-counts ~2.3x — Mosaic reuses live ranges it can't see here).
    Measured anchors at conformer-LARGE train dims (d512/h8, T=376):
    fwd hpp=8 fits with bf16 tables and is the fastest drop=0 config;
    fwd hpp=8 with in-kernel dropout does NOT compile (the (T, T) keep
    mask per head pushes it over), hence the rate>0 term that lands those
    configs on hpp=4; bwd hpp=4 fits and beats hpp=2 (~0.5 ms/layer f+b).
    TPU_ASR_ATTN_VMEM_MB overrides the budget (A/B probing only). The env
    var is read at TRACE time and is NOT part of jit's cache key — set it
    before the first trace; changing it later keeps the stale hpp."""
    import os
    try:
        budget_mb = int(os.environ.get("TPU_ASR_ATTN_VMEM_MB", "40"))
        if not 1 <= budget_mb <= 1024:
            budget_mb = 40
    except ValueError:
        budget_mb = 40
    budget = budget_mb * 2 ** 20
    n_drop = 1 if rate > 0.0 else 0
    hpp = h
    # MEASURED Mosaic anchor (round 5): conformer-XLarge fwd
    # (d1024/h8/dk128/half512/T384) at hpp=4 allocates 17.36 MB > the
    # 16.00 MB scoped limit, while conformer-LARGE (dk64/half256) at hpp=8
    # fits at 16.10 MB — only 8% apart, finer than the byte model can
    # separate, so XL-class dims are capped explicitly. (Latent since the
    # round-4 budget raise to 40 MB; caught by the round-5 --full sweep.)
    # The cap applies only to the measured configuration class: fp32 score
    # tiles and the default budget — bf16 tiles shrink the working set
    # below the anchor, and an explicit TPU_ASR_ATTN_VMEM_MB is a probing
    # override that must stay in control.
    if (dk >= 128 and half >= 512 and score_bytes >= 4
            and "TPU_ASR_ATTN_VMEM_MB" not in os.environ):
        hpp = min(hpp, 2)
    while hpp > 1 and hpp * ((n_tt + n_drop) * tp * tp * score_bytes
                             + (n_tdh * tp * half
                                + n_tdk * tp * dk) * 4) > budget:
        hpp //= 2
    while h % hpp:
        hpp -= 1
    return hpp


def _pick_hpp_bpp(h, b, tp, dk, half, n_tt, n_tdh, n_tdk, rate=0.0,
                  score_bytes=4):
    """(heads, batch-rows) per program. Heads are maximized first (weight
    blocks amortize across the whole inner sweep); then batch rows pack
    into the same program while the bpp-scaled working set stays in budget.
    Small models (d88/d176: ~3 MB per head-unit) are PER-PROGRAM-FIXED-COST
    bound — the round-4 probes showed HBM traffic and the VPU softmax chain
    are both immaterial at LARGE, and at flagship dims 32 one-row programs
    per layer pay ~10-20 us each of prologue/DMA-sync. bpp=2..4 cuts the
    program count 2-4x at identical math."""
    hpp = _pick_hpp_block(h, tp, dk, half, n_tt, n_tdh, n_tdk, rate,
                          score_bytes)
    import os
    try:
        budget_mb = int(os.environ.get("TPU_ASR_ATTN_VMEM_MB", "40"))
        if not 1 <= budget_mb <= 1024:
            budget_mb = 40
    except ValueError:
        budget_mb = 40
    budget = budget_mb * 2 ** 20
    n_drop = 1 if rate > 0.0 else 0
    unit = ((n_tt + n_drop) * tp * tp * score_bytes
            + (n_tdh * tp * half + n_tdk * tp * dk) * 4)
    # measured (v5e, flagship d176/d88, direct same-session A/B of
    # BPP_MAX 1 vs 4): teacher fwd 10.59 vs 10.66 ms, student fwd(train)
    # 7.75 vs 7.87 ms — row packing is TIME-NEUTRAL (the per-program
    # prologue it amortizes is already overlapped), so the default cap is
    # 1 for the smaller VMEM footprint. TPU_ASR_ATTN_BPP_MAX re-enables
    # packing for probing.
    try:
        bpp_max = int(os.environ.get("TPU_ASR_ATTN_BPP_MAX", "1"))
        if not 1 <= bpp_max <= 16:
            bpp_max = 1
    except ValueError:
        bpp_max = 1
    bpp = 1
    for cand in (8, 4, 2):
        if cand <= bpp_max and b % cand == 0 and hpp * cand * unit <= budget:
            bpp = cand
            break
    return hpp, bpp


def _block_pad(x, sin_t, cos_t, key_bias):
    b, t, d = x.shape
    tp = _round_up(t, LANE)
    x_p = jnp.pad(x, ((0, 0), (0, tp - t), (0, 0)))
    # tables ship bf16: every matmul consumes them bf16 anyway and the VPU
    # rotation upcasts in-kernel; halving the operand blocks is what lets
    # hpp=8 fit the 16 MB scoped-VMEM limit at conformer-LARGE dims.
    # TPU_ASR_ATTN_FP32_TABLES=1 (trace-time, parity-validation runs only)
    # restores the reference's fp32 position tables (ADVICE r4: keeps the
    # bf16-table numerics delta excludable when chasing a WER diff).
    import os
    tab_dt = (jnp.float32
              if os.environ.get("TPU_ASR_ATTN_FP32_TABLES") == "1"
              else jnp.bfloat16)
    pad_tab = lambda z: jnp.pad(z.astype(tab_dt), ((0, tp - t), (0, 0)))
    sin_p, cos_p = pad_tab(sin_t), pad_tab(cos_t)
    sint_p = jnp.transpose(sin_p)                     # (Dh, tp) constants
    cost_p = jnp.transpose(cos_p)
    bias = jnp.pad(key_bias, ((0, 0), (0, tp - t)), constant_values=-1e30)
    bias = bias[:, None, None, :]                     # (B, 1, 1, tp)
    return x_p, sin_p, cos_p, sint_p, cost_p, bias, tp


def _pallas_block(x, wq, wk, wv, cu, cv, bk, bv, wev, wod, wo, sin_t, cos_t,
                  key_bias, seed_rows, att_context_size, dropout_rate,
                  interpret, seg=None, score_bf16=False):
    """`seg` (B, T) fp32 packed-segment map (data/packing.py; eval AND
    training — the bwd kernel recomputes the mask) adds two tiny
    (B, T, 1)/(B, 1, T) operands and an in-VMEM block mask."""
    b, t, d = x.shape
    h, _, dk = wq.shape
    half = wev.shape[-1]
    x_p, sin_p, cos_p, sint_p, cost_p, bias, tp = _block_pad(
        x, sin_t, cos_t, key_bias)
    hpp, bpp = _pick_hpp_bpp(h, b, tp, dk, half, n_tt=3, n_tdh=6, n_tdk=8,
                             rate=dropout_rate,
                             score_bytes=2 if score_bf16 else 4)
    n_g = h // hpp

    kernel = functools.partial(_block_fwd_kernel, t=tp, dk_real=dk,
                               left=att_context_size[0],
                               right=att_context_size[1], hpp=hpp, bpp=bpp,
                               rate=dropout_rate, with_seg=seg is not None,
                               score_bf16=score_bf16, interpret=interpret)
    # grid (head_groups, batch): batch innermost keeps the weight blocks
    # (index maps on dim 0 only) VMEM-resident across the batch sweep
    x_spec = pl.BlockSpec((bpp, tp, d), lambda j, i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((hpp, d, dk), lambda j, i: (j, 0, 0),
                          memory_space=pltpu.VMEM)
    c_spec = pl.BlockSpec((hpp, dk, 1), lambda j, i: (j, 0, 0),
                          memory_space=pltpu.VMEM)
    p_spec = pl.BlockSpec((hpp, dk, half), lambda j, i: (j, 0, 0),
                          memory_space=pltpu.VMEM)
    t_spec = pl.BlockSpec((tp, half), lambda j, i: (0, 0),
                          memory_space=pltpu.VMEM)
    tt_spec = pl.BlockSpec((half, tp), lambda j, i: (0, 0),
                           memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((hpp, dk, d), lambda j, i: (j, 0, 0),
                          memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((b, h), lambda j, i: (0, 0),
                     memory_space=pltpu.SMEM),
        x_spec, w_spec, w_spec, w_spec, c_spec, c_spec, c_spec, c_spec,
        p_spec, p_spec, t_spec, t_spec, tt_spec, tt_spec,
        pl.BlockSpec((bpp, 1, 1, tp), lambda j, i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        o_spec,
    ]
    operands = [seed_rows, x_p, wq, wk, wv, cu, cv, bk, bv, wev, wod,
                sin_p, cos_p, sint_p, cost_p, bias, wo]
    if seg is not None:
        seg_p = jnp.pad(seg.astype(jnp.float32), ((0, 0), (0, tp - t)))
        in_specs += [
            pl.BlockSpec((bpp, tp, 1), lambda j, i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bpp, 1, tp), lambda j, i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        operands += [seg_p[:, :, None], seg_p[:, None, :]]
    out = pl.pallas_call(
        kernel,
        grid=(n_g, b // bpp),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, bpp, tp, d), lambda j, i: (j, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_g, b, tp, d), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * tp * (tp * dk * 2 + tp * half * 2
                                    + d * dk * 4 + dk * half * 2),
            bytes_accessed=2 * b * tp * d * (1 + n_g),
            transcendentals=b * h * tp * tp,
        ),
        interpret=interpret,
    )(*operands)
    if n_g == 1:
        return out[0]
    return out.astype(jnp.float32).sum(axis=0).astype(x.dtype)


def _pallas_block_bwd(x, wq, wk, wv, cu, cv, bk, bv, wev, wod, wo, sin_t,
                      cos_t, key_bias, seed_rows, g, att_context_size,
                      dropout_rate, interpret, score_bf16=False, seg=None):
    b, t, d = x.shape
    h, _, dk = wq.shape
    half = wev.shape[-1]
    x_p, sin_p, cos_p, sint_p, cost_p, bias, tp = _block_pad(
        x, sin_t, cos_t, key_bias)
    # with bf16 tiles only scores/e/attn shrink; dattn/ds stay fp32 ->
    # count the (T, T) term at an averaged 3 bytes
    hpp, bpp = _pick_hpp_bpp(h, b, tp, dk, half, n_tt=4, n_tdh=8,
                             n_tdk=12, rate=dropout_rate,
                             score_bytes=3 if score_bf16 else 4)
    n_g = h // hpp
    g_p = jnp.pad(g.astype(x.dtype), ((0, 0), (0, tp - t), (0, 0)))

    kernel = functools.partial(_block_bwd_kernel, t=tp, dk_real=dk,
                               left=att_context_size[0],
                               right=att_context_size[1], hpp=hpp, bpp=bpp,
                               rate=dropout_rate, with_seg=seg is not None,
                               score_bf16=score_bf16, interpret=interpret)
    # grid (head_groups, batch), batch innermost: weight operand blocks stay
    # resident across the batch sweep and the weight-grad blocks accumulate
    # in place (their index maps ignore the inner dim) — see the kernel note
    x_spec = pl.BlockSpec((bpp, tp, d), lambda j, i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((hpp, d, dk), lambda j, i: (j, 0, 0),
                          memory_space=pltpu.VMEM)
    c_spec = pl.BlockSpec((hpp, dk, 1), lambda j, i: (j, 0, 0),
                          memory_space=pltpu.VMEM)
    p_spec = pl.BlockSpec((hpp, dk, half), lambda j, i: (j, 0, 0),
                          memory_space=pltpu.VMEM)
    t_spec = pl.BlockSpec((tp, half), lambda j, i: (0, 0),
                          memory_space=pltpu.VMEM)
    tt_spec = pl.BlockSpec((half, tp), lambda j, i: (0, 0),
                           memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((hpp, dk, d), lambda j, i: (j, 0, 0),
                          memory_space=pltpu.VMEM)
    g_spec = pl.BlockSpec((bpp, tp, d), lambda j, i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    dxd = jax.ShapeDtypeStruct((n_g, b, tp, d), x.dtype)
    dwd = jax.ShapeDtypeStruct((h, dk, d), jnp.float32)
    dpd = jax.ShapeDtypeStruct((h, dk, half), jnp.float32)
    # (h, 1, dk): see the bias-grad note in _block_bwd_kernel
    dcd = jax.ShapeDtypeStruct((h, 1, dk), jnp.float32)
    dw_spec = pl.BlockSpec((hpp, dk, d), lambda j, i: (j, 0, 0),
                           memory_space=pltpu.VMEM)
    dp_spec = pl.BlockSpec((hpp, dk, half), lambda j, i: (j, 0, 0),
                           memory_space=pltpu.VMEM)
    dc_spec = pl.BlockSpec((hpp, 1, dk), lambda j, i: (j, 0, 0),
                           memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((b, h), lambda j, i: (0, 0),
                     memory_space=pltpu.SMEM),
        x_spec, w_spec, w_spec, w_spec, c_spec, c_spec, c_spec, c_spec,
        p_spec, p_spec, t_spec, t_spec, tt_spec, tt_spec,
        pl.BlockSpec((bpp, 1, 1, tp), lambda j, i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        o_spec, g_spec,
    ]
    operands = [seed_rows, x_p, wq, wk, wv, cu, cv, bk, bv, wev, wod,
                sin_p, cos_p, sint_p, cost_p, bias, wo, g_p]
    if seg is not None:
        seg_p = jnp.pad(seg.astype(jnp.float32), ((0, 0), (0, tp - t)))
        in_specs += [
            pl.BlockSpec((bpp, tp, 1), lambda j, i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bpp, 1, tp), lambda j, i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        operands += [seg_p[:, :, None], seg_p[:, None, :]]
    res = pl.pallas_call(
        kernel,
        grid=(n_g, b // bpp),
        in_specs=in_specs,
        out_specs=(pl.BlockSpec((1, bpp, tp, d), lambda j, i: (j, i, 0, 0),
                                memory_space=pltpu.VMEM),
                   dw_spec, dw_spec, dw_spec, dw_spec, dp_spec, dp_spec,
                   dc_spec, dc_spec, dc_spec, dc_spec),
        out_shape=(dxd, dwd, dwd, dwd, dwd, dpd, dpd, dcd, dcd, dcd, dcd),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * tp * (tp * dk * 2 + tp * half * 2
                                    + d * dk * 4 + dk * half * 2),
            bytes_accessed=4 * b * tp * d * (1 + n_g),
            transcendentals=b * h * tp * tp,
        ),
        interpret=interpret,
    )(*operands)
    dx_part = res[0]
    if n_g == 1:
        dx = dx_part[0]
    else:
        dx = dx_part.astype(jnp.float32).sum(axis=0).astype(x.dtype)
    return (dx,) + tuple(res[1:])


# partition factors for the block kernels ('b' batch, 'h' heads)
_BLK_X = ("b", None, None)
_BLK_W = ("h", None, None)
_BLK_ARGS = (_BLK_X, _BLK_W, _BLK_W, _BLK_W, _BLK_W, _BLK_W, _BLK_W,
             _BLK_W, _BLK_W, _BLK_W, _BLK_W, _TAB, _TAB, ("b", None),
             ("b", "h"))
# the (B, T, D) outputs CONTRACT the head factor (row-parallel output
# projection): under head sharding each shard holds a partial sum and the
# partition lowering inserts the psum (factor_partitioned reduce_factors)
_BLK_OUT = (("b", None, None),)
# dx keeps the batch factor and contracts heads; the weight/bias grads are
# already batch-summed in the kernel (grid-sequential accumulation), so they
# keep the head factor and contract batch — both contractions become psums
# under sharding via reduce_factors=("h", "b")
_BLK_BWD_OUTS = (("b", None, None),) + (("h", None, None),) * 6 \
    + (("h", None, None),) * 4


@functools.lru_cache(maxsize=None)
def _block_fwd_partitioned(att_context_size, dropout_rate, interpret,
                           score_bf16=False, with_seg=False):
    from tpu_asr.parallel.kernel_sharding import factor_partitioned

    def fun(x, wq, wk, wv, cu, cv, bk, bv, wev, wod, wo, sin_t, cos_t,
            key_bias, seed_rows, seg):
        return _pallas_block(x, wq, wk, wv, cu, cv, bk, bv, wev, wod, wo,
                             sin_t, cos_t, key_bias, seed_rows,
                             att_context_size, dropout_rate, interpret,
                             seg=seg if with_seg else None,
                             score_bf16=score_bf16)

    return factor_partitioned(fun, _BLK_ARGS + (("b", None),), _BLK_OUT,
                              tuple_out=False, reduce_factors=("h",))


@functools.lru_cache(maxsize=None)
def _block_bwd_partitioned(att_context_size, dropout_rate, interpret,
                           score_bf16=False, with_seg=False):
    from tpu_asr.parallel.kernel_sharding import factor_partitioned

    def fun(x, wq, wk, wv, cu, cv, bk, bv, wev, wod, wo, sin_t, cos_t,
            key_bias, seed_rows, seg, g):
        return _pallas_block_bwd(x, wq, wk, wv, cu, cv, bk, bv, wev, wod,
                                 wo, sin_t, cos_t, key_bias, seed_rows, g,
                                 att_context_size, dropout_rate, interpret,
                                 score_bf16=score_bf16,
                                 seg=seg if with_seg else None)

    # arg order: (x .. seed_rows) + seg (B, T) + g (B, T, D)
    return factor_partitioned(fun, _BLK_ARGS + (("b", None),
                                                ("b", None, None)),
                              _BLK_BWD_OUTS,
                              tuple_out=True, reduce_factors=("h", "b"))


@functools.partial(jax.custom_vjp, nondiff_argnums=(16, 17, 18, 19, 20))
def _block_core(x, wq, wk, wv, cu, cv, bk, bv, wev, wod, wo, sin_t, cos_t,
                key_bias, seed_rows, seg, att_context_size, dropout_rate,
                interpret, score_bf16, with_seg):
    return _block_fwd_partitioned(att_context_size, dropout_rate, interpret,
                                  score_bf16, with_seg)(
        x, wq, wk, wv, cu, cv, bk, bv, wev, wod, wo, sin_t, cos_t,
        key_bias, seed_rows, seg)


def _block_core_fwd(x, wq, wk, wv, cu, cv, bk, bv, wev, wod, wo, sin_t,
                    cos_t, key_bias, seed_rows, seg, att_context_size,
                    dropout_rate, interpret, score_bf16, with_seg):
    out = _block_fwd_partitioned(att_context_size, dropout_rate, interpret,
                                 score_bf16, with_seg)(
        x, wq, wk, wv, cu, cv, bk, bv, wev, wod, wo, sin_t, cos_t,
        key_bias, seed_rows, seg)
    return out, (x, wq, wk, wv, cu, cv, bk, bv, wev, wod, wo, sin_t, cos_t,
                 key_bias, seed_rows, seg)


def _block_core_bwd(att_context_size, dropout_rate, interpret, score_bf16,
                    with_seg, res, g):
    (x, wq, wk, wv, cu, cv, bk, bv, wev, wod, wo, sin_t, cos_t, key_bias,
     seed_rows, seg) = res
    (dx, dwq_b, dwk_b, dwv_b, dwo_b, dwev_b, dwod_b, dcu_b, dcv_b, dbk_b,
     dbv_b) = _block_bwd_partitioned(att_context_size, dropout_rate,
                                     interpret, score_bf16, with_seg)(
        x, wq, wk, wv, cu, cv, bk, bv, wev, wod, wo, sin_t, cos_t,
        key_bias, seed_rows, seg, g)
    # weight grads arrive batch-summed from the kernel (grid-sequential
    # accumulation; psum over 'b' under GSPMD). The kernel emits dW as
    # (h, dk, D) — transpose to the (h, D, dk) operands
    wgrad = lambda p: jnp.transpose(p, (0, 2, 1))
    # dc grads are (h, 1, dk) -> (h, dk, 1) bias operands
    cgrad = lambda p: jnp.transpose(p, (0, 2, 1))
    t = x.shape[1]
    dx_sum = dx[:, :t].astype(x.dtype)
    return (dx_sum, wgrad(dwq_b).astype(wq.dtype),
            wgrad(dwk_b).astype(wk.dtype), wgrad(dwv_b).astype(wv.dtype),
            cgrad(dcu_b).astype(cu.dtype), cgrad(dcv_b).astype(cv.dtype),
            cgrad(dbk_b).astype(bk.dtype), cgrad(dbv_b).astype(bv.dtype),
            dwev_b.astype(wev.dtype),
            dwod_b.astype(wod.dtype),
            dwo_b.astype(wo.dtype),
            jnp.zeros_like(sin_t), jnp.zeros_like(cos_t),
            jnp.zeros_like(key_bias),
            np.zeros(seed_rows.shape, jax.dtypes.float0),
            jnp.zeros_like(seg))


_block_core.defvjp(_block_core_fwd, _block_core_bwd)


def fused_relpos_attention_block(
    x: jnp.ndarray,              # (B, T, D) post-LN attention input
    wq_full: jnp.ndarray,        # (D, D) linear_q kernel
    bq: jnp.ndarray,             # (D,)
    wk_full: jnp.ndarray,        # (D, D) linear_k kernel
    bk_full: jnp.ndarray,        # (D,)
    wv_full: jnp.ndarray,        # (D, D) linear_v kernel
    bv_full: jnp.ndarray,        # (D,)
    bias_u: jnp.ndarray,         # (H, dk) rel-pos content bias
    bias_v: jnp.ndarray,         # (H, dk) rel-pos position bias
    pos_kernel: jnp.ndarray,     # (D, H, dk) linear_pos weight, per head
    wo_full: jnp.ndarray,        # (D, D) linear_out kernel
    mask: jnp.ndarray,           # (B, T) bool, True = valid
    n_heads: int,
    att_context_size: Tuple[int, int] = (-1, -1),
    dropout_rate: float = 0.0,
    dropout_seed: Optional[jnp.ndarray] = None,
    interpret: bool = False,
    seg_id: Optional[jnp.ndarray] = None,   # (B, T) int, 0 = guard/pad
    score_bf16: Optional[bool] = None,
) -> jnp.ndarray:
    """Whole-sublayer fused attention: (B, T, D) in -> (B, T, D) out,
    WITHOUT the linear_out bias (the caller adds it — keeps the bias's
    gradient on the plain-JAX side). Padded/masked-key columns never
    contribute; padded-query rows are garbage and must be re-masked by the
    caller (the ConformerLayer contract, same as fused_relpos_attention).

    `seg_id` enables packed-segment attention (data/packing.py): query t
    attends key s iff seg_id[t] == seg_id[s] > 0, built in-VMEM from two
    (B, T) operands. Supported in BOTH eval and training (packed-segment
    training): the custom VJP recomputes the segment mask flash-style in
    the backward, and in-kernel dropout composes with it.

    `score_bf16` (None -> TPU_ASR_ATTN_SCORE_BF16 env, read at trace time):
    bf16 (T, T) score/softmax tiles — halves the dominant per-program VMEM
    working set so hpp/bpp can double (fewer, larger programs). Numerics:
    attention weights round to ~2^-8 relative (fp32-accumulated MXU dots and
    softmax denominator; tile STORAGE only). Parity bound pinned by
    tests/test_pallas_attention.py; A/B numbers in ROADMAP round-5.

    All (D, D) kernels arrive in the checkpoint layout (Dense (in, out));
    per-head splits/permutations happen here on the tiny parameters, outside
    the custom_vjp, so autodiff routes grads back to the full kernels."""
    b, t, d = x.shape
    h = n_heads
    dk = d // h
    cdt = x.dtype
    if score_bf16 is None:
        import os
        score_bf16 = os.environ.get("TPU_ASR_ATTN_SCORE_BF16") == "1"
    sin_t, cos_t, _ = position_tables(t, d)

    per_head = lambda w: jnp.transpose(w.reshape(d, h, dk),
                                       (1, 0, 2)).astype(cdt)
    wq, wk, wv = per_head(wq_full), per_head(wk_full), per_head(wv_full)
    wo = wo_full.reshape(h, dk, d).astype(cdt)
    f32 = jnp.float32
    cu = (bq.reshape(h, dk) + bias_u).astype(f32)[:, :, None]
    cv = (bq.reshape(h, dk) + bias_v).astype(f32)[:, :, None]
    bk3 = bk_full.reshape(h, dk).astype(f32)[:, :, None]
    bv3 = bv_full.reshape(h, dk).astype(f32)[:, :, None]
    wev = jnp.transpose(pos_kernel[0::2], (1, 2, 0)).astype(cdt)
    wod = jnp.transpose(pos_kernel[1::2], (1, 2, 0)).astype(cdt)

    key_bias = jnp.where(mask, 0.0, -1e30).astype(jnp.float32)
    if dropout_seed is None:
        seed_rows = jnp.zeros((b, h), jnp.int32)
    else:
        base = jnp.reshape(dropout_seed.astype(jnp.int32), (-1,))[0]
        seed_rows = (base + jnp.arange(b, dtype=jnp.int32)[:, None] * h
                     + jnp.arange(h, dtype=jnp.int32)[None, :])
    with_seg = seg_id is not None
    seg = (seg_id.astype(jnp.float32) if with_seg
           else jnp.zeros((b, t), jnp.float32))
    out = _block_core(x, wq, wk, wv, cu, cv, bk3, bv3, wev, wod, wo,
                      sin_t, cos_t, key_bias, seed_rows, seg,
                      tuple(att_context_size), float(dropout_rate),
                      interpret, bool(score_bf16), with_seg)
    return out[:, :t].astype(cdt)
