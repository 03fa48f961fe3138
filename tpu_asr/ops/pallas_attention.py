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
