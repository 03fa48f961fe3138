"""Whole Conformer layer (eval path) as ONE Pallas TPU kernel.

FF(1/2) -> LN -> rel-pos attention (full block: projections, rotated
position scores, softmax, value contraction, per-head out-projection) ->
LN -> conv module (pointwise+GLU, depthwise k, folded-BN/LN, SiLU,
pointwise) -> FF(1/2) -> final LN -> pad-mask — the entire NeMo
ConformerLayer (SURVEY.md N6; models/conformer.ConformerLayer is the XLA
oracle), VMEM-resident per batch row.

MEASURED AT PARITY — NOT integrated as a model backend. The hypothesis was
that the encoder scan's non-attention time (~3.9 ms of a 9.2 ms B=32 x 15 s
step) is inter-fusion HBM traffic a megakernel would eliminate. Measured on
v5e (teacher dims, 16 layers, host-transfer-fenced, amortized): fused
6.96 ms vs current path (block-attention kernel + XLA glue) 6.95 ms — XLA's
fusions already keep the sublayers' working set close to the chip at these
sizes, and Mosaic's scheduling of the VPU-heavy pieces (depthwise k=31
shifted FMAs, GLU/SiLU/LN chains) gives back whatever HBM the fusion saves
(the same result as the standalone conv-module kernel, ops/pallas_conv.py).
Kept as a parity-tested artifact: the balance may differ at larger d_model
or on other TPU generations, and the negative result is itself load-bearing
for future optimization decisions (see ROADMAP.md round-3 notes).

Scope: DETERMINISTIC passes only (eval / the frozen-teacher forward inside
KD training, which is reached through stop_gradient and therefore never
differentiated): no dropout, no streaming cache, `regular` attention style,
batch_norm (eval-folded affine) or layer_norm conv norm. Training keeps the
existing path (remat + the attention/FFN kernels with in-kernel dropout);
there is NO custom VJP — differentiating through this kernel fails loudly
by design.

Reuses the block-attention machinery (`_block_scores`) and the conv-module
kernel's GLU/depthwise/fold patterns (ops/pallas_conv.py). All LayerNorms
run at the LOGICAL feature size (Mosaic pads lanes in-register), matching
flax.linen.LayerNorm (eps 1e-6... NeMo uses 1e-5? flax default 1e-6 — the
XLA path uses flax LayerNorm, so parity is to flax).

GSPMD: wrapped with the batch partition rule (parallel/kernel_sharding.py).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_asr.ops.pallas_attention import (_block_scores, _round_up,
                                          position_tables)
from tpu_asr.parallel.kernel_sharding import batch_partitioned

F32 = jnp.float32
BF16 = jnp.bfloat16
EPS = 1e-6


def _ln(xf, s_ref, b_ref):
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu
    return (xf - mu) * jax.lax.rsqrt(var + EPS) * s_ref[0] + b_ref[0]


def _ffn_half(xf, s_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref):
    y = _ln(xf, s_ref, b_ref).astype(BF16)
    dn = (((1,), (0,)), ((), ()))
    h = jax.lax.dot_general(y, w1_ref[:], dn, preferred_element_type=F32)
    h = h + b1_ref[0]
    h = h * jax.nn.sigmoid(h)                          # SiLU
    o = jax.lax.dot_general(h.astype(BF16), w2_ref[:], dn,
                            preferred_element_type=F32)
    return xf + 0.5 * (o + b2_ref[0])


def _layer_kernel(x_ref,
                  s1_ref, sb1_ref, w11_ref, bb11_ref, w12_ref, bb12_ref,
                  sa_ref, sab_ref,
                  wq_ref, wk_ref, wv_ref, cu_ref, cv_ref, bk_ref, bv_ref,
                  wev_ref, wod_ref, sin_ref, cos_ref, sint_ref, cost_ref,
                  bias_ref, wo_ref, bo_ref,
                  sc_ref, scb_ref, w1a_ref, b1a_ref, w1b_ref, b1b_ref,
                  wd_ref, bd_ref, nw_ref, nb_ref, w2c_ref, b2c_ref,
                  s2_ref, sb2_ref, w21_ref, bb21_ref, w22_ref, bb22_ref,
                  sf_ref, sfb_ref,
                  o_ref,
                  *, t, dk_real, left, right, k, pad_l, conv_norm, hpp):
    x0 = x_ref[0].astype(F32)                          # (Tp, D)
    mcol = (bias_ref[0, 0, 0, :] > -0.5).astype(F32)[:, None]
    dn = (((1,), (0,)), ((), ()))

    # ---- FF half-step 1 ----
    x1 = _ffn_half(x0, s1_ref, sb1_ref, w11_ref, bb11_ref, w12_ref, bb12_ref)

    # ---- attention sublayer ----
    xa = _ln(x1, sa_ref, sab_ref).astype(BF16)
    attn, _, _, _, vt = _block_scores(
        xa, wq_ref, wk_ref, wv_ref, cu_ref, cv_ref, bk_ref, bv_ref,
        wev_ref, wod_ref, sint_ref, cost_ref, cos_ref, sin_ref,
        bias_ref[0], t=t, dk_real=dk_real, left=left, right=right)
    a16 = attn.astype(BF16)
    v16 = vt.astype(BF16)
    adn = (((2,), (2,)), ((0,), (0,)))
    ctx = jax.lax.dot_general(a16, v16, adn, preferred_element_type=F32)
    ctx16 = ctx.astype(BF16)
    mdn = (((1,), (0,)), ((), ()))
    att = jax.lax.dot_general(ctx16[0], wo_ref[0], mdn,
                              preferred_element_type=F32)
    for l in range(1, hpp):
        att = att + jax.lax.dot_general(ctx16[l], wo_ref[l], mdn,
                                        preferred_element_type=F32)
    x2 = x1 + att + bo_ref[0]

    # ---- conv module ----
    xc = _ln(x2, sc_ref, scb_ref).astype(BF16)
    h_lin = jax.lax.dot_general(xc, w1a_ref[:], dn,
                                preferred_element_type=F32) + b1a_ref[0]
    h_gate = jax.lax.dot_general(xc, w1b_ref[:], dn,
                                 preferred_element_type=F32) + b1b_ref[0]
    glu = h_lin * jax.nn.sigmoid(h_gate) * mcol        # (Tp, D)
    tp = glu.shape[0]
    acc = jnp.zeros_like(glu)
    for j in range(k):
        off = j - pad_l
        if off < 0:
            shifted = jnp.pad(glu[:tp + off], ((-off, 0), (0, 0)))
        elif off > 0:
            shifted = jnp.pad(glu[off:], ((0, off), (0, 0)))
        else:
            shifted = glu
        acc = acc + shifted * wd_ref[j][None, :]
    acc = acc + bd_ref[0]
    if conv_norm == "layer_norm":
        h = _ln(acc, nw_ref, nb_ref)
    else:                                              # folded-BN affine
        h = acc * nw_ref[0] + nb_ref[0]
    h = h * jax.nn.sigmoid(h)                          # SiLU
    convo = jax.lax.dot_general(h.astype(BF16), w2c_ref[:], dn,
                                preferred_element_type=F32)
    x3 = x2 + convo + b2c_ref[0]

    # ---- FF half-step 2 + final LN + pad mask ----
    x4 = _ffn_half(x3, s2_ref, sb2_ref, w21_ref, bb21_ref, w22_ref, bb22_ref)
    out = _ln(x4, sf_ref, sfb_ref) * mcol
    o_ref[0] = out.astype(o_ref.dtype)


@functools.lru_cache(maxsize=None)
def _layer_partitioned(d, h_heads, dk, half, dff, k, pad_l, conv_norm,
                       att_context_size, interpret):
    left, right = att_context_size

    def fun(x, key_bias, s1, sb1, w11, bb11, w12, bb12, sa, sab,
            wq, wk, wv, cu, cv, bk3, bv3, wev, wod, sin_p, cos_p,
            sint_p, cost_p, wo, bo,
            sc, scb, w1a, b1a, w1b, b1b, wd, bd, nw, nb, w2c, b2c,
            s2, sb2, w21, bb21, w22, bb22, sf, sfb):
        b, tp, _ = x.shape
        hpp = h_heads                                  # all heads, 1 row
        kernel = functools.partial(
            _layer_kernel, t=tp, dk_real=dk, left=left, right=right,
            k=k, pad_l=pad_l, conv_norm=conv_norm, hpp=hpp)
        vm = pltpu.VMEM
        x_spec = pl.BlockSpec((1, tp, d), lambda i: (i, 0, 0),
                              memory_space=vm)
        const = lambda *shape: pl.BlockSpec(
            tuple(shape), lambda i, _n=len(shape): (0,) * _n,
            memory_space=vm)
        row = lambda n: const(1, n)
        out = pl.pallas_call(
            kernel,
            grid=(b,),
            in_specs=[
                x_spec,
                row(d), row(d), const(d, dff), row(dff), const(dff, d),
                row(d),
                row(d), row(d),
                const(hpp, d, dk), const(hpp, d, dk), const(hpp, d, dk),
                const(hpp, dk, 1), const(hpp, dk, 1), const(hpp, dk, 1),
                const(hpp, dk, 1),
                const(hpp, dk, half), const(hpp, dk, half),
                const(tp, half), const(tp, half),
                const(half, tp), const(half, tp),
                pl.BlockSpec((1, 1, 1, tp), lambda i: (i, 0, 0, 0),
                             memory_space=vm),
                const(hpp, dk, d), row(d),
                row(d), row(d), const(d, d), row(d), const(d, d), row(d),
                const(k, d), row(d), row(d), row(d), const(d, d), row(d),
                row(d), row(d), const(d, dff), row(dff), const(dff, d),
                row(d),
                row(d), row(d),
            ],
            out_specs=x_spec,
            out_shape=jax.ShapeDtypeStruct((b, tp, d), x.dtype),
            cost_estimate=pl.CostEstimate(
                flops=2 * b * tp * (4 * d * dff + 4 * d * d
                                    + h_heads * tp * dk * 2
                                    + h_heads * tp * half * 2
                                    + h_heads * d * dk * 4 + 3 * d * d),
                bytes_accessed=4 * b * tp * d,
                transcendentals=b * h_heads * tp * tp + 4 * b * tp * dff,
            ),
            interpret=interpret,
        )(x, s1, sb1, w11, bb11, w12, bb12, sa, sab,
          wq, wk, wv, cu, cv, bk3, bv3, wev, wod, sin_p, cos_p,
          sint_p, cost_p, key_bias, wo, bo,
          sc, scb, w1a, b1a, w1b, b1b, wd, bd, nw, nb, w2c, b2c,
          s2, sb2, w21, bb21, w22, bb22, sf, sfb)
        return out

    # batch-sharded: x + key_bias; everything else replicated weights
    ranks = ([3, 4]
             + [2, 2, 2, 2, 2, 2]            # ffn1
             + [2, 2]                        # att LN
             + [3, 3, 3, 3, 3, 3, 3, 3, 3]   # wq..wod
             + [2, 2, 2, 2]                  # sin/cos/sint/cost
             + [3, 2]                        # wo, bo
             + [2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2]   # conv
             + [2, 2, 2, 2, 2, 2]            # ffn2
             + [2, 2])                       # final LN
    specs = tuple((r, 0 if i < 2 else None) for i, r in enumerate(ranks))
    return batch_partitioned(fun, specs, ((3, 0),), tuple_out=False)


def fused_conformer_layer(
    x: jnp.ndarray,              # (B, T, D) layer input (padded rows ZERO)
    mask: jnp.ndarray,           # (B, T) bool, True = valid
    params: dict,                # raw weights, see keys below
    n_heads: int,
    conv_kernel_size: int,
    conv_pad_l: int,
    conv_norm: str,              # 'affine' (folded BN) | 'layer_norm'
    att_context_size: Tuple[int, int] = (-1, -1),
    interpret: bool = False,
) -> jnp.ndarray:
    """Runs one deterministic Conformer layer fused. `params` keys:
    ffn1: s1, sb1, w11, bb11, w12, bb12 (LN + two Dense)
    att:  sa, sab (LN), wq_full/bq/wk_full/bk/wv_full/bv (D,D)/(D,),
          bias_u, bias_v (H, dk), pos_kernel (D, H, dk), wo_full (D,D),
          bo (D,)
    conv: sc, scb (LN), w1 (D, 2D), b1 (2D,), wd (K, 1, D) depthwise,
          bd (D,), nw, nb (folded BN or LN affine), w2c (D, D), b2c (D,)
    ffn2: s2, sb2, w21, bb21, w22, bb22
    out:  sf, sfb (final LN)."""
    b, t, d = x.shape
    h = n_heads
    dk = d // h
    dff = params["w11"].shape[1]
    tp = _round_up(t, 128)
    x_p = jnp.pad(x, ((0, 0), (0, tp - t), (0, 0)))
    sin_t, cos_t, _ = position_tables(tp, d)

    per_head = lambda w: jnp.transpose(
        w.reshape(d, h, dk), (1, 0, 2)).astype(BF16)
    wq = per_head(params["wq_full"])
    wk = per_head(params["wk_full"])
    wv = per_head(params["wv_full"])
    wo = params["wo_full"].reshape(h, dk, d).astype(BF16)
    cu = (params["bq"].reshape(h, dk) + params["bias_u"]).astype(F32)[:, :, None]
    cv = (params["bq"].reshape(h, dk) + params["bias_v"]).astype(F32)[:, :, None]
    bk3 = params["bk"].reshape(h, dk).astype(F32)[:, :, None]
    bv3 = params["bv"].reshape(h, dk).astype(F32)[:, :, None]
    wev = jnp.transpose(params["pos_kernel"][0::2], (1, 2, 0)).astype(BF16)
    wod = jnp.transpose(params["pos_kernel"][1::2], (1, 2, 0)).astype(BF16)
    half = wev.shape[-1]
    sint_p = jnp.transpose(sin_t)
    cost_p = jnp.transpose(cos_t)
    key_bias = jnp.where(jnp.pad(mask, ((0, 0), (0, tp - t))),
                         0.0, -1e30).astype(F32)[:, None, None, :]

    r = lambda v: v.astype(F32).reshape(1, -1)
    m16 = lambda w: w.astype(BF16)
    w1 = params["w1"]
    wd = params["wd"].reshape(conv_kernel_size, d).astype(F32)

    wrapped = _layer_partitioned(
        d, h, dk, half, dff, conv_kernel_size, conv_pad_l, conv_norm,
        tuple(att_context_size), interpret)
    args = (x_p, key_bias,
            r(params["s1"]), r(params["sb1"]), m16(params["w11"]),
            r(params["bb11"]), m16(params["w12"]), r(params["bb12"]),
            r(params["sa"]), r(params["sab"]),
            wq, wk, wv, cu, cv, bk3, bv3, wev, wod,
            sin_t.astype(F32), cos_t.astype(F32), sint_p, cost_p,
            wo, r(params["bo"]),
            r(params["sc"]), r(params["scb"]),
            m16(w1[:, :d]), r(params["b1"][:d]),
            m16(w1[:, d:]), r(params["b1"][d:]),
            wd, r(params["bd"]), r(params["nw"]), r(params["nb"]),
            m16(params["w2c"]), r(params["b2c"]),
            r(params["s2"]), r(params["sb2"]), m16(params["w21"]),
            r(params["bb21"]), m16(params["w22"]), r(params["bb22"]),
            r(params["sf"]), r(params["sfb"]))
    out = wrapped(*args)
    return out[:, :t].astype(x.dtype)
