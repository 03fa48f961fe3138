"""Fused Conformer conv module (eval path) as one Pallas TPU kernel.

pointwise(d->2d) -> GLU -> pad-mask -> depthwise(k) -> folded-BN / LN ->
SiLU -> pointwise(d->d), all VMEM-resident per batch element: the (T, 2D)
pointwise-1 output, the GLU activation, and the depthwise accumulator never
touch HBM (reference semantics: NeMo ConformerConvolution inside
ConformerLayer — SURVEY.md N6; models/conformer.ConformerConvolution is the
XLA oracle it is parity-tested against).

Scope: deterministic (inference) passes with either `layer_norm` or
eval-mode `batch_norm` (the per-channel affine already folded by the caller,
exactly like MaskedBatchNorm's use_running_average branch). Training keeps
the XLA path — live BN batch statistics need a global (B, T) reduction that
does not fit a per-batch-element program.

Grid is (B,): one program per utterance with the full (padded) T axis in
VMEM — at ASR sizes (T<=~2k frames, D<=256 lanes) the whole working set is
~2-3 MB, so no halo exchange is needed for the depthwise window; the k
shifted multiply-adds use static slices of the in-register GLU activation.
The pointwise-1 kernel is passed as two lane-padded HALVES (linear, gate) so
the GLU split never slices lanes at a non-128 offset.

The pad mask rides in a spare CHANNEL lane: D never fills the 128-lane tile
(88->128, 176->256), so the caller writes `mask` into channel D of the padded
input and the kernel reads it back as a column — a (B, T) operand would need
its own (sublane, lane) tile just for one bit per frame. Callers with
D % 128 == 0 must fall back to the XLA path.

GSPMD: wrapped with the batch partition rule (parallel/kernel_sharding.py),
so the batch axis stays sharded under a mesh.

Measured, not assumed: on v5e-1 (teacher config, B=32 x 15 s eval, 16
layers) this kernel runs 2.87 ms vs 2.28 ms for XLA's own fusion of the
module — XLA already fuses GLU/BN/SiLU into the convs well here, and the
kernel pays for fp32 tiles and k sequential shifted FMAs. `conv_backend`
therefore defaults to the XLA path (models/conformer.py); the kernel stays
parity-tested as an alternative backend (same situation as the fused
spectrogram kernel, ops/pallas_features.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _conv_kernel(x_ref, w1a_ref, b1a_ref, w1b_ref, b1b_ref, wd_ref, bd_ref,
                 nw_ref, nb_ref, w2_ref, b2_ref, o_ref, *, d, k, pad_l, norm):
    """x_ref: (1, Tp, Dp) with the pad mask in channel d; weights resident.
    norm: 'affine' (folded BN: y = h*nw + nb) or 'layer_norm'."""
    x = x_ref[0]
    tp = x.shape[0]
    m = x[:, d][:, None]                               # (Tp, 1) pad mask
    xb = x.astype(jnp.bfloat16)
    dn = (((1,), (0,)), ((), ()))

    # pointwise 1 in two lane-padded halves + GLU; padded channels of the
    # halves are zero-weight/zero-bias, so glu is clean there
    h_lin = jax.lax.dot_general(xb, w1a_ref[:].astype(jnp.bfloat16), dn,
                                preferred_element_type=jnp.float32) + b1a_ref[0]
    h_gate = jax.lax.dot_general(xb, w1b_ref[:].astype(jnp.bfloat16), dn,
                                 preferred_element_type=jnp.float32) + b1b_ref[0]
    glu = h_lin * jax.nn.sigmoid(h_gate) * m           # (Tp, Dp)

    # depthwise conv over time: k static shifted FMAs on the VMEM tile.
    # frame t output = sum_j glu[t + j - pad_l] * wd[j]; out-of-range rows
    # are zero (matches the module's zero padding of masked positions).
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

    if norm == "layer_norm":
        lane = jax.lax.broadcasted_iota(jnp.int32, acc.shape, 1)
        cvalid = (lane < d).astype(jnp.float32)
        nvalid = float(d)
        mean = jnp.sum(acc * cvalid, axis=1, keepdims=True) / nvalid
        var = jnp.sum(jnp.square((acc - mean) * cvalid), axis=1,
                      keepdims=True) / nvalid
        h = (acc - mean) * jax.lax.rsqrt(var + 1e-6)
        h = h * nw_ref[0] + nb_ref[0]                  # pads zero via nw/nb
    else:                                              # folded BN affine
        h = acc * nw_ref[0] + nb_ref[0]
    h = h * jax.nn.sigmoid(h)                          # SiLU
    # NOTE: no re-masking here — the XLA path lets masked rows carry
    # norm(SiLU(bd))-derived values through pointwise-2 (the conformer layer
    # re-masks after the residual add); parity requires matching that.

    out = jax.lax.dot_general(h.astype(jnp.bfloat16),
                              w2_ref[:].astype(jnp.bfloat16), dn,
                              preferred_element_type=jnp.float32)
    o_ref[0] = (out + b2_ref[0]).astype(o_ref.dtype)


@functools.lru_cache(maxsize=None)
def _conv_partitioned(d, k, pad_l, norm, interpret):
    from tpu_asr.parallel.kernel_sharding import batch_partitioned

    def fun(xm, w1a, b1a, w1b, b1b, wd, bd, nw, nb, w2, b2):
        b, tp, dp = xm.shape
        kernel = functools.partial(_conv_kernel, d=d, k=k, pad_l=pad_l,
                                   norm=norm)
        row = pl.BlockSpec((1, dp), lambda i: (0, 0), memory_space=pltpu.VMEM)
        mat = pl.BlockSpec((dp, dp), lambda i: (0, 0), memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            grid=(b,),
            in_specs=[
                pl.BlockSpec((1, tp, dp), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                mat, row, mat, row,
                pl.BlockSpec((wd.shape[0], dp), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                row, row, row, mat, row,
            ],
            out_specs=pl.BlockSpec((1, tp, dp), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, tp, dp), xm.dtype),
            interpret=interpret,
        )(xm, w1a, b1a, w1b, b1b, wd, bd, nw, nb, w2, b2)

    specs = ((3, 0),) + ((2, None),) * 10
    return batch_partitioned(fun, specs, ((3, 0),), tuple_out=False)


def fused_conv_module(
    x: jnp.ndarray,              # (B, T, D) post-LN conv-module input
    mask: jnp.ndarray,           # (B, T) bool, True = valid frame
    w1: jnp.ndarray,             # (D, 2D) pointwise_conv1 kernel
    b1: jnp.ndarray,             # (2D,)
    wd: jnp.ndarray,             # (K, D) depthwise kernel (time-major)
    bd: jnp.ndarray,             # (D,)
    norm_w: jnp.ndarray,         # (D,) folded-BN scale or LN scale
    norm_b: jnp.ndarray,         # (D,) folded-BN shift or LN bias
    w2: jnp.ndarray,             # (D, D) pointwise_conv2 kernel
    b2: jnp.ndarray,             # (D,)
    pad_l: int,
    norm: str = "affine",        # 'affine' (folded BN) | 'layer_norm'
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused eval-path conv module; returns (B, T, D) in x.dtype.

    Requires D % 128 != 0 (the pad mask rides in spare channel D). The
    depthwise window is k = wd.shape[0] with `pad_l` left frames; out-of-
    window frames contribute zero, like the module's zero padding. Masked
    frames produce pointwise-2 bias (as the XLA path does); the conformer
    layer re-masks after the residual add."""
    b, t, d = x.shape
    if d % LANE == 0:
        raise ValueError("fused_conv_module needs a spare channel lane "
                         f"(d={d} fills the tile); use the XLA path")
    k = wd.shape[0]
    tp = _round_up(t, LANE)
    dp = _round_up(d + 1, LANE)

    xm = jnp.pad(x.astype(jnp.float32), ((0, 0), (0, tp - t), (0, dp - d)))
    mcol = jnp.pad(mask.astype(jnp.float32), ((0, 0), (0, tp - t)))
    xm = xm.at[:, :, d].set(mcol)

    padc = lambda v: jnp.pad(v.astype(jnp.float32), (0, dp - d))[None]
    padm = lambda w: jnp.pad(w.astype(jnp.float32),
                             ((0, dp - d), (0, dp - d)))
    w1f = w1.astype(jnp.float32)
    b1f = b1.astype(jnp.float32)
    out = _conv_partitioned(d, k, pad_l, norm, interpret)(
        xm, padm(w1f[:, :d]), padc(b1f[:d]), padm(w1f[:, d:]), padc(b1f[d:]),
        jnp.pad(wd.astype(jnp.float32), ((0, 0), (0, dp - d))),
        padc(bd), padc(norm_w), padc(norm_b), padm(w2), padc(b2))
    return out[:, :t, :d].astype(x.dtype)
