"""Fused Conformer feed-forward sublayer (eval path) as one Pallas kernel.

out = x + 0.5 * ( silu( LN(x) @ W1 + b1 ) @ W2 + b2 )

— the whole half-step FFN sublayer of the Conformer layer (NeMo
ConformerLayer's `norm_feed_forward{1,2}` + `feed_forward{1,2}` + the 0.5
residual; SURVEY.md N6), VMEM-resident per program: the (T, d_ff)
activation never touches HBM and the LN statistics, SiLU and residual ride
in the same pass as the two matmuls.

Scope: deterministic (inference) passes — training keeps the XLA path
(dropout between the matmuls + autodiff). `rb` batch rows share one program
so launch overhead amortizes (the per-row MXU work is ~1 us).

LayerNorm matches flax.linen.LayerNorm exactly: fast variance
(E[x^2] - E[x]^2), eps 1e-6, scale+bias. D stays at its LOGICAL size
(Mosaic pads lanes in-register), so reductions over the feature axis need
no lane masking.

GSPMD: wrapped with the batch partition rule (parallel/kernel_sharding.py)
so the batch axis stays sharded under a mesh.

Default OFF (`EncoderConfig.ffn_backend='auto'` resolves to the XLA path)
until measured faster on real hardware — the same measured-not-assumed
contract as ops/pallas_features.py and ops/pallas_conv.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = 1e-6


def _ffn_kernel(x_ref, s_ref, sb_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref):
    x = x_ref[:]                                       # (rb, T, D)
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu
    y = (xf - mu) * jax.lax.rsqrt(var + EPS)
    y = y * s_ref[:] + sb_ref[:]                       # (1, 1, D) affine
    dn = (((2,), (0,)), ((), ()))
    h = jax.lax.dot_general(y.astype(jnp.bfloat16),
                            w1_ref[:].astype(jnp.bfloat16), dn,
                            preferred_element_type=jnp.float32)
    h = h + b1_ref[:]
    h = h * jax.nn.sigmoid(h)                          # SiLU
    o = jax.lax.dot_general(h.astype(jnp.bfloat16),
                            w2_ref[:].astype(jnp.bfloat16), dn,
                            preferred_element_type=jnp.float32)
    o = o + b2_ref[:]
    o_ref[:] = (xf + 0.5 * o).astype(o_ref.dtype)


def _pick_rb(b: int, t: int, d_ff: int) -> int:
    """Rows per program under a ~14 MB fp32 working-set budget."""
    rb = b
    while rb > 1 and (rb % 2 == 0) and rb * t * d_ff * 4 * 2 > 14 * 2 ** 20:
        rb //= 2
    while b % rb:
        rb -= 1
    return rb


@functools.lru_cache(maxsize=None)
def _ffn_partitioned(interpret):
    from tpu_asr.parallel.kernel_sharding import batch_partitioned

    def fun(x, s, sb, w1, b1, w2, b2):
        b, t, d = x.shape
        d_ff = w1.shape[1]
        tp = (t + 7) // 8 * 8
        x_p = jnp.pad(x, ((0, 0), (0, tp - t), (0, 0)))
        rb = _pick_rb(b, tp, d_ff)
        row3 = lambda v: v[None, None, :]
        mat = lambda wdim: pl.BlockSpec(wdim, lambda i: (0, 0),
                                        memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            _ffn_kernel,
            grid=(b // rb,),
            in_specs=[
                pl.BlockSpec((rb, tp, d), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, d), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, d), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                mat((d, d_ff)),
                pl.BlockSpec((1, 1, d_ff), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                mat((d_ff, d)),
                pl.BlockSpec((1, 1, d), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((rb, tp, d), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, tp, d), x.dtype),
            cost_estimate=pl.CostEstimate(
                flops=4 * b * tp * d * d_ff,
                bytes_accessed=4 * b * tp * d,
                transcendentals=b * tp * d_ff,
            ),
            interpret=interpret,
        )(x_p, row3(s), row3(sb), w1, b1[None, None, :], w2,
          b2[None, None, :])
        return out[:, :t]

    specs = ((3, 0),) + ((3, None),) * 2 + ((2, None), (3, None),
                                            (2, None), (3, None))
    return batch_partitioned(fun, specs, ((3, 0),), tuple_out=False)


def fused_ffn_sublayer(
    x: jnp.ndarray,              # (B, T, D) sublayer input (pre-LN)
    ln_scale: jnp.ndarray,       # (D,)
    ln_bias: jnp.ndarray,        # (D,)
    w1: jnp.ndarray,             # (D, d_ff) linear1 kernel
    b1: jnp.ndarray,             # (d_ff,)
    w2: jnp.ndarray,             # (d_ff, D) linear2 kernel
    b2: jnp.ndarray,             # (D,)
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns x + 0.5 * FFN(LN(x)) in x.dtype. Eval-path only (no dropout,
    no custom VJP) — callers gate on deterministic passes."""
    f32 = jnp.float32
    cdt = x.dtype
    return _ffn_partitioned(interpret)(
        x, ln_scale.astype(f32), ln_bias.astype(f32), w1.astype(cdt),
        b1.astype(f32), w2.astype(cdt), b2.astype(f32))
