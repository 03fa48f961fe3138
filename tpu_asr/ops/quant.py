"""Post-training int8 quantization for the serving path.

The v5e MXU runs int8 x int8 -> int32 at ~2x the dense bf16 rate (measured
on this chip: 144 TOPS vs 67 TFLOPs at the conformer-LARGE FFN shape,
M=12032 K=512 N=2048). The catch — measured, not assumed — is that the
quant/dequant chain is pure HBM traffic: lowered through XLA, the per-token
activation quant and int32 dequant round-trips cost as much as the MXU rate
saves (conformer-LARGE FFN: int8-with-XLA-glue 971 us vs bf16 1017 us per
sublayer, while the int8 dots alone run ~2x faster). int8 therefore pays
off only where the whole chain stays VMEM-resident — the fused FFN
sublayer kernel (ops/pallas_ffn.py::fused_ffn_sublayer_int8, ~2 ms/step at
LARGE dims). The conv-module pointwise matmuls measured a NET LOSS through
XLA and stay bf16; XLA's int8 convolutions don't hit the int8 MXU rate at
all (probe: 4.49 vs 4.42 ms at the LARGE conv2 shape), so the subsampling
stack stays bf16 too.

Scheme (standard PTQ, no calibration data needed):
- weights: symmetric per-output-channel int8 (scale = max|w[:, n]| / 127),
  computed IN-GRAPH from the fp params — one cheap VPU reduction per matmul
  per step, so the same checkpoint serves both precisions and nothing new
  is stored. XLA folds it when the weights are literal constants.
- activations: symmetric dynamic per-token int8 (scale = max|x[b, t, :]| /
  127) — a row reduction fused into the surrounding elementwise work.
- accumulation in int32, dequantized as acc * (s_x ⊗ s_w) fp32, bias added
  in fp32.

This is an INFERENCE path: the eval branches of the conformer consult
`EncoderConfig.quantization == 'int8'`; training always runs the fp path
(no straight-through estimator — this is serving PTQ, not QAT). The
attention sublayer keeps the bf16 Pallas block kernel (its score/value
contractions are already at their padded-FLOP roofline and dominate only
at small d_model, where int8 yields little; measured notes in README).

There is no reference equivalent (the reference serves fp32/bf16 torch);
this is a beyond-parity TPU serving feature.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

_EPS = 1e-8


def quantize_weight(w: jnp.ndarray, axis: int = 0):
    """Symmetric per-output-channel int8 quantization of a weight matrix.

    w: (K, N) (or any rank; `axis` is the contraction axis reduced for the
    scale). Returns (w_q int8, scale fp32 with `axis` kept at size 1).
    """
    wf = w.astype(jnp.float32)
    s = jnp.max(jnp.abs(wf), axis=axis, keepdims=True) / 127.0
    s = jnp.maximum(s, _EPS)
    wq = jnp.clip(jnp.round(wf / s), -127, 127).astype(jnp.int8)
    return wq, s


def quantize_activation(x: jnp.ndarray):
    """Symmetric dynamic per-token int8: scale over the last axis."""
    xf = x.astype(jnp.float32)
    s = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
    s = jnp.maximum(s, _EPS)
    xq = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
    return xq, s


def int8_dense(x: jnp.ndarray, w: jnp.ndarray,
               b: Optional[jnp.ndarray] = None,
               out_dtype=None) -> jnp.ndarray:
    """y = x @ w (+ b) with the contraction on the int8 MXU path.

    x: (..., K) float; w: (K, N) float (quantized in-graph, see module
    docstring); b: (N,) or None. Returns (..., N) in `out_dtype`
    (default: x.dtype).
    """
    wq, sw = quantize_weight(w, axis=0)
    xq, sx = quantize_activation(x)
    acc = jax.lax.dot_general(
        xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * sx * sw  # sx (...,1) ⊗ sw (1,N)
    if b is not None:
        out = out + b.astype(jnp.float32)
    return out.astype(out_dtype or x.dtype)
