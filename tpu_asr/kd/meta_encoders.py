"""Velocity-field ("meta encoder") networks for flow-matching KD.

Rebuilds the five meta-encoder families defined inline in the reference
(asr_train.py:825-1019 and :1244-1279): `mlp`, `cnn`, `swin`, `conformer`, `unet`.
All of them map a time-embedded student feature (B, T, C_in) -> velocity (B, T, C_out).

TPU-first notes:
- Everything operates feature-last (B, T, C); the reference's channel-first torch
  Conv1d layouts become `nn.Conv` over the time axis, which XLA tiles onto the MXU.
- The mini-Conformer block's BatchNorm1d (asr_train.py:944,955) is implemented with
  batch statistics in both train and eval (no running averages): the meta encoder is
  applied inside a `lax.scan` Euler loop where carrying running stats across masked
  iterations would change semantics anyway. Documented deviation.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class MLPMetaEncoder(nn.Module):
    """Linear -> ReLU -> Linear (asr_train.py:1244-1250)."""

    hidden_dim: int
    out_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        h = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        h = nn.relu(h)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="fc2")(h)


class CNNMetaEncoder(nn.Module):
    """Conv1d(k=3) -> ReLU -> Conv1d(k=1) over time (asr_train.py:1251-1257)."""

    out_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        h = nn.Conv(self.out_dim, kernel_size=(3,), padding=((1, 1),),
                    dtype=self.dtype, name="conv1")(x)
        h = nn.relu(h)
        return nn.Conv(self.out_dim, kernel_size=(1,), dtype=self.dtype, name="conv2")(h)


class SwinMetaEncoder(nn.Module):
    """MHA over time + pointwise FFN (asr_train.py:844-866). Despite the name it is a
    plain full-attention block (the reference's `SwinTransformerEncoder` has no
    windowing)."""

    in_dim: int
    out_dim: int
    n_heads: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.n_heads,
            qkv_features=self.in_dim,
            out_features=self.in_dim,
            dtype=self.dtype,
            name="attn",
        )(x, x)
        h = nn.Dense(self.out_dim, dtype=self.dtype, name="linear1")(attn)
        h = nn.relu(h)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="linear2")(h)


class _MetaFeedForward(nn.Module):
    """LN -> Linear(4x) -> SiLU -> Linear (asr_train.py:918-931; dropout omitted in
    the scan-inner meta net, rate 0.1 in reference — applied only when train)."""

    dim: int
    mult: int = 4
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        h = nn.LayerNorm(dtype=self.dtype)(x)
        h = nn.Dense(self.dim * self.mult, dtype=self.dtype)(h)
        h = nn.silu(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.Dense(self.dim, dtype=self.dtype)(h)
        return nn.Dropout(self.dropout, deterministic=not train)(h)


class _BatchStatNorm(nn.Module):
    """BatchNorm over (B, T) using batch statistics (see module docstring)."""

    features: int
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(0, 1))
        var = jnp.var(xf, axis=(0, 1))
        y = (xf - mean) * jnp.reciprocal(jnp.sqrt(var + self.epsilon))
        return (y * scale + bias).astype(x.dtype)


class _MetaConvModule(nn.Module):
    """LN -> pointwise(2x) -> depthwise(k=31) -> BN -> SiLU -> pointwise
    (asr_train.py:932-959). No GLU (unlike the main conformer) — reference-faithful."""

    dim: int
    expansion: int = 2
    kernel_size: int = 31
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        d = self.dim * self.expansion
        h = nn.LayerNorm(dtype=self.dtype)(x)
        h = nn.Conv(d, kernel_size=(1,), dtype=self.dtype, name="pointwise1")(h)
        h = nn.Conv(d, kernel_size=(self.kernel_size,),
                    padding=((self.kernel_size // 2, self.kernel_size // 2),),
                    feature_group_count=d, dtype=self.dtype, name="depthwise")(h)
        h = _BatchStatNorm(d, name="batch_norm")(h)
        h = nn.silu(h)
        h = nn.Conv(self.dim, kernel_size=(1,), dtype=self.dtype, name="pointwise2")(h)
        return nn.Dropout(self.dropout, deterministic=not train)(h)


class _MetaConformerBlock(nn.Module):
    """FF(1/2) -> MHA (abs, no pos enc) -> conv module -> FF(1/2) -> LN
    (asr_train.py:960-997)."""

    dim: int
    n_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        # The reference applies norm_ff1/norm_ff2 BEFORE ff1/ff2 even though
        # FeedForwardModule itself starts with its own LayerNorm — two LNs
        # in a row (asr_train.py:975-979,990-994). Reference-faithful:
        # LN(LN(x)) differs from LN(x) through the first LN's affine.
        h = nn.LayerNorm(dtype=self.dtype, name="norm_ff1")(x)
        x = x + 0.5 * _MetaFeedForward(self.dim, dtype=self.dtype, name="ff1")(h, train)
        h = nn.LayerNorm(dtype=self.dtype, name="mha_norm")(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.n_heads, dtype=self.dtype, name="mha")(h, h)
        x = x + h
        x = x + _MetaConvModule(self.dim, dtype=self.dtype, name="conv")(x, train)
        h = nn.LayerNorm(dtype=self.dtype, name="norm_ff2")(x)
        x = x + 0.5 * _MetaFeedForward(self.dim, dtype=self.dtype, name="ff2")(h, train)
        return nn.LayerNorm(dtype=self.dtype, name="final_norm")(x)


class ConformerMetaEncoder(nn.Module):
    """Input projection + 4 mini conformer blocks (asr_train.py:998-1019)."""

    in_dim: int
    out_dim: int
    n_heads: int
    n_layers: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        h = x
        if self.in_dim != self.out_dim:
            h = nn.Dense(self.out_dim, dtype=self.dtype, name="input_proj")(h)
        for i in range(self.n_layers):
            h = _MetaConformerBlock(self.out_dim, self.n_heads,
                                    dtype=self.dtype, name=f"block{i}")(h, train)
        return h


class UNet1DMetaEncoder(nn.Module):
    """Strided-conv 1D U-Net (asr_train.py:880-916): 4 downs (k=4,s=2,p=1),
    bottleneck (k=3), 4 transposed-conv ups with skip concat, final 1x1.

    Length mismatches between up-path outputs and skips are fixed by right-pad/crop,
    mirroring the reference's F.pad / crop (asr_train.py:911-913).
    """

    base_ch: int
    out_dim: int
    n_layers: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        skips = []
        h = x
        for i in range(self.n_layers):
            h = nn.Conv(self.base_ch * (2 ** i), kernel_size=(4,), strides=(2,),
                        padding=((1, 1),), dtype=self.dtype, name=f"down{i}")(h)
            skips.append(h)
        h = nn.Conv(h.shape[-1], kernel_size=(3,), padding=((1, 1),),
                    dtype=self.dtype, name="bottleneck")(h)
        for i in range(self.n_layers):
            skip = skips.pop()
            if h.shape[1] != skip.shape[1]:
                diff = skip.shape[1] - h.shape[1]
                if diff > 0:
                    h = jnp.pad(h, ((0, 0), (0, diff), (0, 0)))
                else:
                    h = h[:, : skip.shape[1]]
            h = jnp.concatenate([h, skip], axis=-1)
            # torch ConvTranspose1d(k=4, s=2, p=1) doubles the length
            # (L_out = 2*L_in) and equals flax ConvTranspose with padding
            # ((2,2),) — i.e. (k-1-p) per side — and the kernel spatially
            # flipped (verified empirically; flax pad ((1,1)) computes a
            # SHIFTED transposed conv, pinned by tests/test_unet_oracle.py)
            h = nn.ConvTranspose(skip.shape[-1], kernel_size=(4,), strides=(2,),
                                 padding=((2, 2),), dtype=self.dtype, name=f"up{i}")(h)
        out = nn.Conv(self.out_dim, kernel_size=(1,), dtype=self.dtype, name="final")(h)
        # align back to the input length (reference crops/pads after the unet too)
        t_in = x.shape[1]
        if out.shape[1] > t_in:
            out = out[:, :t_in]
        elif out.shape[1] < t_in:
            out = jnp.pad(out, ((0, 0), (0, t_in - out.shape[1]), (0, 0)))
        return out


def build_meta_encoder(meta_encoder_type: str, in_dim: int, out_dim: int,
                       hidden_dim: int, n_heads: int, dtype=jnp.float32,
                       name: str = "meta_encoder") -> nn.Module:
    """Factory mirroring FlowMatchingModule.__init__ dispatch (asr_train.py:1242-1279)."""
    if meta_encoder_type == "mlp":
        return MLPMetaEncoder(hidden_dim, out_dim, dtype, name=name)
    if meta_encoder_type == "cnn":
        return CNNMetaEncoder(out_dim, dtype, name=name)
    if meta_encoder_type == "swin":
        return SwinMetaEncoder(in_dim, out_dim, n_heads, dtype, name=name)
    if meta_encoder_type == "conformer":
        return ConformerMetaEncoder(in_dim, out_dim, n_heads, 4, dtype, name=name)
    if meta_encoder_type == "unet":
        return UNet1DMetaEncoder(hidden_dim, out_dim, 4, dtype, name=name)
    raise ValueError(f"Unknown meta_encoder type: {meta_encoder_type}")
