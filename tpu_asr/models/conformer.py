"""Conformer encoder — TPU-native rebuild of NeMo's ConformerEncoder.

Reference: NeMo/nemo/collections/asr/modules/conformer_encoder.py (module wiring
:371-448, layer loop :595-761; the ConformerLayer / rel-pos attention / subsampling
submodules are stripped from the snapshot — semantics reconstructed from their call
sites and public Conformer knowledge, and pinned by this repo's parity tests).

TPU-first design decisions (vs. the reference's per-layer Python loop + forward hooks):
- The 16-layer stack runs under `flax.linen.scan` with stacked per-layer params: one
  compiled layer body, all-layer features returned as the scan's stacked outputs —
  this replaces the reference's `register_forward_hook` feature capture
  (asr_train.py:528-541) with a functional, jit-friendly equivalent.
- Internally everything is (B, T, D) with static shapes; padding handled by masks.
- Relative-position attention uses the Transformer-XL pad-reshape shift; attention
  runs in the configured compute dtype (bf16 on TPU) with fp32 softmax accumulation.
- BatchNorm in the conv module reduces over the *global* batch under pjit (the mean
  over a data-sharded axis lowers to an ICI psum), which reproduces the reference's
  sync_batchnorm (conformer_ctc_bpe.yaml:209) with zero extra code.
- The reference's `torch.distributed.all_reduce(MAX)` global max-seq-len sync
  (conformer_encoder.py:763-781) is unnecessary: shapes are static.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tpu_asr.config import EncoderConfig


def subsampled_length(length: jnp.ndarray, factor: int = 4,
                      subsampling: str = "striding") -> jnp.ndarray:
    """Frame count after pre-encode subsampling. striding/dw_striding
    (k=3, s=2, p=1 per stage): L -> floor((L - 1) / 2) + 1, applied
    log2(factor) times; stacking pads then stacks: ceil(L / factor);
    factor <= 1 (Linear pre-encode): unchanged."""
    if factor <= 1 or not subsampling:
        return length
    if subsampling in ("stacking", "stacking_norm"):
        return -(-length // factor)
    n_stages = int(math.log2(factor))
    for _ in range(n_stages):
        length = (length - 1) // 2 + 1
    return length


class ConvSubsampling(nn.Module):
    """Pre-encode module (NeMo conformer_encoder.py:371-392 dispatch):
    `striding` — 2x [Conv2d(k=3,s=2,p=1) + ReLU] over (T, F) then a Linear
    projection of the flattened (C, F/4) features to d_model;
    `dw_striding` — first stage a regular conv, later stages depthwise +
    pointwise pairs (NeMo ConvSubsampling dw_striding);
    `stacking`/`stacking_norm` — pad T to a multiple of the factor, stack
    factor frames, (optional LayerNorm,) Linear (NeMo StackingSubsampling);
    factor <= 1 — a plain Linear(feat_in -> d_model)."""

    cfg: EncoderConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # x: (B, T, F) -> (B, T, F, 1) NHWC
        c = self.cfg
        if c.subsampling_factor <= 1 or not c.subsampling:
            return nn.Dense(c.d_model, dtype=self.dtype, name="out")(
                x.astype(self.dtype))
        if c.subsampling in ("stacking", "stacking_norm"):
            b, t, f = x.shape
            fac = c.subsampling_factor
            pad = (-t) % fac
            h = jnp.pad(x.astype(self.dtype), ((0, 0), (0, pad), (0, 0)))
            h = h.reshape(b, (t + pad) // fac, fac * f)
            if c.subsampling == "stacking_norm":
                h = nn.LayerNorm(dtype=self.dtype, name="pre_norm")(h)
            return nn.Dense(c.d_model, dtype=self.dtype, name="out")(h)
        if c.subsampling not in ("striding", "dw_striding"):
            raise ValueError(f"unknown subsampling: {c.subsampling!r}")
        n_stages = int(math.log2(c.subsampling_factor))

        backend = getattr(c, "subsampling_backend", "auto")
        # The fused kernel's scoped-VMEM working set grows ~linearly in
        # conv_channels (measured on v5e: C=240 fits, C=256 needs 16.64M
        # against the 16M limit) — and at C>=256 the plain XLA convs are
        # already MXU-friendly (channels a lane multiple), so the kernel
        # only targets small-C models like the d176 teacher.
        fused_ok = (c.subsampling == "striding" and n_stages == 2
                    and not c.causal_downsampling and x.shape[-1] == 80
                    and c.conv_channels % 8 == 0 and c.conv_channels <= 240)
        if backend == "auto":
            backend = ("pallas" if (fused_ok and
                                    jax.default_backend() == "tpu")
                       else "xla")
        if backend == "pallas":
            if not fused_ok:
                raise ValueError(
                    "subsampling_backend='pallas' requires striding x4 "
                    "subsampling, symmetric padding, 80 mel features, and "
                    "conv_channels <= 240 (VMEM working-set limit)")
            ch = c.conv_channels
            w1, b1 = _Conv2dParams(ch, 1, name="conv0")()
            w2, b2 = _Conv2dParams(ch, ch, name="conv1")()
            f_out = x.shape[-1] // 4
            w, bias = _DenseParams(c.d_model, ch * f_out, name="out")()
            w_fc = w.reshape(ch, f_out, c.d_model).transpose(1, 0, 2).reshape(
                f_out * ch, c.d_model)
            from tpu_asr.ops.pallas_subsampling import fused_subsampling
            h = fused_subsampling(x, w1, b1, w2, b2, w_fc)
            return (h.astype(self.dtype)
                    + bias.astype(self.dtype)).astype(self.dtype)

        h = x[..., None].astype(self.dtype)
        # `causal_downsampling` (NeMo conformer_encoder.py:389 CausalConv2D):
        # left-only time padding (2, 0) keeps every output frame a function of
        # past inputs only, with the SAME length contract as the symmetric pad
        # (floor((L-1)/2)+1) — the streaming pre-encode cache recompute relies
        # on this translation covariance (see models/streaming.py).
        t_pad = (2, 0) if c.causal_downsampling else (1, 1)
        for i in range(n_stages):
            if c.subsampling == "dw_striding" and i > 0:
                # depthwise k=3 s=2 + pointwise 1x1 (NeMo dw_striding
                # stages after the first; first stage has 1 input channel,
                # so depthwise would be pointless there)
                h = nn.Conv(
                    features=c.conv_channels, kernel_size=(3, 3),
                    strides=(2, 2), padding=(t_pad, (1, 1)),
                    feature_group_count=c.conv_channels,
                    dtype=self.dtype, name=f"dw_conv{i}")(h)
                h = nn.Conv(features=c.conv_channels, kernel_size=(1, 1),
                            dtype=self.dtype, name=f"pw_conv{i}")(h)
            else:
                h = nn.Conv(
                    features=c.conv_channels,
                    kernel_size=(3, 3),
                    strides=(2, 2),
                    padding=(t_pad, (1, 1)),
                    dtype=self.dtype,
                    name=f"conv{i}",
                )(h)
            h = nn.relu(h)
        b, t, f, ch = h.shape
        # NeMo flattens (C, F) channel-major before its `out` Linear; the
        # param keeps that row order (checkpoint-layout contract,
        # conformer_encoder.py:371-392) but the PERMUTATION is folded into
        # the kernel instead of transposing the (B, T, F, C) activation —
        # the activation transpose materialized as a 0.25 ms layout copy per
        # step on v5e (trace: copy.41), vs ~2.5 MB of extra weight traffic.
        w, bias = _DenseParams(c.d_model, ch * f, name="out")()
        w_fc = w.reshape(ch, f, c.d_model).transpose(1, 0, 2).reshape(
            f * ch, c.d_model)
        h = h.reshape(b, t, f * ch)
        return (h @ w_fc.astype(self.dtype)
                + bias.astype(self.dtype)).astype(self.dtype)


def rel_positional_encoding(t: int, d_model: int, dtype=jnp.float32,
                            cache_len: int = 0) -> jnp.ndarray:
    """Relative sinusoidal PE for positions [t-1+cache_len .. -(t-1)], shape
    (cache_len + 2t - 1, d_model).

    Matches NeMo RelPositionalEncoding.create_pe (descending positions); the
    `cache_len` extension covers the cached left context in cache-aware
    streaming (NeMo pos_enc(x, cache_len) — conformer_encoder.py:668)."""
    positions = np.arange(t - 1 + cache_len, -t, -1, dtype=np.float32)[:, None]
    div = np.exp(np.arange(0, d_model, 2, dtype=np.float32) * -(math.log(10000.0) / d_model))
    pe = np.zeros((cache_len + 2 * t - 1, d_model), dtype=np.float32)
    pe[:, 0::2] = np.sin(positions * div)
    pe[:, 1::2] = np.cos(positions * div)
    return jnp.asarray(pe, dtype=dtype)


def rel_shift(x: jnp.ndarray, t_kv: Optional[int] = None) -> jnp.ndarray:
    """Transformer-XL relative shift, generalized to rectangular attention.

    x: (B, H, Tq, P) with P = Tq + Tkv - 1, where x[b,h,t,j] scores query t
    against relative position (P - 1 - j) - (Tq - 1) = Tkv - 1 - j... indexed so
    that row j corresponds to relative distance (q_global - k_global) of
    (Tq - 1 + (Tkv - Tq)) - j. Output: (B, H, Tq, Tkv) with
    output[b,h,t,s] = x[b,h,t, Tq - 1 - t + s] — i.e. key s at distance
    (t + C) - s for a cache of C = Tkv - Tq frames prepended to the queries.

    The square case (Tkv == Tq, P == 2T-1) is NeMo's rel_shift.
    """
    b, h, t, p = x.shape
    if t_kv is None:
        t_kv = p - t + 1
    assert p == t + t_kv - 1, (p, t, t_kv)
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 0)))        # (B,H,T,P+1)
    x = x.reshape(b, h, p + 1, t)
    x = x[:, :, 1:, :].reshape(b, h, t, p)
    return x[:, :, :, :t_kv]


class _PosKernel(nn.Module):
    """Bare (d_in, features) kernel under the same param path/init as a
    bias-free nn.Dense — lets the Pallas attention consume the linear_pos
    weight directly while the XLA path applies it as a matmul."""

    features: int
    d_in: int

    @nn.compact
    def __call__(self) -> jnp.ndarray:
        return self.param("kernel", nn.initializers.lecun_normal(),
                          (self.d_in, self.features), jnp.float32)


class RelPositionMultiHeadAttention(nn.Module):
    """Multi-head attention with Transformer-XL relative position encoding and
    (optionally untied) u/v biases — NeMo RelPositionMultiHeadAttention contract."""

    d_model: int
    n_heads: int
    dropout_rate: float = 0.0
    dtype: Any = jnp.float32
    # (left, right) frames of attention context; -1 = unlimited. NeMo's
    # `att_context_size` / rel_pos_local_attn (conformer_encoder.py:92-156).
    att_context_size: Tuple[int, int] = (-1, -1)
    # 'regular' | 'chunked_limited' (aligned-chunk mask, conformer_encoder.py:805-824)
    att_context_style: str = "regular"
    # longformer-style global attention over the local window
    # (conformer_encoder.py:456-458; the stripped
    # RelPositionMultiHeadAttentionLongformer — semantics reconstructed):
    # tokens at positions i*spacing (i < global_tokens) attend to and are
    # attended by every position, escaping the sliding window.
    global_tokens: int = 0
    global_tokens_spacing: int = 1
    # separate q/k/v projections for the global-attention scores/values
    global_attn_separate: bool = False
    # 'xla' | 'pallas' | 'auto': fused VMEM-resident attention kernel for
    # deterministic (inference) passes on TPU; XLA path for training/CPU.
    attention_backend: str = "auto"

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,            # (B, T, D)
        pos_emb: jnp.ndarray,      # (C + 2T-1, D), C = cache length (0 offline)
        mask: jnp.ndarray,         # (B, T) bool, True = valid
        deterministic: bool = True,
        kv_cache: Optional[jnp.ndarray] = None,   # (B, C, D) right-aligned history
        kv_valid: Optional[jnp.ndarray] = None,   # (B,) valid frames in kv_cache
        seg_id: Optional[jnp.ndarray] = None,     # (B, T) int32, 0 = invalid
    ) -> jnp.ndarray:
        """`seg_id` enables packed-segment attention (multiple utterances per
        row, serving path): query t may attend key s iff seg_id[t] == seg_id[s]
        and seg_id[s] > 0. Relative-position scores are translation-invariant,
        so within-segment semantics match the per-utterance forward exactly.
        Valid only for the offline 'regular' style (no kv_cache, no chunked
        mask, no global tokens — their masks are row-absolute)."""
        d, h = self.d_model, self.n_heads
        dk = d // h
        b, t, _ = x.shape

        # Cache-aware streaming (NeMo conformer_encoder.py:523-546 call chain):
        # the per-layer `cache_last_channel` holds the last C post-LN attention
        # INPUTS; keys/values are computed over [cache; x] while queries cover
        # only the current chunk. Equivalent to NeMo's
        # `key = value = cat([cache, key])` in MultiHeadAttention.update_cache.
        kv_in = x if kv_cache is None else jnp.concatenate(
            [kv_cache.astype(x.dtype), x], axis=1)
        t_kv = kv_in.shape[1]

        # Projections as raw (kernel, bias) params under the same paths/inits
        # as the nn.Dense modules they replace (checkpoint-layout contract):
        # the block-fused Pallas kernel consumes the weights directly, the
        # XLA paths apply them as the matmuls Dense would have emitted.
        wq_k, bq_b = _DenseParams(d, d, name="linear_q")()
        wk_k, bk_b = _DenseParams(d, d, name="linear_k")()
        wv_k, bv_b = _DenseParams(d, d, name="linear_v")()
        wo_k, bo_b = _DenseParams(d, d, name="linear_out")()
        w_pos = _PosKernel(d, d, name="linear_pos")()
        bias_u = self.param("pos_bias_u", nn.initializers.zeros, (h, dk), jnp.float32)
        bias_v = self.param("pos_bias_v", nn.initializers.zeros, (h, dk), jnp.float32)

        if seg_id is not None and (self.att_context_style != "regular"
                                   or self.global_tokens > 0
                                   or kv_cache is not None):
            raise ValueError(
                "packed-segment attention (seg_id) supports only the offline "
                "'regular' attention style without global tokens")
        backend = self.attention_backend
        if backend == "auto":
            # fused kernel for BOTH inference and training on TPU (its custom
            # VJP is a fused Pallas backward; attention dropout runs in-kernel)
            backend = ("pallas" if (self.att_context_style == "regular" and
                                    self.global_tokens == 0 and
                                    kv_cache is None and
                                    jax.default_backend() == "tpu") else "xla")
        if backend == "pallas" and kv_cache is None:
            # The fused kernel implements ONLY the 'regular' (sliding-window)
            # attention semantics; chunked_limited and longformer global
            # tokens silently diverge — refuse rather than mis-attend.
            if self.att_context_style != "regular" or self.global_tokens > 0:
                raise ValueError(
                    "attention_backend='pallas' supports only "
                    "att_context_style='regular' with global_tokens=0 "
                    f"(got style={self.att_context_style!r}, "
                    f"global_tokens={self.global_tokens}); use "
                    "attention_backend='xla' for chunked/global attention")
            from tpu_asr.ops.pallas_attention import fused_relpos_attention_block
            rate, seed = 0.0, None
            if not deterministic and self.dropout_rate > 0.0:
                rate = self.dropout_rate
                seed = jax.random.randint(self.make_rng("dropout"), (1,),
                                          0, jnp.iinfo(jnp.int32).max)
            # TPU_ASR_PALLAS_INTERPRET=1 runs the Mosaic kernel through the
            # Pallas interpreter so the IN-MODEL pallas path executes on the
            # CPU stand-in too (multichip dryrun gate, __graft_entry__.py).
            # Read at trace time, like attention_backend itself.
            import os
            out = fused_relpos_attention_block(
                x.astype(self.dtype), wq_k, bq_b, wk_k, bk_b, wv_k, bv_b,
                bias_u, bias_v, w_pos.reshape(d, h, dk), wo_k, mask,
                n_heads=h, att_context_size=self.att_context_size,
                dropout_rate=rate, dropout_seed=seed, seg_id=seg_id,
                interpret=os.environ.get("TPU_ASR_PALLAS_INTERPRET") == "1")
            return (out + bo_b.astype(self.dtype)).astype(self.dtype)

        proj = lambda z, w, bb: (z.astype(self.dtype) @ w.astype(self.dtype)
                                 + bb.astype(self.dtype))
        q = proj(x, wq_k, bq_b)
        k = proj(kv_in, wk_k, bk_b)
        v = proj(kv_in, wv_k, bv_b)
        p = pos_emb.astype(self.dtype) @ w_pos.astype(self.dtype)

        q = q.reshape(b, t, h, dk)
        k = k.reshape(b, t_kv, h, dk)
        v = v.reshape(b, t_kv, h, dk)
        p = p.reshape(-1, h, dk)                               # (C+2T-1, H, dk)

        q_u = q + bias_u.astype(q.dtype)[None, None]
        q_v = q + bias_v.astype(q.dtype)[None, None]

        if kv_cache is not None:
            c_len = kv_cache.shape[1]
            # key-side validity: cache is right-aligned (newest frame last)
            cache_ok = jnp.arange(c_len)[None, :] >= (c_len - kv_valid[:, None])
            kv_mask = jnp.concatenate([cache_ok, mask], axis=1)     # (B, C+T)
            neg = jnp.asarray(-30000.0 if self.dtype == jnp.bfloat16 else -1.0e30,
                              self.dtype)
            ac = jnp.einsum("bthd,bshd->bhts", q_u, k,
                            preferred_element_type=jnp.float32).astype(self.dtype)
            bd = jnp.einsum("bthd,phd->bhtp", q_v, p,
                            preferred_element_type=jnp.float32).astype(self.dtype)
            bd = rel_shift(bd, t_kv=t_kv)
            scores = (ac + bd) / math.sqrt(dk)
            scores = scores + jnp.where(kv_mask, 0.0, neg)[:, None, None, :]
            attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
            out = jnp.einsum("bhts,bshd->bthd", attn.astype(v.dtype), v,
                             preferred_element_type=jnp.float32)
            out = out.reshape(b, t, d).astype(self.dtype)
            return proj(out, wo_k, bo_b)

        # Content score (B, H, T, T) and position score (B, H, T, 2T-1):
        # accumulate in fp32 on the MXU but MATERIALIZE in the compute dtype —
        # these are the encoder's largest intermediates (the bd tensor is
        # ~2x the score matrix) and dominate HBM traffic at ASR sizes.
        ac = jnp.einsum("bthd,bshd->bhts", q_u, k,
                        preferred_element_type=jnp.float32).astype(self.dtype)
        bd = jnp.einsum("bthd,phd->bhtp", q_v, p,
                        preferred_element_type=jnp.float32).astype(self.dtype)
        bd = rel_shift(bd)

        # Additive key-side mask (B, 1, 1, T): one broadcast add instead of
        # two full (B, H, T, T) `where` passes. Padded QUERY rows produce
        # garbage attention but every layer output is re-masked (ConformerLayer
        # zeroes padded positions), so no post-softmax zeroing is needed.
        neg = jnp.asarray(-30000.0 if self.dtype == jnp.bfloat16 else -1.0e30,
                          self.dtype)
        if seg_id is not None:
            # packed-segment block mask: key s visible from query t iff both
            # belong to the same segment (seg 0 = guard/pad, key-invalid).
            # Guard-query rows see no valid key -> uniform garbage attention,
            # re-masked by the layer output zeroing like padded rows.
            pair_ok = (seg_id[:, :, None] == seg_id[:, None, :]) & mask[:, None, :]
            key_bias = jnp.where(pair_ok, 0.0, neg)[:, None]    # (B, 1, T, T)
        else:
            key_bias = jnp.where(mask, 0.0, neg)[:, None, None, :]
        scores = (ac + bd) / math.sqrt(dk) + key_bias
        left, right = self.att_context_size
        if self.att_context_style == "chunked_limited" and right >= 0:
            # aligned-chunk mask (conformer_encoder.py:805-824): query chunk i
            # sees key chunks [i - left_chunks, i]; chunk size = right + 1.
            chunk = right + 1
            left_chunks = (left // chunk) if left >= 0 else t  # "unlimited"
            cidx = jnp.arange(t) // chunk
            diff = cidx[:, None] - cidx[None, :]               # q_chunk - k_chunk
            local_ok = (diff >= 0) & (diff <= left_chunks)
            scores = scores + jnp.where(local_ok, 0.0, neg)[None, None]
        elif left >= 0 or right >= 0:
            # sliding-window ('regular') limited context: key s visible from
            # query t iff -left <= s - t <= right
            rel = (jnp.arange(t)[None, :] - jnp.arange(t)[:, None])  # s - t
            local_ok = jnp.ones((t, t), bool)
            if left >= 0:
                local_ok &= rel >= -left
            if right >= 0:
                local_ok &= rel <= right
            if self.global_tokens > 0:
                # longformer global tokens: rows/columns of global positions
                # escape the sliding window entirely
                pos = jnp.arange(t)
                is_glob = ((pos % self.global_tokens_spacing == 0) &
                           (pos < self.global_tokens * self.global_tokens_spacing))
                glob_pair = is_glob[:, None] | is_glob[None, :]
                local_ok |= glob_pair
                if self.global_attn_separate:
                    # separate projections score the global links
                    qg = nn.Dense(d, dtype=self.dtype, name="linear_q_global")(x)
                    kg = nn.Dense(d, dtype=self.dtype, name="linear_k_global")(kv_in)
                    vg = nn.Dense(d, dtype=self.dtype, name="linear_v_global")(kv_in)
                    qg = qg.reshape(b, t, h, dk) + bias_u.astype(q.dtype)[None, None]
                    kg = kg.reshape(b, t_kv, h, dk)
                    g_scores = jnp.einsum(
                        "bthd,bshd->bhts", qg, kg,
                        preferred_element_type=jnp.float32).astype(self.dtype)
                    g_scores = g_scores / math.sqrt(dk) + key_bias
                    scores = jnp.where(glob_pair[None, None], g_scores, scores)
                    v = jnp.where(is_glob[None, :, None, None],
                                  vg.reshape(b, t_kv, h, dk), v)
            scores = scores + jnp.where(local_ok, 0.0, neg)[None, None]
        attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
        if self.dropout_rate > 0.0 and not deterministic:
            attn = nn.Dropout(self.dropout_rate, deterministic=False)(attn)
        out = jnp.einsum("bhts,bshd->bthd", attn.astype(v.dtype), v,
                         preferred_element_type=jnp.float32)
        out = out.reshape(b, t, d).astype(self.dtype)
        return proj(out, wo_k, bo_b)


class MaskedBatchNorm(nn.Module):
    """BatchNorm1d over (B, T) per channel, reference-faithful: statistics include
    padded (zeroed) positions, exactly like NeMo's nn.BatchNorm1d in the conv module.
    Under pjit data parallelism the batch mean is a global mean (ICI psum), which
    reproduces Lightning's sync_batchnorm.

    `fold_only=True` skips the normalization and returns the eval-mode
    per-channel (w, b) affine instead — the fused Pallas conv module
    (ops/pallas_conv.py) applies it in-kernel."""

    features: int
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, use_running_average: bool,
                 fold_only: bool = False):
        # x: (B, T, C)
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros(self.features, jnp.float32))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones(self.features, jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)

        if fold_only:
            inv = jax.lax.rsqrt(ra_var.value + self.epsilon)
            return scale * inv, bias - ra_mean.value * scale * inv

        if use_running_average:
            # fold into one fused multiply-add in the compute dtype: the
            # per-channel affine is exact algebra over fp32 SCALARS, so no
            # fp32 tensor passes are needed at inference
            inv = jax.lax.rsqrt(ra_var.value + self.epsilon)
            w = (scale * inv).astype(self.dtype)
            b2 = (bias - ra_mean.value * scale * inv).astype(self.dtype)
            return x.astype(self.dtype) * w[None, None] + b2[None, None]
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(0, 1))
        var = jnp.mean(jnp.square(xf - mean[None, None]), axis=(0, 1))
        if not self.is_initializing():
            n = x.shape[0] * x.shape[1]
            unbiased = var * n / max(n - 1, 1)
            ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
            ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * unbiased
        inv = jax.lax.rsqrt(var + self.epsilon)
        y = (xf - mean[None, None]) * inv[None, None]
        return (y * scale[None, None] + bias[None, None]).astype(self.dtype)


class _DenseParams(nn.Module):
    """Raw (kernel, bias) under the same param paths/inits as nn.Dense."""

    features: int
    d_in: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (self.d_in, self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
        return k, b


class _Conv2dParams(nn.Module):
    """Raw 3x3 Conv2d (kernel (3,3,in,out) HWIO, bias) under nn.Conv's
    param paths, shapes, and lecun_normal fan computation."""

    features: int
    in_ch: int

    @nn.compact
    def __call__(self):
        kern = self.param("kernel", nn.initializers.lecun_normal(),
                          (3, 3, self.in_ch, self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
        return kern, b


class _ConvParams(nn.Module):
    """Raw depthwise-conv (kernel (k,1,d), bias) matching nn.Conv's paths,
    shapes, and lecun_normal fan computation."""

    k: int
    features: int

    @nn.compact
    def __call__(self):
        kern = self.param("kernel", nn.initializers.lecun_normal(),
                          (self.k, 1, self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
        return kern, b


class _ScaleBias(nn.Module):
    """Raw LayerNorm (scale, bias) under nn.LayerNorm's param paths."""

    features: int

    @nn.compact
    def __call__(self):
        s = self.param("scale", nn.initializers.ones, (self.features,),
                       jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
        return s, b


class ConformerConvolution(nn.Module):
    """Conformer conv module: pointwise(d->2d) + GLU -> depthwise(k) -> BN/LN -> SiLU
    -> pointwise(d->d). Padded positions are zeroed before the depthwise conv.

    Weights are declared as raw params (same tree paths/inits as the
    nn.Dense/nn.Conv/nn.LayerNorm modules they mirror) so deterministic
    passes can run the whole module as ONE Pallas kernel
    (ops/pallas_conv.py); training and streaming keep the XLA math."""

    cfg: EncoderConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray, train: bool,
                 deterministic: bool = True,
                 time_cache: Optional[jnp.ndarray] = None):
        c = self.cfg
        d = c.d_model
        pad_l, pad_r = c.conv_context
        w1, b1 = _DenseParams(2 * d, d, name="pointwise_conv1")()
        wd3, bd = _ConvParams(c.conv_kernel_size, d, name="depthwise_conv")()
        w2, b2 = _DenseParams(d, d, name="pointwise_conv2")()
        if c.conv_norm_type == "batch_norm":
            bn = MaskedBatchNorm(d, dtype=self.dtype, name="batch_norm")
        elif c.conv_norm_type == "layer_norm":
            ln_scale, ln_bias = _ScaleBias(d, name="norm")()
        else:
            raise ValueError(f"unknown conv_norm_type: {c.conv_norm_type}")

        backend = c.conv_backend
        if backend == "auto":
            # measured, not assumed: the fused kernel benches SLOWER than
            # XLA's own fusion of this module on v5e (2.87 vs 2.28 ms across
            # 16 layers, B=32 x 15 s eval) — XLA already keeps the module
            # fused; the kernel stays available as conv_backend='pallas'
            # (parity-tested) in case the balance differs on other topologies
            backend = "xla"
        if backend == "pallas" and (train or time_cache is not None
                                    or d % 128 == 0):
            backend = "xla"          # kernel is eval-only (live BN/autodiff)
        if backend == "pallas":
            # one VMEM-resident kernel for the whole module (eval only:
            # training needs live BN batch stats + autodiff)
            from tpu_asr.ops.pallas_conv import fused_conv_module
            if c.conv_norm_type == "batch_norm":
                nw, nb = bn(x, use_running_average=True, fold_only=True)
                norm = "affine"
            else:
                nw, nb, norm = ln_scale, ln_bias, "layer_norm"
            return fused_conv_module(
                x, mask, w1, b1, wd3[:, 0, :], bd, nw, nb, w2, b2,
                pad_l=pad_l, norm=norm)

        dt = self.dtype
        # NOTE: quantization='int8' deliberately does NOT touch this module.
        # Measured on v5e at production dims (d512 x 18L, B=32 x 15 s): the
        # XLA int8 path for the two pointwise matmuls LOST 0.67 ms/step —
        # the act-quant/dequant HBM round-trips exceed the MXU int8 gain at
        # these matmul sizes. int8 serving lives in the fused FFN kernel
        # (ops/pallas_ffn.py::fused_ffn_sublayer_int8), where the quant
        # chain stays in VMEM.
        h = x.astype(dt) @ w1.astype(dt) + b1.astype(dt)
        h = nn.glu(h, axis=-1)                                  # (B, T, d)
        h = jnp.where(mask[..., None], h, 0.0)
        new_cache = None
        if time_cache is not None:
            # cache-aware streaming (NeMo CausalConv1D cache, used at
            # conformer_encoder.py:646-658): the cache holds the last `pad_l`
            # post-GLU inputs; prepend them instead of zero padding so the
            # depthwise conv is seamless across chunk boundaries. Requires a
            # causal kernel (pad_r == 0).
            assert pad_r == 0, "streaming conv requires conv_context_size='causal'"
            h = jnp.concatenate([time_cache.astype(h.dtype), h], axis=1)
            # per-sample roll: a partial chunk (valid v < T, batched
            # unequal-length streams) must not push its zeroed pad frames
            # into the cache — take the pad_l frames ENDING at each
            # sample's last valid frame (cache start = pad_l + v - pad_l
            # = v; the static [-pad_l:] slice is the v == T special case)
            v = jnp.sum(mask.astype(jnp.int32), axis=1)
            j = v[:, None] + jnp.arange(pad_l)[None, :]
            new_cache = jnp.take_along_axis(h, j[:, :, None], axis=1)
            pad_l = 0
        # depthwise conv over time (the lax call nn.Conv lowers to)
        h = jax.lax.conv_general_dilated(
            h.astype(dt), wd3.astype(dt), window_strides=(1,),
            padding=((pad_l, pad_r),), feature_group_count=d,
            dimension_numbers=("NWC", "WIO", "NWC")) + bd.astype(dt)
        if c.conv_norm_type == "batch_norm":
            h = bn(h, use_running_average=not train)
        else:
            # nn.LayerNorm semantics: fp32 stats (fast variance), eps 1e-6
            hf = h.astype(jnp.float32)
            mean = jnp.mean(hf, axis=-1, keepdims=True)
            var = jnp.maximum(
                jnp.mean(jnp.square(hf), axis=-1, keepdims=True)
                - jnp.square(mean), 0.0)
            hf = (hf - mean) * jax.lax.rsqrt(var + 1e-6)
            h = (hf * ln_scale + ln_bias).astype(dt)
        h = nn.silu(h)
        h = h.astype(dt) @ w2.astype(dt) + b2.astype(dt)
        if time_cache is not None:
            return h, new_cache
        return h


class FeedForward(nn.Module):
    d_model: int
    d_ff: int
    dropout_rate: float
    dtype: Any = jnp.float32
    # 'none' | 'int8' — int8 serving PTQ (ops/quant.py), deterministic
    # passes only; the param tree is identical either way.
    quantization: str = "none"

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True,
                 fused_ln=None) -> jnp.ndarray:
        """`fused_ln=(scale, bias)` routes the WHOLE sublayer (LN + FFN +
        0.5 residual, x being the pre-LN input) through the fused Pallas
        kernel (ops/pallas_ffn.py, eval path); params keep the nn.Dense
        paths either way."""
        if fused_ln is not None:
            w1, b1 = _DenseParams(self.d_ff, self.d_model, name="linear1")()
            w2, b2 = _DenseParams(self.d_model, self.d_ff, name="linear2")()
            if self.quantization == "int8" and deterministic:
                from tpu_asr.ops.pallas_ffn import fused_ffn_sublayer_int8
                return fused_ffn_sublayer_int8(
                    x.astype(self.dtype), fused_ln[0], fused_ln[1],
                    w1, b1, w2, b2)
            rate, seed = 0.0, None
            if not deterministic and self.dropout_rate > 0.0:
                rate = self.dropout_rate
                seed = jax.random.randint(self.make_rng("dropout"), (1,),
                                          0, jnp.iinfo(jnp.int32).max)
            from tpu_asr.ops.pallas_ffn import fused_ffn_sublayer
            return fused_ffn_sublayer(x.astype(self.dtype), fused_ln[0],
                                      fused_ln[1], w1, b1, w2, b2,
                                      dropout_rate=rate, dropout_seed=seed)
        if self.quantization == "int8" and deterministic:
            from tpu_asr.ops.quant import int8_dense
            w1, b1 = _DenseParams(self.d_ff, self.d_model, name="linear1")()
            w2, b2 = _DenseParams(self.d_model, self.d_ff, name="linear2")()
            h = nn.silu(int8_dense(x, w1, b1, out_dtype=self.dtype))
            return int8_dense(h, w2, b2, out_dtype=self.dtype)
        h = nn.Dense(self.d_ff, dtype=self.dtype, name="linear1")(x)
        h = nn.silu(h)
        h = nn.Dropout(self.dropout_rate, deterministic=deterministic)(h)
        return nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(h)


class ConformerLayer(nn.Module):
    """FF(1/2) -> rel-pos MHSA -> conv module -> FF(1/2) -> LN (NeMo ConformerLayer)."""

    cfg: EncoderConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        pos_emb: jnp.ndarray,
        mask: jnp.ndarray,
        train: bool = False,
        cache: Optional[Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]] = None,
        seg_id: Optional[jnp.ndarray] = None,
    ):
        """cache (streaming only): (last_channel (B,C,D), last_channel_len (B,),
        last_time (B,Kl,D)) — per-layer slices of the encoder's stacked caches
        (NeMo conformer_encoder.py:692-707). Returns (x, new_lc, new_lt) when
        given, else x.

        seg_id (packed serving only): (B, T) segment map for packed-segment
        attention; `mask` must equal seg_id > 0 so the per-layer output
        re-masking zeroes the inter-segment guard gaps, which keeps the
        depthwise conv (receptive field ±(k-1)/2) from bleeding across
        segments as long as the packer leaves >= (k-1)/2 guard frames."""
        c = self.cfg
        det = not train
        drop = lambda h: nn.Dropout(c.dropout, deterministic=det)(h)
        # fused FFN sublayer kernel (fwd + custom-VJP bwd, in-kernel
        # dropout). Measured on v5e (B=32 x 15 s, amortized over a long
        # scan): fwd+bwd 210 vs 396 us/sublayer in XLA's favor of the
        # kernel (~1.9x, and the (T, d_ff) activation never hits HBM), but
        # pure fwd 71 vs 67 us — so 'auto' resolves to the kernel for
        # TRAINING and to the XLA path for eval. Both paths share the same
        # param tree (_ScaleBias mirrors nn.LayerNorm's names).
        # int8 serving PTQ: on TPU the whole sublayer runs as the fused
        # int8 kernel (LN + per-token quant + two int8 MXU dots + SiLU +
        # residual in one launch — fused_ffn_sublayer_int8); elsewhere the
        # XLA int8_dense path inside FeedForward carries the same math.
        int8_eval = c.quantization == "int8" and det
        int8_fused = (int8_eval and cache is None
                      and jax.default_backend() == "tpu")
        # 'auto' additionally gates on the kernels fitting scoped VMEM: at
        # production dims (d512/d_ff2048) the flash-bwd's weight-grad
        # partials exceed the budget and training falls back to XLA
        # (explicit 'pallas' raises the kernel's actionable error instead)
        if c.ffn_backend == "auto" and train:
            from tpu_asr.ops.pallas_ffn import ffn_train_kernel_fits
            auto_fits = ffn_train_kernel_fits(
                x.shape[0], x.shape[1], c.d_model, c.d_ff)
        else:
            auto_fits = False
        ffn_fused = cache is None and (int8_fused or (not int8_eval and (
            c.ffn_backend == "pallas"
            or (c.ffn_backend == "auto" and train and auto_fits
                and jax.default_backend() == "tpu"))))
        ffn = lambda name: FeedForward(c.d_model, c.d_ff, c.dropout,
                                       self.dtype, quantization=c.quantization,
                                       name=name)

        if ffn_fused:
            s1, sb1 = _ScaleBias(c.d_model, name="norm_feed_forward1")()
            x = ffn("feed_forward1")(x, det, fused_ln=(s1, sb1))
        else:
            h = nn.LayerNorm(dtype=self.dtype, name="norm_feed_forward1")(x)
            h = ffn("feed_forward1")(h, det)
            x = x + 0.5 * drop(h)

        lc, lc_len, lt = cache if cache is not None else (None, None, None)
        h = nn.LayerNorm(dtype=self.dtype, name="norm_self_att")(x)
        if cache is not None:
            # the channel cache stores post-LN attention inputs; roll in the
            # current chunk (cache_drop_size = 0, chunked_limited streaming).
            # Per-sample valid-count roll: with batched unequal-length
            # streams a partial chunk's pad rows (garbage post-LN values)
            # must stay out of the cache — each sample's window starts at
            # its own valid count v (v == T reduces to the static
            # [T:] slice), keeping validity right-aligned for kv_valid.
            tot = jnp.concatenate([lc, h.astype(lc.dtype)], axis=1)
            vq = jnp.sum(mask.astype(jnp.int32), axis=1)
            jq = vq[:, None] + jnp.arange(lc.shape[1])[None, :]
            new_lc = jnp.take_along_axis(tot, jq[:, :, None], axis=1)
        h = RelPositionMultiHeadAttention(
            c.d_model, c.n_heads, c.dropout_att, self.dtype,
            tuple(c.att_context_size), c.att_context_style,
            global_tokens=c.global_tokens,
            global_tokens_spacing=c.global_tokens_spacing,
            global_attn_separate=c.global_attn_separate,
            attention_backend=c.attention_backend, name="self_attn"
        )(h, pos_emb, mask, deterministic=det, kv_cache=lc, kv_valid=lc_len,
          seg_id=seg_id)
        x = x + drop(h)

        h = nn.LayerNorm(dtype=self.dtype, name="norm_conv")(x)
        h = ConformerConvolution(c, self.dtype, name="conv")(
            h, mask, train, det, time_cache=lt)
        if cache is not None:
            h, new_lt = h
        x = x + drop(h)

        if ffn_fused:
            s2, sb2 = _ScaleBias(c.d_model, name="norm_feed_forward2")()
            x = ffn("feed_forward2")(x, det, fused_ln=(s2, sb2))
        else:
            h = nn.LayerNorm(dtype=self.dtype, name="norm_feed_forward2")(x)
            h = ffn("feed_forward2")(h, det)
            x = x + 0.5 * drop(h)

        x = nn.LayerNorm(dtype=self.dtype, name="norm_out")(x)
        x = jnp.where(mask[..., None], x, 0.0)
        if cache is not None:
            return x, new_lc, new_lt
        return x


class SubsamplingReductionModule(nn.Module):
    """Mid-stack time reduction (NeMo conformer_encoder.py:395-404; the
    SubsamplingReductionModule implementation is stripped from the snapshot —
    reconstructed): 'pooling' = average pool over `factor`-frame groups,
    'striding' = strided Conv1d. Lengths become ceil(len / factor)."""

    reduction: str
    d_model: int
    factor: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, lengths: jnp.ndarray):
        # x: (B, T, D)
        b, t, d = x.shape
        f = self.factor
        pad = (-t) % f
        if self.reduction == "pooling":
            xp = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
            y = xp.reshape(b, (t + pad) // f, f, d).mean(axis=2)
        elif self.reduction == "striding":
            y = nn.Conv(self.d_model, kernel_size=(f,), strides=(f,),
                        padding=((0, pad),), dtype=self.dtype,
                        name="conv")(x.astype(self.dtype))
        else:
            raise ValueError(f"unknown reduction: {self.reduction}")
        new_len = (lengths + f - 1) // f
        return y.astype(x.dtype), new_len


class ConformerEncoder(nn.Module):
    """Full encoder: subsampling -> xscale + rel PE -> scan over ConformerLayers.

    Returns (encoded (B, T', D), lengths (B,), layer_feats (L, B, T', D)) — the
    stacked per-layer outputs replace the reference's forward-hook capture.
    API layout is (B, T, D); use `transpose` at call sites needing NeMo's (B, D, T).
    """

    cfg: EncoderConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        features: jnp.ndarray,      # (B, F, T) log-mel, NeMo layout
        lengths: jnp.ndarray,       # (B,) valid frames
        train: bool = False,
        cache: Optional[Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]] = None,
        drop_extra_pre_encoded: int = 0,
        bypass_pre_encode: bool = False,
        pre_encode_only: bool = False,
        seg_id: Optional[jnp.ndarray] = None,
    ):
        """`cache` enables cache-aware streaming (NeMo conformer_encoder.py
        forward_internal cache path :630-760): a tuple of stacked per-layer
        caches (last_channel (L,B,C,D), last_channel_len (B,), last_time
        (L,B,Kl,D)). The chunk in `features` must include the pre-encode left
        context; `drop_extra_pre_encoded` re-encoded leading frames are dropped
        after subsampling (conformer_encoder.py:646-648). Returns
        (encoded, lengths, layer_feats, new_cache) in streaming mode."""
        c = self.cfg
        if bypass_pre_encode:
            # features are PRE-ENCODED embeddings (B, T, d_model) — skip the
            # pre-encode module and length subsampling (NeMo
            # conformer_encoder.py bypass_pre_encode, :556-574)
            if features.shape[-1] != c.d_model:
                raise ValueError(
                    f"bypass_pre_encode expects (B, T, d_model={c.d_model}) "
                    f"embeddings, got feature dim {features.shape[-1]}")
            x = features.astype(self.dtype)
            out_len = lengths
        else:
            x = jnp.transpose(features, (0, 2, 1))             # (B, T, F)
            x = ConvSubsampling(c, self.dtype, name="pre_encode")(x)
            out_len = subsampled_length(lengths, c.subsampling_factor,
                                        c.subsampling)
        if pre_encode_only:
            # packed-serving split point (see data/packing.py): raw subsampled
            # embeddings BEFORE xscale/dropout/masking — the packed re-entry
            # (bypass_pre_encode=True, seg_id=...) applies those, so gathering
            # valid frames from here into packed rows reproduces the
            # per-utterance forward exactly.
            return x, out_len
        if cache is not None and drop_extra_pre_encoded > 0:
            x = x[:, drop_extra_pre_encoded:, :]
            out_len = jnp.maximum(out_len - drop_extra_pre_encoded, 0)

        b, t, d = x.shape
        if c.xscaling:
            x = x * math.sqrt(c.d_model)
        cache_len = 0 if cache is None else cache[0].shape[2]
        pos_emb = rel_positional_encoding(t, c.d_model, self.dtype, cache_len=cache_len)
        x = nn.Dropout(c.dropout_pre_encoder, deterministic=not train)(x)

        if seg_id is not None:
            if cache is not None:
                raise ValueError("packed-segment encoding (seg_id) is "
                                 "incompatible with streaming caches")
            if c.reduction is not None and c.reduction_factor > 1:
                raise ValueError("packed-segment encoding is incompatible "
                                 "with mid-stack time reduction (pooling "
                                 "would merge frames across segments)")
            mask = seg_id > 0                                  # (B, T)
            out_len = jnp.sum(mask, axis=1).astype(out_len.dtype)
        else:
            mask = jnp.arange(t)[None, :] < out_len[:, None]   # (B, T)
        x = jnp.where(mask[..., None], x, 0.0)

        # optional output projection (NeMo ConformerEncoder feat_out > 0);
        # applied to the FINAL output only — layer_feats stay at d_model
        fo = getattr(c, "feat_out", -1)
        if fo and fo > 0 and fo != c.d_model:
            fin = nn.Dense(fo, dtype=self.dtype, name="out_proj")
        else:
            fin = lambda z: z

        layer = ConformerLayer(c, self.dtype, name="layers")

        if cache is not None:
            lc, lc_len, lt = cache

            def cached_body(mod, carry, xs):
                lc_l, lt_l = xs
                y, new_lc, new_lt = mod(carry, pos_emb, mask, train=False,
                                        cache=(lc_l, lc_len, lt_l))
                return y, (y, new_lc, new_lt)

            scanned = nn.scan(
                cached_body,
                variable_axes={"params": 0, "batch_stats": 0},
                split_rngs={"params": True, "dropout": True, "layerdrop": True},
                length=c.n_layers,
            )
            x, (layer_feats, new_lc, new_lt) = scanned(layer, x, (lc, lt))
            new_len = jnp.minimum(lc_len + out_len, lc.shape[2])
            return fin(x), out_len, layer_feats, (new_lc, new_len, new_lt)

        # stochastic depth (NeMo conformer_encoder.py:699-710): layer l's
        # output is dropped with prob p_l during training, otherwise the
        # residual delta is rescaled by 1/(1-p_l).
        drop_probs = np.zeros(c.n_layers, np.float32)
        if c.stochastic_depth_drop_prob > 0.0:
            p = c.stochastic_depth_drop_prob
            start = c.stochastic_depth_start_layer
            for l in range(start, c.n_layers):
                if c.stochastic_depth_mode == "linear":
                    drop_probs[l] = p * (l + 1 - start) / (c.n_layers - start)
                else:                                   # "uniform"
                    drop_probs[l] = p
        use_sd = train and c.stochastic_depth_drop_prob > 0.0

        def make_body(pos_emb, mask, seg_id=None):
            def body(mod, carry, drop_p):
                y = mod(carry, pos_emb, mask, train=train, seg_id=seg_id)
                if use_sd:
                    u = jax.random.uniform(mod.make_rng("layerdrop"), ())
                    keep = (u >= drop_p).astype(y.dtype)
                    y = carry + keep * (y - carry) / jnp.maximum(
                        (1.0 - drop_p).astype(y.dtype), 1e-6)
                return y, y
            return nn.remat(body, prevent_cse=False) if c.remat else body

        def run_scan(body, mod, x, probs):
            scanned = nn.scan(
                body,
                variable_axes={"params": 0, "batch_stats": 0},
                split_rngs={"params": True, "dropout": True, "layerdrop": True},
                length=len(probs),
            )
            return scanned(mod, x, jnp.asarray(np.asarray(probs)))

        reduce_on = c.reduction is not None and c.reduction_factor > 1
        mid_reduce = reduce_on and 0 <= c.reduction_position < c.n_layers - 1
        if not mid_reduce:
            x, layer_feats = run_scan(make_body(pos_emb, mask, seg_id), layer,
                                      x, drop_probs)
            if reduce_on:      # reduction_position == -1: after the last layer
                x, out_len = SubsamplingReductionModule(
                    c.reduction, c.d_model, c.reduction_factor, self.dtype,
                    name="reduction_subsampling")(x, out_len)
            return fin(x), out_len, layer_feats

        # mid-stack reduction (conformer_encoder.py:712-724): layers 0..pos run
        # at full rate, the stack after `reduction_position` at the reduced
        # rate with a fresh positional encoding and mask. Two scan segments
        # ('layers' / 'layers_post') replace the reference's single ModuleList.
        # layer_feats returns the POST-reduction segment's features.
        n1 = c.reduction_position + 1
        x, _ = run_scan(make_body(pos_emb, mask), layer, x, drop_probs[:n1])
        x, out_len = SubsamplingReductionModule(
            c.reduction, c.d_model, c.reduction_factor, self.dtype,
            name="reduction_subsampling")(x, out_len)
        t2 = x.shape[1]
        pos_emb2 = rel_positional_encoding(t2, c.d_model, self.dtype)
        mask2 = jnp.arange(t2)[None, :] < out_len[:, None]
        x = jnp.where(mask2[..., None], x, 0.0)
        layer_post = ConformerLayer(c, self.dtype, name="layers_post")
        x, layer_feats = run_scan(make_body(pos_emb2, mask2), layer_post, x,
                                  drop_probs[n1:])
        return fin(x), out_len, layer_feats
