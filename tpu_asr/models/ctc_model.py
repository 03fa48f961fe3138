"""CTCModel — the EncDecCTCModel(BPE) equivalent: preprocessor -> SpecAugment ->
ConformerEncoder -> ConvASRDecoder, as one flax module whose apply is a pure jittable
function (reference: NeMo ctc_models.py:496-546 forward; ctc_bpe_models.py:42-96).

The preprocessor is stateless JAX closed over filter constants (not a submodule), so
the model's params contain exactly the trainable weights. Returns log-probs, lengths,
greedy ids, plus the encoder output and all-layer features for the KD losses.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpu_asr.config import ModelConfig
from tpu_asr.models.conformer import ConformerEncoder
from tpu_asr.models.decoder import ConvASRDecoder
from tpu_asr.ops.features import FilterbankFeatures
from tpu_asr.ops.specaug import spec_augment


class CTCModelOutput(NamedTuple):
    log_probs: jnp.ndarray        # (B, T', V+1) fp32
    encoded_len: jnp.ndarray      # (B,)
    greedy: jnp.ndarray           # (B, T') argmax token ids
    encoded: jnp.ndarray          # (B, T', D) encoder output
    layer_feats: jnp.ndarray      # (L, B, T', D) per-layer features


class CTCModel(nn.Module):
    cfg: ModelConfig

    def setup(self):
        self.featurizer = FilterbankFeatures(self.cfg.preprocessor)
        dtype = jnp.dtype(self.cfg.compute_dtype)
        self.encoder = ConformerEncoder(self.cfg.encoder, dtype)
        self.decoder = ConvASRDecoder(self.cfg.decoder, dtype)

    def __call__(
        self,
        input_signal: jnp.ndarray,         # (B, L) float32 waveform
        input_signal_length: jnp.ndarray,  # (B,)
        train: bool = False,
    ) -> CTCModelOutput:
        rng = self.make_rng("specaug") if train else None
        feats, feat_len = self.featurizer(
            input_signal, input_signal_length, train=train, rng=rng)
        if train and self.cfg.spec_augment is not None:
            feats = spec_augment(feats, feat_len, self.cfg.spec_augment,
                                 self.make_rng("specaug"))
        return self.forward_features(feats, feat_len, train=train)

    def forward_features(
        self,
        processed_signal: jnp.ndarray,        # (B, F, T) log-mel
        processed_signal_length: jnp.ndarray,
        train: bool = False,
    ) -> CTCModelOutput:
        encoded, encoded_len, layer_feats = self.encoder(
            processed_signal, processed_signal_length, train=train)
        log_probs = self.decoder(encoded)
        greedy = jnp.argmax(log_probs, axis=-1)
        return CTCModelOutput(log_probs, encoded_len, greedy, encoded, layer_feats)

    def encode(self, input_signal, input_signal_length, train: bool = False):
        """Preprocess + encode only (the teacher path in KD: asr_train.py:589-592)."""
        rng = self.make_rng("specaug") if train else None
        feats, feat_len = self.featurizer(
            input_signal, input_signal_length, train=train, rng=rng)
        if train and self.cfg.spec_augment is not None:
            feats = spec_augment(feats, feat_len, self.cfg.spec_augment,
                                 self.make_rng("specaug"))
        return self.encoder(feats, feat_len, train=train)

    def decode_logits(self, encoded):
        return self.decoder(encoded)

    def pre_encode(self, processed_signal, processed_signal_length):
        """Subsampling front half of the encoder only: (B, F, T) log-mel ->
        raw (B, T', D) pre-encoded embeddings + lengths (before xscale /
        masking). The packed-serving split point — see data/packing.py."""
        return self.encoder(processed_signal, processed_signal_length,
                            train=False, pre_encode_only=True)

    def forward_packed(self, packed: jnp.ndarray, seg_id: jnp.ndarray):
        """Packed-segment inference: `packed` (R, Tp, D) rows of pre-encoded
        frames gathered from `pre_encode` outputs (data/packing.pack_frames),
        `seg_id` (R, Tp) int32 segment map (0 = guard/pad). Each segment's
        log-probs match the per-utterance forward exactly (segment-block
        attention + per-layer guard re-masking). Returns (log_probs, greedy).
        """
        dummy_len = jnp.zeros((packed.shape[0],), jnp.int32)
        encoded, _, _ = self.encoder(packed, dummy_len, train=False,
                                     bypass_pre_encode=True, seg_id=seg_id)
        log_probs = self.decoder(encoded)
        return log_probs, jnp.argmax(log_probs, axis=-1)

    def pre_encode_aug(self, input_signal, input_signal_length,
                       train: bool = False):
        """Featurize (+dither/specaug when `train`) + subsampling pre-encode:
        (B, L) waveform -> raw (B, T_src, D) embeddings + lengths. The
        packed-TRAINING split point: per-utterance augmentation happens here,
        BEFORE frames are gathered into packed rows (data/packing.py)."""
        rng = self.make_rng("specaug") if train else None
        feats, feat_len = self.featurizer(
            input_signal, input_signal_length, train=train, rng=rng)
        if train and self.cfg.spec_augment is not None:
            feats = spec_augment(feats, feat_len, self.cfg.spec_augment,
                                 self.make_rng("specaug"))
        return self.encoder(feats, feat_len, train=train,
                            pre_encode_only=True)

    def encode_packed(self, packed: jnp.ndarray, seg_id: jnp.ndarray,
                      train: bool = False):
        """Packed-segment encoder pass (training or eval): (R, Tp, D) packed
        pre-encoded rows -> (encoded (R, Tp, D), row_len (R,), layer_feats
        (L, R, Tp, D)). Training runs in-kernel attention dropout + the
        custom-VJP segment backward (ops/pallas_attention.py)."""
        dummy_len = jnp.zeros((packed.shape[0],), jnp.int32)
        return self.encoder(packed, dummy_len, train=train,
                            bypass_pre_encode=True, seg_id=seg_id)

    def stream_step(
        self,
        processed_signal: jnp.ndarray,        # (B, F, Tc_raw + pre_ctx) mel chunk
        processed_signal_length: jnp.ndarray, # (B,) incl. the pre-encode context
        cache: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray],
        drop_extra_pre_encoded: int,
    ):
        """One cache-aware streaming step (NeMo conformer_encoder.py streaming
        forward :630-760 + decoder). The chunk must be prefixed with the raw
        pre-encode context frames; see models/streaming.py for the driver that
        maintains that feature cache. Returns (log_probs, enc_len, new_cache)."""
        encoded, enc_len, _feats, new_cache = self.encoder(
            processed_signal, processed_signal_length, train=False,
            cache=cache, drop_extra_pre_encoded=drop_extra_pre_encoded)
        log_probs = self.decoder(encoded)
        return log_probs, enc_len, new_cache
