"""CTC decoder head — rebuild of NeMo's ConvASRDecoder (conv_asr.py:407-507):
a 1x1 Conv1d (== Dense over time) from encoder features to vocab+blank logits,
followed by log_softmax with an optional temperature knob. Blank is the LAST index
(vocab_size), matching NeMo's CTCLoss contract (ctc.py:25-82)."""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpu_asr.config import DecoderConfig


class ConvASRDecoder(nn.Module):
    cfg: DecoderConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, encoded: jnp.ndarray) -> jnp.ndarray:
        """encoded: (B, T, D) -> log-probs (B, T, vocab+1), fp32."""
        c = self.cfg
        logits = nn.Dense(c.num_classes + 1, dtype=self.dtype, name="decoder_layers_0")(encoded)
        logits = logits.astype(jnp.float32)
        if c.temperature != 1.0:
            logits = logits / c.temperature
        return jax.nn.log_softmax(logits, axis=-1)
