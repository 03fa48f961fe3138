"""Vocabulary / decoding-strategy swapping — the EncDecCTCModel
`change_vocabulary` / `change_decoding_strategy` surface (N2 in SURVEY.md
§2.2, ctc_models.py:194-303).

In this functional framework a "decoding strategy change" is just building a
new `CTCDecoding`; `change_vocabulary` re-initializes the decoder head for a
new tokenizer while keeping every other parameter (the NeMo fine-tune-to-a-
new-language flow)."""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import jax
import jax.numpy as jnp

from tpu_asr.config import ModelConfig
from tpu_asr.models.ctc_model import CTCModel
from tpu_asr.ops.decoding import CTCDecoding


def change_decoding_strategy(tokenizer, strategy: str = "greedy",
                             **kwargs) -> CTCDecoding:
    return CTCDecoding(tokenizer, strategy=strategy, **kwargs)


def change_vocabulary(cfg: ModelConfig, params: Any, new_tokenizer,
                      rng: jax.Array) -> Tuple[ModelConfig, Any]:
    """Returns (new_cfg, new_params): decoder head re-initialized for the new
    vocabulary (+blank), everything else carried over unchanged."""
    new_cfg = dataclasses.replace(
        cfg, decoder=dataclasses.replace(cfg.decoder,
                                         num_classes=new_tokenizer.vocab_size))
    model = CTCModel(new_cfg)
    sample_feats = jnp.zeros((1, new_cfg.preprocessor.features, 16),
                             jnp.float32)
    fresh = model.init(rng, sample_feats, jnp.asarray([16], jnp.int32),
                       method=model.forward_features)
    new_params = dict(params)
    new_params["decoder"] = fresh["params"]["decoder"]
    return new_cfg, new_params
