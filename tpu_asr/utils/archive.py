"""Single-file model archives — the `.nemo` equivalent (N12 in SURVEY.md §2.2:
SaveRestoreConnector's tar.gz of model_config.yaml + model_weights.ckpt +
tokenizer artifacts, save_restore_connector.py:49-231,599-716).

A `.tasr` archive is a tar.gz containing:
- `model_config.json`   — ModelConfig as JSON
- `model_weights.msgpack` — flax-serialized {params, batch_stats}
- `tokenizer.model`     — the tokenizer file (SentencePiece proto or this
  framework's JSON format), when provided

`save_archive` / `restore_archive` replace both SaveRestoreConnector and the
reference's `release_nemoAPI` unpack hack (asr_train.py:165-176): restoring
returns everything in memory, no fixed extraction directory needed.
"""

from __future__ import annotations

import dataclasses
import io
import json
import tarfile
import tempfile
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

from flax import serialization

from tpu_asr.config import (DecoderConfig, EncoderConfig, ModelConfig,
                            PreprocessorConfig, SpecAugmentConfig)


def _config_from_dict(d: Dict[str, Any]) -> ModelConfig:
    spec = d.get("spec_augment")
    return ModelConfig(
        sample_rate=d.get("sample_rate", 16000),
        ctc_reduction=d.get("ctc_reduction", "mean_batch"),
        skip_nan_grad=d.get("skip_nan_grad", False),
        preprocessor=PreprocessorConfig(**d["preprocessor"]),
        spec_augment=SpecAugmentConfig(**spec) if spec else None,
        encoder=EncoderConfig(**{k: tuple(v) if isinstance(v, list) else v
                                 for k, v in d["encoder"].items()}),
        decoder=DecoderConfig(**d["decoder"]),
        compute_dtype=d.get("compute_dtype", "bfloat16"),
        param_dtype=d.get("param_dtype", "float32"),
    )


def save_archive(path, cfg: ModelConfig, params, batch_stats=None,
                 tokenizer_path=None) -> Path:
    """Write a .tasr tar.gz archive."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    weights = serialization.msgpack_serialize(
        {"params": params, "batch_stats": batch_stats or {}})
    config_bytes = json.dumps(cfg.to_dict(), indent=2).encode()

    with tarfile.open(path, "w:gz") as tar:
        def add(name: str, data: bytes):
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tar.addfile(info, io.BytesIO(data))

        add("model_config.json", config_bytes)
        add("model_weights.msgpack", weights)
        if tokenizer_path is not None:
            add("tokenizer.model", Path(tokenizer_path).read_bytes())
    return path


def restore_archive(path) -> Tuple[ModelConfig, Any, Any, Optional[bytes]]:
    """Read a .tasr archive -> (cfg, params, batch_stats, tokenizer_bytes)."""
    with tarfile.open(path, "r:gz") as tar:
        names = tar.getnames()
        cfg = _config_from_dict(json.loads(
            tar.extractfile("model_config.json").read()))
        blob = tar.extractfile("model_weights.msgpack").read()
        state = serialization.msgpack_restore(blob)
        tok = (tar.extractfile("tokenizer.model").read()
               if "tokenizer.model" in names else None)
    return cfg, state["params"], state["batch_stats"], tok


def restore_tokenizer(tokenizer_bytes: bytes):
    """Bytes from an archive -> SentencePieceBPETokenizer."""
    from tpu_asr.data.tokenizer import (SentencePieceBPETokenizer,
                                        parse_sentencepiece_model)
    if tokenizer_bytes[:1] == b"{":
        with tempfile.NamedTemporaryFile(suffix=".json", delete=False) as f:
            f.write(tokenizer_bytes)
            name = f.name
        return SentencePieceBPETokenizer.from_file(name)
    return SentencePieceBPETokenizer(
        parse_sentencepiece_model(tokenizer_bytes))
