""".nemo / Lightning-.ckpt -> JAX parameter conversion (teacher import).

Replaces the reference's teacher load path (SURVEY.md §3.4):
`EncDecCTCModelBPE.from_pretrained` -> SaveRestoreConnector tar extraction ->
OmegaConf cfg -> torch load_state_dict (save_restore_connector.py:231,701) and
the `release_nemoAPI` unpack hack (asr_train.py:165-176).

A `.nemo` file is a (possibly gzipped) tar of `model_config.yaml`,
`model_weights.ckpt` and artifacts (`*tokenizer.model`). We extract, map the
NeMo torch state_dict onto this framework's flax trees:

torch layout -> flax layout (per-leaf transposes):
- Linear weight (out, in)                  -> Dense kernel (in, out)
- Conv2d weight (out, in, kh, kw)          -> Conv kernel (kh, kw, in, out)
- Conv1d k=1 weight (out, in, 1)           -> Dense kernel (in, out)
- depthwise Conv1d weight (d, 1, k)        -> Conv kernel (k, 1, d)
- LayerNorm/BatchNorm weight/bias          -> scale/bias (+ batch_stats mean/var)
- encoder.layers.{i}.*                     -> stacked (L, ...) leaves for the
  scanned ConformerLayer (models/conformer.py)

Parity is pinned by tests/test_convert.py: a torch re-derivation of the NeMo
conformer forward runs the same weights and must match the JAX forward.
"""

from __future__ import annotations

import tarfile
import tempfile
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import numpy as np

from tpu_asr.config import (DecoderConfig, EncoderConfig, ModelConfig,
                            PreprocessorConfig, SpecAugmentConfig)


# ---------------------------------------------------------------------------
# archive handling
# ---------------------------------------------------------------------------

def extract_nemo(nemo_path, out_dir=None) -> Dict[str, Path]:
    """Extract a .nemo tar(.gz). Returns {'config': ..., 'weights': ...,
    'tokenizer': ... (if present), 'dir': extraction dir}."""
    nemo_path = Path(nemo_path)
    out_dir = Path(out_dir) if out_dir else Path(tempfile.mkdtemp(prefix="nemo_"))
    out_dir.mkdir(parents=True, exist_ok=True)
    mode = "r:gz"
    try:
        tar = tarfile.open(nemo_path, mode)
    except tarfile.ReadError:
        tar = tarfile.open(nemo_path, "r:")
    with tar:
        tar.extractall(out_dir, filter="data")
    found: Dict[str, Path] = {"dir": out_dir}
    for p in sorted(out_dir.rglob("*")):
        name = p.name
        if name.endswith("model_config.yaml"):
            found["config"] = p
        elif name.endswith("model_weights.ckpt"):
            found["weights"] = p
        elif name.endswith("tokenizer.model"):
            found.setdefault("tokenizer", p)
        elif name.endswith(".vocab"):
            found.setdefault("vocab", p)
    if "config" not in found or "weights" not in found:
        raise FileNotFoundError(
            f"{nemo_path}: missing model_config.yaml / model_weights.ckpt")
    return found


def nemo_config_to_model_config(cfg: Dict[str, Any]) -> ModelConfig:
    """NeMo OmegaConf dict (model_config.yaml) -> ModelConfig."""
    pre = cfg.get("preprocessor", {})
    enc = cfg.get("encoder", {})
    dec = cfg.get("decoder", {})
    spec = cfg.get("spec_augment") or {}

    def g(d, k, default):
        v = d.get(k, default)
        return default if v is None else v

    preprocessor = PreprocessorConfig(
        sample_rate=g(pre, "sample_rate", 16000),
        window_size=g(pre, "window_size", 0.025),
        window_stride=g(pre, "window_stride", 0.01),
        window=g(pre, "window", "hann"),
        features=g(pre, "features", 80),
        n_fft=g(pre, "n_fft", 512),
        dither=g(pre, "dither", 1.0e-5),
        pad_to=g(pre, "pad_to", 0),
        normalize=g(pre, "normalize", "per_feature"),
        preemph=g(pre, "preemph", 0.97),
    )
    encoder = EncoderConfig(
        feat_in=g(enc, "feat_in", preprocessor.features),
        n_layers=g(enc, "n_layers", 16),
        d_model=g(enc, "d_model", 176),
        n_heads=g(enc, "n_heads", 4),
        ff_expansion_factor=g(enc, "ff_expansion_factor", 4),
        subsampling=g(enc, "subsampling", "striding"),
        subsampling_factor=g(enc, "subsampling_factor", 4),
        subsampling_conv_channels=g(enc, "subsampling_conv_channels", -1),
        self_attention_model=g(enc, "self_attention_model", "rel_pos"),
        xscaling=g(enc, "xscaling", True),
        untie_biases=g(enc, "untie_biases", True),
        pos_emb_max_len=g(enc, "pos_emb_max_len", 5000),
        conv_kernel_size=g(enc, "conv_kernel_size", 31),
        conv_norm_type=g(enc, "conv_norm_type", "batch_norm"),
        dropout=g(enc, "dropout", 0.1),
        dropout_pre_encoder=g(enc, "dropout_pre_encoder", 0.1),
        dropout_emb=g(enc, "dropout_emb", 0.0),
        dropout_att=g(enc, "dropout_att", 0.1),
    )
    num_classes = g(dec, "num_classes", 128)
    if num_classes < 0:
        vocab = dec.get("vocabulary") or []
        num_classes = len(vocab)
    decoder = DecoderConfig(
        feat_in=g(dec, "feat_in", encoder.d_model),
        num_classes=num_classes,
    )
    spec_cfg = None
    if spec:
        spec_cfg = SpecAugmentConfig(
            freq_masks=g(spec, "freq_masks", 2),
            time_masks=g(spec, "time_masks", 10),
            freq_width=g(spec, "freq_width", 27),
            time_width=g(spec, "time_width", 0.05),
        )
    return ModelConfig(sample_rate=preprocessor.sample_rate,
                       preprocessor=preprocessor, spec_augment=spec_cfg,
                       encoder=encoder, decoder=decoder)


# ---------------------------------------------------------------------------
# state-dict conversion
# ---------------------------------------------------------------------------

def _np(t) -> np.ndarray:
    try:
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def _linear(sd, key) -> Dict[str, np.ndarray]:
    out = {"kernel": _np(sd[f"{key}.weight"]).T}
    if f"{key}.bias" in sd:
        out["bias"] = _np(sd[f"{key}.bias"])
    return out


def _conv1x1_as_dense(sd, key) -> Dict[str, np.ndarray]:
    w = _np(sd[f"{key}.weight"])              # (out, in, 1)
    out = {"kernel": w[:, :, 0].T}
    if f"{key}.bias" in sd:
        out["bias"] = _np(sd[f"{key}.bias"])
    return out


def _conv2d(sd, key) -> Dict[str, np.ndarray]:
    w = _np(sd[f"{key}.weight"])              # (out, in, kh, kw)
    out = {"kernel": w.transpose(2, 3, 1, 0)}
    if f"{key}.bias" in sd:
        out["bias"] = _np(sd[f"{key}.bias"])
    return out


def _depthwise_conv1d(sd, key) -> Dict[str, np.ndarray]:
    w = _np(sd[f"{key}.weight"])              # (d, 1, k)
    out = {"kernel": w.transpose(2, 1, 0)}    # (k, 1, d)
    if f"{key}.bias" in sd:
        out["bias"] = _np(sd[f"{key}.bias"])
    return out


def _norm(sd, key) -> Dict[str, np.ndarray]:
    return {"scale": _np(sd[f"{key}.weight"]), "bias": _np(sd[f"{key}.bias"])}


def _ff(sd, key) -> Dict[str, Any]:
    return {"linear1": _linear(sd, f"{key}.linear1"),
            "linear2": _linear(sd, f"{key}.linear2")}


def _attn(sd, key) -> Dict[str, Any]:
    return {
        "linear_q": _linear(sd, f"{key}.linear_q"),
        "linear_k": _linear(sd, f"{key}.linear_k"),
        "linear_v": _linear(sd, f"{key}.linear_v"),
        "linear_out": _linear(sd, f"{key}.linear_out"),
        "linear_pos": _linear(sd, f"{key}.linear_pos"),
        "pos_bias_u": _np(sd[f"{key}.pos_bias_u"]),
        "pos_bias_v": _np(sd[f"{key}.pos_bias_v"]),
    }


def _conv_module(sd, key, conv_norm_type: str) -> Tuple[Dict, Optional[Dict]]:
    params: Dict[str, Any] = {
        "pointwise_conv1": _conv1x1_as_dense(sd, f"{key}.pointwise_conv1"),
        "depthwise_conv": _depthwise_conv1d(sd, f"{key}.depthwise_conv"),
        "pointwise_conv2": _conv1x1_as_dense(sd, f"{key}.pointwise_conv2"),
    }
    stats = None
    if conv_norm_type == "batch_norm":
        params["batch_norm"] = _norm(sd, f"{key}.batch_norm")
        stats = {"batch_norm": {
            "mean": _np(sd[f"{key}.batch_norm.running_mean"]),
            "var": _np(sd[f"{key}.batch_norm.running_var"])}}
    else:
        params["norm"] = _norm(sd, f"{key}.batch_norm")
    return params, stats


def _stack(trees):
    """List of per-layer pytrees -> one pytree with stacked (L, ...) leaves."""
    import jax
    return jax.tree.map(lambda *xs: np.stack(xs, axis=0), *trees)


def convert_state_dict(sd: Dict[str, Any], cfg: ModelConfig,
                       prefix: str = "") -> Tuple[Dict, Dict]:
    """NeMo torch state_dict -> (params, batch_stats) for tpu_asr.CTCModel.

    `prefix` strips a leading scope (e.g. 'teacher.' inside the reference's
    Lightning checkpoints, asr_inference.py:389-395).
    """
    if prefix:
        sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}

    enc = cfg.encoder
    n_stages = {2: 1, 4: 2, 8: 3}[enc.subsampling_factor]

    pre_encode: Dict[str, Any] = {}
    for i in range(n_stages):
        # NeMo Sequential indices: Conv2d at 0, 2, 4 (ReLU between)
        pre_encode[f"conv{i}"] = _conv2d(sd, f"encoder.pre_encode.conv.{2 * i}")
    pre_encode["out"] = _linear(sd, "encoder.pre_encode.out")

    layers_p = []
    layers_s = []
    for i in range(enc.n_layers):
        k = f"encoder.layers.{i}"
        conv_p, conv_s = _conv_module(sd, f"{k}.conv", enc.conv_norm_type)
        layer = {
            "norm_feed_forward1": _norm(sd, f"{k}.norm_feed_forward1"),
            "feed_forward1": _ff(sd, f"{k}.feed_forward1"),
            "norm_self_att": _norm(sd, f"{k}.norm_self_att"),
            "self_attn": _attn(sd, f"{k}.self_attn"),
            "norm_conv": _norm(sd, f"{k}.norm_conv"),
            "conv": conv_p,
            "norm_feed_forward2": _norm(sd, f"{k}.norm_feed_forward2"),
            "feed_forward2": _ff(sd, f"{k}.feed_forward2"),
            "norm_out": _norm(sd, f"{k}.norm_out"),
        }
        layers_p.append(layer)
        if conv_s is not None:
            layers_s.append({"conv": conv_s})

    params = {
        "encoder": {"pre_encode": pre_encode, "layers": _stack(layers_p)},
        "decoder": {"decoder_layers_0":
                    _conv1x1_as_dense(sd, "decoder.decoder_layers.0")},
    }
    batch_stats = {}
    if layers_s:
        batch_stats = {"encoder": {"layers": _stack(layers_s)}}
    return params, batch_stats


def load_nemo_checkpoint(nemo_path, out_dir=None):
    """Full teacher import: .nemo -> (ModelConfig, params, batch_stats,
    tokenizer_path or None)."""
    import torch
    import yaml

    found = extract_nemo(nemo_path, out_dir)
    with open(found["config"]) as f:
        raw_cfg = yaml.safe_load(f)
    cfg = nemo_config_to_model_config(raw_cfg)
    sd = torch.load(found["weights"], map_location="cpu", weights_only=True)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    params, batch_stats = convert_state_dict(sd, cfg)
    return cfg, params, batch_stats, found.get("tokenizer")
