"""Checkpoint-converter parity tests.

Builds a torch model that reproduces the NeMo Conformer-CTC forward semantics
(re-derived from the call-site contracts in SURVEY.md N4/N6/N7 — the NeMo
submodule sources are stripped from the snapshot) with NeMo's exact state_dict
key naming, converts its weights with `convert_state_dict`, and asserts the
JAX forward matches the torch forward to fp32 tolerance. This pins every
transpose in the converter — the teacher-import path (SURVEY.md §3.4).

Also covers: .nemo tar round-trip via extract_nemo/load_nemo_checkpoint, and
Lightning-checkpoint prefix stripping ('teacher.' keys).
"""

import tarfile
from pathlib import Path

import jax
import numpy as np
import pytest
import torch

from tpu_asr.config import (DecoderConfig, EncoderConfig, ModelConfig,
                            PreprocessorConfig)
from tpu_asr.convert.nemo_import import (convert_state_dict, extract_nemo,
                                         load_nemo_checkpoint,
                                         nemo_config_to_model_config)
from tpu_asr.models.ctc_model import CTCModel

D_MODEL, N_HEADS, N_LAYERS, FEAT, VOCAB, KERNEL = 32, 4, 2, 24, 12, 7


from nemo_oracle import TModel, randomize_bn_stats


def _model_cfg():
    return ModelConfig(
        preprocessor=PreprocessorConfig(features=FEAT),
        spec_augment=None,
        encoder=EncoderConfig(feat_in=FEAT, n_layers=N_LAYERS, d_model=D_MODEL,
                              n_heads=N_HEADS, conv_kernel_size=KERNEL,
                              conv_norm_type="batch_norm", dropout=0.0,
                              dropout_pre_encoder=0.0, dropout_att=0.0),
        decoder=DecoderConfig(feat_in=D_MODEL, num_classes=VOCAB),
        compute_dtype="float32",
    )


@pytest.fixture(scope="module")
def torch_model():
    torch.manual_seed(0)
    m = TModel(FEAT, D_MODEL, N_HEADS, N_LAYERS, KERNEL, VOCAB).eval()
    return randomize_bn_stats(m)


def test_state_dict_converts_and_matches_torch_forward(torch_model):
    cfg = _model_cfg()
    sd = torch_model.state_dict()
    params, batch_stats = convert_state_dict(sd, cfg)

    b, t = 2, 50
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(b, FEAT, t)).astype(np.float32)
    lengths = np.asarray([t * 4, t * 4], np.int32)   # full valid (pre-subsample)

    with torch.no_grad():
        ref_logp, ref_enc = torch_model(torch.tensor(feats))

    model = CTCModel(cfg)
    variables = {"params": params, "batch_stats": batch_stats}
    sub_len = np.asarray([t, t], np.int32)
    out = model.apply(variables, jax.numpy.asarray(feats),
                      jax.numpy.asarray(sub_len * 4), train=False,
                      method=model.forward_features)
    np.testing.assert_allclose(np.asarray(out.encoded), ref_enc.numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.log_probs), ref_logp.numpy(),
                               rtol=1e-4, atol=1e-4)


def test_prefix_stripping(torch_model):
    cfg = _model_cfg()
    sd = {f"teacher.{k}": v for k, v in torch_model.state_dict().items()}
    params, _ = convert_state_dict(sd, cfg, prefix="teacher.")
    assert "encoder" in params and "decoder" in params


def test_nemo_archive_roundtrip(tmp_path, torch_model):
    # build a minimal .nemo (tar.gz of config + weights)
    import yaml
    cfg_yaml = {
        "preprocessor": {"features": FEAT, "sample_rate": 16000},
        "encoder": {"feat_in": FEAT, "n_layers": N_LAYERS, "d_model": D_MODEL,
                    "n_heads": N_HEADS, "conv_kernel_size": KERNEL},
        "decoder": {"feat_in": D_MODEL, "num_classes": VOCAB},
        "spec_augment": {"freq_masks": 2, "time_masks": 10},
    }
    workdir = tmp_path / "pack"
    workdir.mkdir()
    with open(workdir / "model_config.yaml", "w") as f:
        yaml.safe_dump(cfg_yaml, f)
    torch.save(torch_model.state_dict(), workdir / "model_weights.ckpt")
    nemo_path = tmp_path / "tiny.nemo"
    with tarfile.open(nemo_path, "w:gz") as tar:
        for p in workdir.iterdir():
            tar.add(p, arcname=p.name)

    cfg, params, batch_stats, tok = load_nemo_checkpoint(
        nemo_path, tmp_path / "extract")
    assert cfg.encoder.d_model == D_MODEL
    assert cfg.encoder.n_layers == N_LAYERS
    assert cfg.decoder.num_classes == VOCAB
    assert cfg.spec_augment is not None
    # stacked leaves have the layer leading dim
    k = params["encoder"]["layers"]["self_attn"]["linear_q"]["kernel"]
    assert k.shape[0] == N_LAYERS
    bn = batch_stats["encoder"]["layers"]["conv"]["batch_norm"]["mean"]
    assert bn.shape == (N_LAYERS, D_MODEL)


def test_nemo_config_num_classes_from_vocabulary():
    cfg = nemo_config_to_model_config(
        {"decoder": {"feat_in": 16, "num_classes": -1,
                     "vocabulary": ["a", "b", "c"]}})
    assert cfg.decoder.num_classes == 3
