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

import math
import tarfile
from pathlib import Path

import jax
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from tpu_asr.config import (DecoderConfig, EncoderConfig, ModelConfig,
                            PreprocessorConfig)
from tpu_asr.convert.nemo_import import (convert_state_dict, extract_nemo,
                                         load_nemo_checkpoint,
                                         nemo_config_to_model_config)
from tpu_asr.models.ctc_model import CTCModel

D_MODEL, N_HEADS, N_LAYERS, FEAT, VOCAB, KERNEL = 32, 4, 2, 24, 12, 7


# ---------------------------------------------------------------------------
# torch re-derivation of the NeMo modules (eval-mode semantics)
# ---------------------------------------------------------------------------

class TRelPosMHA(nn.Module):
    def __init__(self, d, h):
        super().__init__()
        self.h, self.dk = h, d // h
        self.linear_q = nn.Linear(d, d)
        self.linear_k = nn.Linear(d, d)
        self.linear_v = nn.Linear(d, d)
        self.linear_out = nn.Linear(d, d)
        self.linear_pos = nn.Linear(d, d, bias=False)
        self.pos_bias_u = nn.Parameter(torch.randn(h, self.dk) * 0.1)
        self.pos_bias_v = nn.Parameter(torch.randn(h, self.dk) * 0.1)

    @staticmethod
    def rel_shift(x):
        b, h, t, p = x.shape
        x = F.pad(x, (1, 0))
        x = x.view(b, h, p + 1, t)
        return x[:, :, 1:].view(b, h, t, p)

    def forward(self, x, pos_emb):
        b, t, d = x.shape
        q = self.linear_q(x).view(b, t, self.h, self.dk)
        k = self.linear_k(x).view(b, t, self.h, self.dk)
        v = self.linear_v(x).view(b, t, self.h, self.dk)
        p = self.linear_pos(pos_emb).view(-1, self.h, self.dk)
        ac = torch.einsum("bthd,bshd->bhts", q + self.pos_bias_u, k)
        bd = torch.einsum("bthd,phd->bhtp", q + self.pos_bias_v, p)
        bd = self.rel_shift(bd)[:, :, :, :t]
        scores = (ac + bd) / math.sqrt(self.dk)
        attn = torch.softmax(scores, dim=-1)
        out = torch.einsum("bhts,bshd->bthd", attn, v).reshape(b, t, d)
        return self.linear_out(out)


class TFeedForward(nn.Module):
    def __init__(self, d, d_ff):
        super().__init__()
        self.linear1 = nn.Linear(d, d_ff)
        self.linear2 = nn.Linear(d_ff, d)

    def forward(self, x):
        return self.linear2(F.silu(self.linear1(x)))


class TConvModule(nn.Module):
    def __init__(self, d, k):
        super().__init__()
        self.pointwise_conv1 = nn.Conv1d(d, 2 * d, 1)
        self.depthwise_conv = nn.Conv1d(d, d, k, padding=k // 2, groups=d)
        self.batch_norm = nn.BatchNorm1d(d)
        self.pointwise_conv2 = nn.Conv1d(d, d, 1)

    def forward(self, x):                       # (B, T, D)
        x = x.transpose(1, 2)
        x = F.glu(self.pointwise_conv1(x), dim=1)
        x = self.depthwise_conv(x)
        x = self.batch_norm(x)
        x = F.silu(x)
        x = self.pointwise_conv2(x)
        return x.transpose(1, 2)


class TConformerLayer(nn.Module):
    def __init__(self, d, h, d_ff, k):
        super().__init__()
        self.norm_feed_forward1 = nn.LayerNorm(d)
        self.feed_forward1 = TFeedForward(d, d_ff)
        self.norm_self_att = nn.LayerNorm(d)
        self.self_attn = TRelPosMHA(d, h)
        self.norm_conv = nn.LayerNorm(d)
        self.conv = TConvModule(d, k)
        self.norm_feed_forward2 = nn.LayerNorm(d)
        self.feed_forward2 = TFeedForward(d, d_ff)
        self.norm_out = nn.LayerNorm(d)

    def forward(self, x, pos_emb):
        x = x + 0.5 * self.feed_forward1(self.norm_feed_forward1(x))
        x = x + self.self_attn(self.norm_self_att(x), pos_emb)
        x = x + self.conv(self.norm_conv(x))
        x = x + 0.5 * self.feed_forward2(self.norm_feed_forward2(x))
        return self.norm_out(x)


class TPreEncode(nn.Module):
    def __init__(self, feat_in, d, ch):
        super().__init__()
        self.conv = nn.Sequential(
            nn.Conv2d(1, ch, 3, stride=2, padding=1), nn.ReLU(),
            nn.Conv2d(ch, ch, 3, stride=2, padding=1), nn.ReLU())
        f_out = ((feat_in - 1) // 2 + 1 - 1) // 2 + 1
        self.out = nn.Linear(ch * f_out, d)

    def forward(self, x):                        # (B, T, F)
        x = self.conv(x.unsqueeze(1))            # (B, C, T', F')
        b, c, t, f = x.shape
        return self.out(x.transpose(1, 2).reshape(b, t, c * f))


class TEncoder(nn.Module):
    def __init__(self):
        super().__init__()
        self.pre_encode = TPreEncode(FEAT, D_MODEL, D_MODEL)
        self.layers = nn.ModuleList(
            TConformerLayer(D_MODEL, N_HEADS, 4 * D_MODEL, KERNEL)
            for _ in range(N_LAYERS))

    @staticmethod
    def pos_emb(t):
        positions = torch.arange(t - 1, -t, -1, dtype=torch.float32)[:, None]
        div = torch.exp(torch.arange(0, D_MODEL, 2, dtype=torch.float32)
                        * -(math.log(10000.0) / D_MODEL))
        pe = torch.zeros(2 * t - 1, D_MODEL)
        pe[:, 0::2] = torch.sin(positions * div)
        pe[:, 1::2] = torch.cos(positions * div)
        return pe

    def forward(self, feats):                    # (B, F, T) NeMo layout
        x = self.pre_encode(feats.transpose(1, 2))
        x = x * math.sqrt(D_MODEL)               # xscale
        pe = self.pos_emb(x.shape[1])
        for layer in self.layers:
            x = layer(x, pe)
        return x                                  # (B, T, D)


class TModel(nn.Module):
    def __init__(self):
        super().__init__()
        self.encoder = TEncoder()
        self.decoder = nn.Module()
        self.decoder.decoder_layers = nn.Sequential(
            nn.Conv1d(D_MODEL, VOCAB + 1, 1))

    def forward(self, feats):
        enc = self.encoder(feats)                              # (B, T, D)
        logits = self.decoder.decoder_layers(enc.transpose(1, 2)).transpose(1, 2)
        return F.log_softmax(logits, dim=-1), enc


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
    m = TModel().eval()
    # non-trivial BN running stats to pin the batch_stats mapping
    for layer in m.encoder.layers:
        bn = layer.conv.batch_norm
        bn.running_mean.uniform_(-0.3, 0.3)
        bn.running_var.uniform_(0.7, 1.5)
    return m


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
