"""Torch re-derivation of the NeMo Conformer-CTC forward with NeMo's EXACT
state_dict key layout — the offline oracle for the teacher-import path.

Shared by tests/test_convert.py (toy dims) and tests/test_nemo_key_layout.py
(real stt_en_conformer_ctc_small dims + golden key-set pin). The module/
attribute names are chosen so `state_dict()` reproduces NeMo's key names
byte-for-byte; the forward reproduces NeMo's eval-mode semantics:

- ConvSubsampling 'striding' x4: Conv2d(1,C,3,s=2,p=1)/ReLU twice, then the
  (B,C,T',F') -> (B,T',C*F') CHANNEL-MAJOR flatten into Linear
  (NeMo parts/submodules/subsampling.py, stripped from the snapshot; wiring
  pinned by conformer_encoder.py:371-392).
- RelPositionalEncoding: x * sqrt(d_model) (xscale), pos ids T-1..-(T-1),
  interleaved sin/cos (conformer_encoder.py:420-429).
- ConformerLayer: macaron FF half-steps, Transformer-XL rel-shift attention
  with untied pos_bias_u/v, depthwise conv module (GLU -> depthwise k=31 ->
  BatchNorm -> SiLU), final LayerNorm (NeMo conformer_modules.py, stripped;
  contract per SURVEY.md N6).
- ConvASRDecoder: 1x1 Conv1d + log_softmax (conv_asr.py:407-507).
"""

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


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
        # CHANNEL-MAJOR flatten: transpose to (B, T', C, F') then reshape —
        # the layout VERDICT r2 flagged as the converter's silent-risk spot
        return self.out(x.transpose(1, 2).reshape(b, t, c * f))


class TEncoder(nn.Module):
    def __init__(self, feat_in, d, h, n_layers, k, ch=None, ff_factor=4):
        super().__init__()
        self.d = d
        self.pre_encode = TPreEncode(feat_in, d, ch or d)
        self.layers = nn.ModuleList(
            TConformerLayer(d, h, ff_factor * d, k) for _ in range(n_layers))

    def pos_emb(self, t):
        d = self.d
        positions = torch.arange(t - 1, -t, -1, dtype=torch.float32)[:, None]
        div = torch.exp(torch.arange(0, d, 2, dtype=torch.float32)
                        * -(math.log(10000.0) / d))
        pe = torch.zeros(2 * t - 1, d)
        pe[:, 0::2] = torch.sin(positions * div)
        pe[:, 1::2] = torch.cos(positions * div)
        return pe

    def forward(self, feats):                    # (B, F, T) NeMo layout
        x = self.pre_encode(feats.transpose(1, 2))
        x = x * math.sqrt(self.d)                # xscale
        pe = self.pos_emb(x.shape[1])
        for layer in self.layers:
            x = layer(x, pe)
        return x                                  # (B, T, D)


class TModel(nn.Module):
    """encoder + ConvASRDecoder with NeMo's key names."""

    def __init__(self, feat_in, d, h, n_layers, k, vocab, ch=None,
                 ff_factor=4):
        super().__init__()
        self.encoder = TEncoder(feat_in, d, h, n_layers, k, ch=ch,
                                ff_factor=ff_factor)
        self.decoder = nn.Module()
        self.decoder.decoder_layers = nn.Sequential(
            nn.Conv1d(d, vocab + 1, 1))

    def forward(self, feats):
        enc = self.encoder(feats)                              # (B, T, D)
        logits = self.decoder.decoder_layers(
            enc.transpose(1, 2)).transpose(1, 2)
        return F.log_softmax(logits, dim=-1), enc


def randomize_bn_stats(model: TModel):
    """Non-trivial BatchNorm running stats so the batch_stats mapping is
    actually exercised (identity stats would hide a mean/var swap)."""
    for layer in model.encoder.layers:
        bn = layer.conv.batch_norm
        bn.running_mean.uniform_(-0.3, 0.3)
        bn.running_var.uniform_(0.7, 1.5)
    return model
