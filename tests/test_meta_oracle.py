"""Torch-oracle parity for the conformer meta-encoder (velocity net).

The reference's FM-KT meta encoders are defined inline in torch
(asr_train.py:917-1019: FeedForwardModule / ConvModule / ConformerBlock /
ConformerEncoder). This rebuilds that exact structure in torch (dropout
p=0), copies OUR flax params into it, and asserts forward parity — torch
runs in TRAIN mode so its BatchNorm1d uses batch statistics, which is the
semantics our `_BatchStatNorm` implements in both modes (the documented
deviation in kd/meta_encoders.py: running averages are never tracked).
This pins:
- the double-LayerNorm quirk (norm_ff1 feeding ff1's own LayerNorm),
- packed-QKV MultiheadAttention wiring,
- the ConvModule layout (pointwise -> depthwise k=31 -> BN -> SiLU ->
  pointwise) in feature-last form,
- training-dynamics equivalence of the BN batch-statistics path.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tpu_asr.kd.meta_encoders import ConformerMetaEncoder  # noqa: E402

D_IN, D, H, B, T = 16, 24, 4, 2, 33


class TFF(tnn.Module):
    def __init__(self, d, mult=4):
        super().__init__()
        self.net = tnn.Sequential(
            tnn.LayerNorm(d), tnn.Linear(d, d * mult), tnn.SiLU(),
            tnn.Dropout(0.0), tnn.Linear(d * mult, d), tnn.Dropout(0.0))

    def forward(self, x):
        return self.net(x)


class TConv(tnn.Module):
    def __init__(self, d, expansion=2, k=31):
        super().__init__()
        dd = d * expansion
        self.layer_norm = tnn.LayerNorm(d)
        self.pointwise_conv1 = tnn.Conv1d(d, dd, 1)
        self.depthwise_conv = tnn.Conv1d(dd, dd, k, groups=dd, padding=k // 2)
        self.batch_norm = tnn.BatchNorm1d(dd)
        self.pointwise_conv2 = tnn.Conv1d(dd, d, 1)

    def forward(self, x):
        x = self.layer_norm(x).transpose(1, 2)
        x = self.depthwise_conv(self.pointwise_conv1(x))
        x = tnn.functional.silu(self.batch_norm(x))
        return self.pointwise_conv2(x).transpose(1, 2)


class TBlock(tnn.Module):
    def __init__(self, d, h):
        super().__init__()
        self.ff1, self.ff2 = TFF(d), TFF(d)
        self.norm_ff1, self.norm_ff2 = tnn.LayerNorm(d), tnn.LayerNorm(d)
        self.mha_layer = tnn.LayerNorm(d)
        self.mha = tnn.MultiheadAttention(d, h, dropout=0.0, batch_first=True)
        self.conv = TConv(d)
        self.norm_final = tnn.LayerNorm(d)

    def forward(self, x):
        x = x + 0.5 * self.ff1(self.norm_ff1(x))
        h, _ = self.mha(*([self.mha_layer(x)] * 3))
        x = x + h
        x = x + self.conv(x)
        x = x + 0.5 * self.ff2(self.norm_ff2(x))
        return self.norm_final(x)


class TEncoder(tnn.Module):
    def __init__(self, d_in, d, h, n_layers=4):
        super().__init__()
        self.input_proj = tnn.Linear(d_in, d)
        self.layers = tnn.ModuleList([TBlock(d, h) for _ in range(n_layers)])

    def forward(self, x):
        x = self.input_proj(x)
        for l in self.layers:
            x = l(x)
        return x


def _t(a):
    return torch.from_numpy(np.array(a, np.float32, copy=True))


def _copy_ln(tln, p):
    tln.weight.data = _t(p["scale"])
    tln.bias.data = _t(p["bias"])


def _copy_dense(tl, p):
    tl.weight.data = _t(p["kernel"]).T.contiguous()
    tl.bias.data = _t(p["bias"])


def _copy_ff(tff, p):
    _copy_ln(tff.net[0], p["LayerNorm_0"])
    _copy_dense(tff.net[1], p["Dense_0"])
    _copy_dense(tff.net[4], p["Dense_1"])


def _copy_conv1d(tc, p):
    # flax nn.Conv kernel (k, in/groups, out) -> torch (out, in/groups, k)
    tc.weight.data = _t(p["kernel"]).permute(2, 1, 0).contiguous()
    tc.bias.data = _t(p["bias"])


def _copy_mha(tm, p, d):
    qw = _t(p["query"]["kernel"]).reshape(d, d).T
    kw = _t(p["key"]["kernel"]).reshape(d, d).T
    vw = _t(p["value"]["kernel"]).reshape(d, d).T
    tm.in_proj_weight.data = torch.cat([qw, kw, vw], 0).contiguous()
    qb = _t(p["query"]["bias"]).reshape(d)
    kb = _t(p["key"]["bias"]).reshape(d)
    vb = _t(p["value"]["bias"]).reshape(d)
    tm.in_proj_bias.data = torch.cat([qb, kb, vb], 0).contiguous()
    tm.out_proj.weight.data = _t(p["out"]["kernel"]).reshape(d, d).T.contiguous()
    tm.out_proj.bias.data = _t(p["out"]["bias"])


def test_conformer_meta_encoder_matches_torch_reference():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(B, T, D_IN)).astype(np.float32)

    enc = ConformerMetaEncoder(D_IN, D, H, 4)
    variables = enc.init(jax.random.key(0), jnp.asarray(x))
    params = variables["params"]
    # randomize BN affines so identity-affine bugs cannot hide
    params = jax.tree_util.tree_map(
        lambda a: a + 0.1 * jnp.asarray(
            rng.normal(size=a.shape).astype(np.float32)), params)

    tenc = TEncoder(D_IN, D, H)
    _copy_dense(tenc.input_proj, params["input_proj"])
    for i, tb in enumerate(tenc.layers):
        p = params[f"block{i}"]
        _copy_ln(tb.norm_ff1, p["norm_ff1"])
        _copy_ln(tb.norm_ff2, p["norm_ff2"])
        _copy_ff(tb.ff1, p["ff1"])
        _copy_ff(tb.ff2, p["ff2"])
        _copy_ln(tb.mha_layer, p["mha_norm"])
        _copy_mha(tb.mha, p["mha"], D)
        _copy_ln(tb.conv.layer_norm, p["conv"]["LayerNorm_0"])
        _copy_conv1d(tb.conv.pointwise_conv1, p["conv"]["pointwise1"])
        _copy_conv1d(tb.conv.depthwise_conv, p["conv"]["depthwise"])
        _copy_conv1d(tb.conv.pointwise_conv2, p["conv"]["pointwise2"])
        tb.conv.batch_norm.weight.data = _t(p["conv"]["batch_norm"]["scale"])
        tb.conv.batch_norm.bias.data = _t(p["conv"]["batch_norm"]["bias"])
        _copy_ln(tb.norm_final, p["final_norm"])

    # torch TRAIN mode -> BatchNorm1d uses batch statistics, the semantics
    # _BatchStatNorm implements in both modes; all dropouts are p=0.
    tenc.train()
    with torch.no_grad():
        want = tenc(_t(x)).numpy()

    got = np.asarray(enc.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
