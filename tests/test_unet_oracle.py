"""Torch-oracle parity for UNet1DMetaEncoder (reference UNet1D,
asr_train.py:880-916): strided k=4 s=2 p=1 down convs, k=3 bottleneck,
pad/crop-then-concat skip wiring, ConvTranspose1d(k=4, s=2, p=1) up path
(flax equivalent: padding (2,2) per side + spatially flipped kernel), and
the final 1x1. Run at an ODD length so the pad/crop branches execute."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tpu_asr.kd.meta_encoders import UNet1DMetaEncoder  # noqa: E402

B, T, CIN, BASE, COUT, NL = 2, 37, 6, 4, 6, 4


class TUNet(tnn.Module):
    def __init__(self):
        super().__init__()
        self.downs = tnn.ModuleList()
        ch, chans = CIN, []
        for i in range(NL):
            outc = BASE * (2 ** i)
            self.downs.append(tnn.Conv1d(ch, outc, 4, 2, 1))
            chans.append(outc)
            ch = outc
        self.bottleneck = tnn.Conv1d(ch, ch, 3, 1, 1)
        self.ups = tnn.ModuleList()
        for skip_c in reversed(chans):
            self.ups.append(tnn.ConvTranspose1d(ch + skip_c, skip_c, 4, 2, 1))
            ch = skip_c
        self.final = tnn.Conv1d(ch, COUT, 1)

    def forward(self, x):                        # (B, C, T)
        skips = []
        for d in self.downs:
            x = d(x)
            skips.append(x)
        x = self.bottleneck(x)
        for up in self.ups:
            skip = skips.pop()
            if x.size(2) != skip.size(2):
                x = F.pad(x, (0, skip.size(2) - x.size(2)))
            x = up(torch.cat([x, skip], 1))
        return self.final(x)


def _t(a):
    return torch.from_numpy(np.array(a, np.float32, copy=True))


def _conv1d(tc, p):
    tc.weight.data = _t(p["kernel"]).permute(2, 1, 0).contiguous()
    tc.bias.data = _t(p["bias"])


def _convT1d(tc, p):
    # flax ConvTranspose kernel (k, in, out), spatially flipped vs torch
    # ConvTranspose1d weight (in, out, k)
    k = np.array(p["kernel"], np.float32)[::-1]      # unflip
    tc.weight.data = torch.from_numpy(k.transpose(1, 2, 0).copy())
    tc.bias.data = _t(p["bias"])


def test_unet_meta_encoder_matches_torch_reference():
    rng = np.random.default_rng(5)
    x = rng.normal(size=(B, T, CIN)).astype(np.float32)

    enc = UNet1DMetaEncoder(base_ch=BASE, out_dim=COUT, n_layers=NL)
    variables = enc.init(jax.random.key(0), jnp.asarray(x))
    params = jax.tree_util.tree_map(
        lambda a: a + 0.1 * jnp.asarray(
            rng.normal(size=a.shape).astype(np.float32)),
        variables["params"])

    tu = TUNet()
    for i in range(NL):
        _conv1d(tu.downs[i], params[f"down{i}"])
        _convT1d(tu.ups[i], params[f"up{i}"])
    _conv1d(tu.bottleneck, params["bottleneck"])
    _conv1d(tu.final, params["final"])

    with torch.no_grad():
        out = tu(_t(x).permute(0, 2, 1))             # (B, C, T)
    # the reference FM wrapper permutes back and crops/pads to the input
    # length (asr_train.py:1346-1359); our module does that internally
    out = out.permute(0, 2, 1).numpy()               # (B, T', C)
    tw = out.shape[1]
    if tw > T:
        out = out[:, :T]
    elif tw < T:
        out = np.pad(out, ((0, 0), (0, T - tw), (0, 0)))

    got = np.asarray(enc.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, out, rtol=2e-4, atol=2e-4)
