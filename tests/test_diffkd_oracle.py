"""Torch-oracle parity for DiffKDModule (reference asr_train.py:244-312):
teacher 1x1-conv AE (encode stop-gradiented, recon MSE), student projection,
iterative denoiser x <- x - net(x)/steps, MSE(denoised, z_t); loss = sum."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tpu_asr.config import DiffKDConfig  # noqa: E402
from tpu_asr.kd.diffkd import DiffKDModule  # noqa: E402

B, T, CS, CT, LAT, STEPS = 2, 17, 10, 18, 10, 5


class TDiffKD(tnn.Module):
    def __init__(self):
        super().__init__()
        self.encoder = tnn.Conv1d(CT, LAT, 1)
        self.decoder = tnn.Conv1d(LAT, CT, 1)
        self.proj = tnn.Conv1d(CS, LAT, 1)
        self.denoiser = tnn.Sequential(
            tnn.Conv1d(LAT, LAT, 3, padding=1), tnn.ReLU(),
            tnn.Conv1d(LAT, LAT, 3, padding=1))

    def forward(self, stu, tch):                 # (B, T, C) in
        stu = stu.permute(0, 2, 1)
        tch = tch.permute(0, 2, 1)
        z_t = self.encoder(tch).detach()
        ae = tnn.MSELoss()(self.decoder(z_t), tch)
        x = self.proj(stu)
        for _ in range(STEPS):
            x = x - self.denoiser(x) / STEPS
        return ae + tnn.MSELoss()(x, z_t)


def _t(a):
    return torch.from_numpy(np.array(a, np.float32, copy=True))


def _conv1d(tc, p):
    tc.weight.data = _t(p["kernel"]).permute(2, 1, 0).contiguous()
    tc.bias.data = _t(p["bias"])


def test_diffkd_matches_torch_reference():
    rng = np.random.default_rng(7)
    stu = rng.normal(size=(B, T, CS)).astype(np.float32)
    tch = rng.normal(size=(B, T, CT)).astype(np.float32)

    mod = DiffKDModule(DiffKDConfig(steps=STEPS, teacher_dim=CT,
                                    student_dim=CS, latent_dim=LAT))
    variables = mod.init(jax.random.key(0), jnp.asarray(stu), jnp.asarray(tch))
    params = jax.tree_util.tree_map(
        lambda a: a + 0.05 * jnp.asarray(
            rng.normal(size=a.shape).astype(np.float32)),
        variables["params"])

    tm = TDiffKD()
    _conv1d(tm.encoder, params["encoder"])
    _conv1d(tm.decoder, params["decoder"])
    _conv1d(tm.proj, params["proj"])
    _conv1d(tm.denoiser[0], params["denoiser_conv1"])
    _conv1d(tm.denoiser[2], params["denoiser_conv2"])

    with torch.no_grad():
        want = float(tm(_t(stu), _t(tch)))
    got = float(mod.apply({"params": params}, jnp.asarray(stu),
                          jnp.asarray(tch)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
