"""Torch-oracle parity for the diffm latent pipeline (asr_train_diffm.py
400-497 + _compute_v_losses_one_layer :645-729), deterministic versions:

- v1 (AE + latent KD) and v2 (AE + latent FM, mlp meta, identity transform):
  loss-component parity against a torch rebuild.
- v1 GRADIENT parity on the teacher-AE encoder: the reference computes
  recon = dec(enc(t)) BEFORE z_t.detach(), so the recon loss trains the
  encoder too — pins the detach ORDER (a forward-only test cannot see it).
- SimpleDenoiser forward parity (the stochastic NoiseAdapter versions are
  not oracle-testable across frameworks; its deterministic gamma head is
  covered by construction in test_kd.py).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tpu_asr.config import DiffmConfig, FlowMatchingConfig  # noqa: E402
from tpu_asr.kd.diffm import LatentKDPipeline, SimpleDenoiser  # noqa: E402

B, T, CS, CT, LAT, TED, HID, N = 2, 13, 10, 16, 8, 6, 12, 3


def _t(a):
    return torch.from_numpy(np.array(a, np.float32, copy=True))


def _dense(tl, p):
    tl.weight.data = _t(p["kernel"]).T.contiguous()
    tl.bias.data = _t(p["bias"])


def _conv1d(tc, p):
    tc.weight.data = _t(p["kernel"]).permute(2, 1, 0).contiguous()
    tc.bias.data = _t(p["bias"])


class TLatent(tnn.Module):
    def __init__(self, version):
        super().__init__()
        self.version = version
        self.enc = tnn.Conv1d(CT, LAT, 1)
        self.dec = tnn.Conv1d(LAT, CT, 1)
        self.proj = tnn.Conv1d(CS, LAT, 1)
        self.time_embed = tnn.Linear(1, TED)
        self.fm = tnn.Sequential(tnn.Linear(LAT + TED, HID), tnn.ReLU(),
                                 tnn.Linear(HID, LAT))

    def forward(self, s_btc, t_btc):
        s = s_btc.permute(0, 2, 1)                  # (B, C, T)
        t = t_btc.permute(0, 2, 1)
        z_t = self.enc(t)
        rec = self.dec(z_t)                         # BEFORE detach: recon
        recon = tnn.MSELoss()(rec, t)               # trains enc AND dec
        z_t = z_t.detach()
        z_s = self.proj(s)
        if self.version == 1:
            return recon, tnn.MSELoss()(z_s, z_t)
        # v2: latent FM (identity transform, rectified schedule, mlp meta)
        x = z_s.permute(0, 2, 1)                    # FM works (B, T, L)
        z_tl = z_t.permute(0, 2, 1)
        for i in range(N, 0, -1):
            tt = torch.full((B, T, 1), i / N)
            v = self.fm(torch.cat([x, self.time_embed(tt)], -1))
            x = x - v / N
        s_fl = z_s.permute(0, 2, 1)
        x_hat = (1.0 * s_fl - v) / -(-1.0)          # rectified derivs (1, -1)
        return recon, tnn.MSELoss()(x_hat, z_tl)


def _build(version, rng):
    cfg = DiffmConfig(
        model_version=version, latent_dim=LAT, student_dim=CS,
        teacher_dim=CT,
        fm=FlowMatchingConfig(meta_encoder_type="mlp", time_embed_dim=TED,
                              hidden_dim=HID, training_sampling=N,
                              inference_sampling=N,
                              noise_schedule="rectified"))
    mod = LatentKDPipeline(cfg)
    stu = rng.normal(size=(B, T, CS)).astype(np.float32)
    tch = rng.normal(size=(B, T, CT)).astype(np.float32)
    variables = mod.init({"params": jax.random.key(0),
                          "noise": jax.random.key(1)},
                         jnp.asarray(stu), jnp.asarray(tch), train=True)
    params = jax.tree_util.tree_map(
        lambda a: a + 0.05 * jnp.asarray(
            rng.normal(size=a.shape).astype(np.float32)),
        variables["params"])
    tm = TLatent(version)
    _conv1d(tm.enc, params["tae_enc"])
    _conv1d(tm.dec, params["tae_dec"])
    _conv1d(tm.proj, params["sproj"])
    if version == 2:
        pe = params["fm_latent"]["euler"]
        _dense(tm.time_embed, pe["time_embed"])
        _dense(tm.fm[0], pe["meta_encoder"]["fc1"])
        _dense(tm.fm[2], pe["meta_encoder"]["fc2"])
    return mod, params, tm, stu, tch


@pytest.mark.parametrize("version", [1, 2])
def test_diffm_losses_match_torch_reference(version):
    rng = np.random.default_rng(100 + version)
    mod, params, tm, stu, tch = _build(version, rng)
    with torch.no_grad():
        recon_w, other_w = tm(_t(stu), _t(tch))
    out = mod.apply({"params": params, }, jnp.asarray(stu), jnp.asarray(tch),
                    train=True, rngs={"noise": jax.random.key(2)})
    np.testing.assert_allclose(float(out["recon_loss"]), float(recon_w),
                               rtol=1e-5, atol=1e-6)
    key = "kd_loss_pre" if version == 1 else "fm_loss_pre"
    np.testing.assert_allclose(float(out[key]), float(other_w),
                               rtol=2e-4, atol=1e-5)


def test_diffm_recon_grad_trains_encoder():
    """Detach-order pin: d(recon)/d(tae_enc.kernel) must match torch's,
    and be nonzero (the reference detaches AFTER reconstructing)."""
    rng = np.random.default_rng(42)
    mod, params, tm, stu, tch = _build(1, rng)

    def loss(p):
        out = mod.apply({"params": p}, jnp.asarray(stu), jnp.asarray(tch),
                        train=True, rngs={"noise": jax.random.key(2)})
        return out["recon_loss"]

    g = jax.grad(loss)(params)["tae_enc"]["kernel"]
    recon_w, _ = tm(_t(stu), _t(tch))
    recon_w.backward()
    g_torch = tm.enc.weight.grad.numpy().transpose(2, 1, 0)  # -> flax layout
    assert float(jnp.max(jnp.abs(g))) > 1e-4
    np.testing.assert_allclose(np.asarray(g), g_torch, rtol=1e-4, atol=1e-6)
