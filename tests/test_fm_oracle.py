"""Torch-oracle parity for FlowMatchingModule (FM-KT core).

Rebuilds the reference's FlowMatchingModule forward (asr_train.py:1318-1377)
in torch — Euler loop x <- x - v(x,t)/N for t = N/N..1/N, time-embedding
concat (channel order [x; embed_t]), per-meta-type layouts, last-velocity
training loss through the schedule derivative and the linear shape
transform, MSELoss mean — copies OUR flax params into it, and pins loss
AND the propagated x for meta types mlp/cnn/swin and schedules
rectified/vp_ode. (conformer's encoder internals are pinned separately in
test_meta_oracle.py; ve_ode's dsigma_dt=0 makes the reference loss a
division by zero — a documented quirk, not oracle-testable.)"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tpu_asr.config import FlowMatchingConfig  # noqa: E402
from tpu_asr.kd.flow_matching import FlowMatchingModule  # noqa: E402

B, T, CS, CT, TED, HID, HEADS, N = 2, 19, 12, 20, 8, 16, 2, 4


class TSwin(tnn.Module):
    def __init__(self, d_in, d_out, heads):
        super().__init__()
        self.attn = tnn.MultiheadAttention(d_in, heads)
        self.linear1 = tnn.Linear(d_in, d_out)
        self.linear2 = tnn.Linear(d_out, d_out)

    def forward(self, x):                        # (B, C, T)
        x_seq = x.permute(2, 0, 1)
        a, _ = self.attn(x_seq, x_seq, x_seq)
        h = a.permute(1, 0, 2)                   # (B, T, C)
        h = self.linear2(tnn.functional.relu(self.linear1(h)))
        return h.permute(0, 2, 1)                # (B, C_out, T)


def _deriv(name, t):
    if name == "rectified":
        return torch.ones_like(t), -torch.ones_like(t)
    a, b = 19.9, 0.1
    alpha = torch.exp(-0.25 * a * (1 - t) ** 2 - 0.5 * b * (1 - t))
    dalpha = alpha * (0.5 * a * (1 - t) + 0.5 * b)
    sigma = torch.sqrt(1 - alpha ** 2)
    return dalpha, -alpha * dalpha / sigma


class TFM(tnn.Module):
    def __init__(self, meta):
        super().__init__()
        self.meta_type = meta
        self.time_embed = tnn.Linear(1, TED)
        d_in = CS + TED
        if meta == "mlp":
            self.meta = tnn.Sequential(tnn.Linear(d_in, HID), tnn.ReLU(),
                                       tnn.Linear(HID, CS))
        elif meta == "cnn":
            self.meta = tnn.Sequential(tnn.Conv1d(d_in, CS, 3, padding=1),
                                       tnn.ReLU(), tnn.Conv1d(CS, CS, 1))
        else:
            self.meta = TSwin(d_in, CS, HEADS)
        self.st = tnn.Linear(CS, CT)

    def forward(self, s_f, t_f, schedule):
        x = s_f
        for i in range(N, 0, -1):
            t = torch.full((B, T, 1), i / N)
            e = self.time_embed(t)
            if self.meta_type == "mlp":
                v = self.meta(torch.cat([x, e], -1))
            else:
                ch = torch.cat([x.permute(0, 2, 1), e.permute(0, 2, 1)], 1)
                v = self.meta(ch).permute(0, 2, 1)
            x = x - v / N
        dalpha, dsigma = _deriv(schedule, t)
        x_hat = (dalpha * s_f - v) / (-dsigma)
        loss = tnn.MSELoss()(self.st(x_hat), t_f)
        return loss, x


def _t(a):
    return torch.from_numpy(np.array(a, np.float32, copy=True))


def _dense(tl, p):
    tl.weight.data = _t(p["kernel"]).T.contiguous()
    tl.bias.data = _t(p["bias"])


def _conv1d(tc, p):
    tc.weight.data = _t(p["kernel"]).permute(2, 1, 0).contiguous()
    tc.bias.data = _t(p["bias"])


def _mha(tm, p, d):
    ws = [_t(p[k]["kernel"]).reshape(d, d).T for k in ("query", "key", "value")]
    bs = [_t(p[k]["bias"]).reshape(d) for k in ("query", "key", "value")]
    tm.in_proj_weight.data = torch.cat(ws, 0).contiguous()
    tm.in_proj_bias.data = torch.cat(bs, 0).contiguous()
    tm.out_proj.weight.data = _t(p["out"]["kernel"]).reshape(d, d).T.contiguous()
    tm.out_proj.bias.data = _t(p["out"]["bias"])


@pytest.mark.parametrize("meta", ["mlp", "cnn", "swin"])
@pytest.mark.parametrize("schedule", ["rectified", "vp_ode"])
def test_fm_module_matches_torch_reference(meta, schedule):
    rng = np.random.default_rng(hash((meta, schedule)) % 2 ** 31)
    s_f = rng.normal(size=(B, T, CS)).astype(np.float32)
    t_f = rng.normal(size=(B, T, CT)).astype(np.float32)

    cfg = FlowMatchingConfig(
        meta_encoder_type=meta, time_embed_dim=TED, hidden_dim=HID,
        training_sampling=N, inference_sampling=N, student_dim=CS,
        teacher_dim=CT, student_head_num=HEADS, shape_transform="linear",
        loss="mse", noise_schedule=schedule)
    mod = FlowMatchingModule(cfg)
    variables = mod.init(jax.random.key(0), jnp.asarray(s_f),
                         jnp.asarray(t_f), train=True)
    params = variables["params"]
    # nudge params off their inits so bugs cannot hide behind zeros
    params = jax.tree_util.tree_map(
        lambda a: a + 0.05 * jnp.asarray(
            rng.normal(size=a.shape).astype(np.float32)), params)

    tfm = TFM(meta)
    pe = params["euler"]
    _dense(tfm.time_embed, pe["time_embed"])
    pm = pe["meta_encoder"]
    if meta == "mlp":
        _dense(tfm.meta[0], pm["fc1"])
        _dense(tfm.meta[2], pm["fc2"])
    elif meta == "cnn":
        _conv1d(tfm.meta[0], pm["conv1"])
        _conv1d(tfm.meta[2], pm["conv2"])
    else:
        _mha(tfm.meta.attn, pm["attn"], CS + TED)
        _dense(tfm.meta.linear1, pm["linear1"])
        _dense(tfm.meta.linear2, pm["linear2"])
    _dense(tfm.st, params["shape_transform"])

    with torch.no_grad():
        want_loss, want_x = tfm(_t(s_f), _t(t_f), schedule)

    got_loss, got_x = mod.apply({"params": params}, jnp.asarray(s_f),
                                jnp.asarray(t_f), train=True)
    np.testing.assert_allclose(float(got_loss), float(want_loss),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_x), want_x.numpy(),
                               rtol=2e-4, atol=2e-4)
