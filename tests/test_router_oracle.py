"""Torch-oracle parity for DynamicStepRouter's deterministic paths
(asr_train.py:1021-1218): GAP-reduce -> projections -> concat(+layer emb)
-> MLP -> logits/probs/expected_steps, eval argmax steps, min_steps mask,
and the entropy regularizer formula. (The Gumbel-sampled train steps and
the budget term built from them are stochastic and not cross-framework
comparable; their formulas are pinned in tests/test_kd.py.)"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tpu_asr.config import RouterConfig  # noqa: E402
from tpu_asr.kd.router import DynamicStepRouter  # noqa: E402

B, T, CS, CT, P, HID, K, E, NL = 3, 21, 10, 14, 12, 16, 8, 6, 4


class TRouter(tnn.Module):
    def __init__(self, min_steps):
        super().__init__()
        self.min_steps = min_steps
        self.stu_proj = tnn.Sequential(tnn.Linear(CS, P), tnn.ReLU())
        self.tch_proj = tnn.Sequential(tnn.Linear(CT, P), tnn.ReLU())
        self.layer_emb = tnn.Embedding(NL, E)
        self.router = tnn.Sequential(tnn.Linear(2 * P + E, HID), tnn.ReLU(),
                                     tnn.Linear(HID, K))

    def forward(self, stu, tch, layer_id):
        # reference input normalization: (B,T,C) -> (B,C,T), reduce over T
        stu = stu.transpose(1, 2).mean(-1)
        tch = tch.transpose(1, 2).mean(-1)
        lid = torch.full((stu.shape[0],), layer_id, dtype=torch.long)
        h = torch.cat([self.stu_proj(stu), self.tch_proj(tch),
                       self.layer_emb(lid)], -1)
        logits = self.router(h)
        if self.min_steps > 1:
            mask = torch.zeros(K)
            mask[: self.min_steps - 1] = float("-inf")
            logits = logits + mask
        probs = F.softmax(logits, -1)
        expected = (probs * torch.arange(1, K + 1)).sum(-1)
        steps = probs.argmax(-1) + 1
        entropy = -(probs * probs.clamp_min(1e-8).log()).sum(-1).mean()
        return steps, probs, expected, entropy


def _t(a):
    return torch.from_numpy(np.array(a, np.float32, copy=True))


def _dense(tl, p):
    tl.weight.data = _t(p["kernel"]).T.contiguous()
    tl.bias.data = _t(p["bias"])


@pytest.mark.parametrize("min_steps", [1, 3])
def test_router_eval_matches_torch_reference(min_steps):
    rng = np.random.default_rng(min_steps)
    stu = rng.normal(size=(B, T, CS)).astype(np.float32)
    tch = rng.normal(size=(B, T, CT)).astype(np.float32)

    cfg = RouterConfig(max_steps=K, min_steps=min_steps, stu_dim=CS,
                       tch_dim=CT, hidden_dim=HID, proj_dim=P,
                       use_layer_id=True, num_layers=NL, layer_emb_dim=E,
                       entropy_weight=0.01)
    mod = DynamicStepRouter(cfg)
    variables = mod.init({"params": jax.random.key(0),
                          "gumbel": jax.random.key(1)},
                         jnp.asarray(stu), jnp.asarray(tch), 2, train=False)
    params = jax.tree_util.tree_map(
        lambda a: a + 0.3 * jnp.asarray(
            rng.normal(size=a.shape).astype(np.float32)),
        variables["params"])

    tr = TRouter(min_steps)
    _dense(tr.stu_proj[0], params["stu_proj"])
    _dense(tr.tch_proj[0], params["tch_proj"])
    tr.layer_emb.weight.data = _t(params["layer_emb"]["embedding"])
    _dense(tr.router[0], params["router_fc1"])
    _dense(tr.router[2], params["router_fc2"])

    with torch.no_grad():
        want_steps, want_probs, want_exp, want_ent = tr(_t(stu), _t(tch), 2)

    steps, loss, aux = mod.apply({"params": params}, jnp.asarray(stu),
                                 jnp.asarray(tch), 2, train=False)
    np.testing.assert_array_equal(np.asarray(steps), want_steps.numpy())
    np.testing.assert_allclose(np.asarray(aux["probs"]), want_probs.numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(aux["expected_steps"]),
                               want_exp.numpy(), rtol=1e-5, atol=1e-6)
    assert float(loss) == 0.0                       # eval: no regularizers

    # entropy regularizer formula: run train-mode with budget off; the
    # entropy term is computed from the DETERMINISTIC probs
    cfg2 = RouterConfig(max_steps=K, min_steps=min_steps, stu_dim=CS,
                        tch_dim=CT, hidden_dim=HID, proj_dim=P,
                        use_layer_id=True, num_layers=NL, layer_emb_dim=E,
                        budget_target=None, entropy_weight=0.01)
    _, loss_tr, _ = DynamicStepRouter(cfg2).apply(
        {"params": params}, jnp.asarray(stu), jnp.asarray(tch), 2,
        train=True, rngs={"gumbel": jax.random.key(3)})
    np.testing.assert_allclose(float(loss_tr), float(-0.01 * want_ent),
                               rtol=1e-5, atol=1e-7)
