"""Torch-oracle parity for the logit-KL distillation loss
(asr_train.py:725-731): double-softmax quirk, temperature scaling,
torch 'batchmean' reduction (divide by B only), * T^2."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from tpu_asr.kd.losses import logit_kl_loss  # noqa: E402


@pytest.mark.parametrize("temperature", [1.0, 2.0, 4.0])
def test_logit_kl_matches_torch(temperature):
    rng = np.random.default_rng(int(temperature))
    b, t, v = 3, 17, 29
    # the model feeds ALREADY log-softmaxed decoder outputs
    stu = np.log(rng.dirichlet(np.ones(v), size=(b, t))).astype(np.float32)
    tch = np.log(rng.dirichlet(np.ones(v), size=(b, t))).astype(np.float32)

    ts, tt = torch.from_numpy(stu), torch.from_numpy(tch)
    want = float(F.kl_div(F.log_softmax(ts / temperature, -1),
                          F.softmax(tt / temperature, -1),
                          reduction="batchmean") * temperature ** 2)
    got = float(logit_kl_loss(jnp.asarray(stu), jnp.asarray(tch),
                              temperature))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
