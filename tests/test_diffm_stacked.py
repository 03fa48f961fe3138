"""diffm layers-into-batch equivalence (VERDICT r3 item 4).

The distil model no longer nn.vmaps LatentKDPipeline over the layer axis;
it stacks layers into the batch (B-MAJOR) and passes loss_layers=L.  Params
are shared across layers, so for the deterministic versions the stacked
losses must EQUAL the per-layer-loop sum the vmap produced (reference
aggregation, asr_train_diffm.py:788-792).  This is also what makes the
fused Euler kernel (ops/pallas_fm.py, custom_partitioning: no batching
rule) available under diffm — exercised in interpret mode here.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_asr.config import DiffmConfig, FlowMatchingConfig
from tpu_asr.kd.diffm import LatentKDPipeline

L, B, T, CS, CT, LAT = 3, 2, 6, 12, 16, 8


def _cfg(version, euler_backend="xla"):
    return DiffmConfig(
        model_version=version, latent_dim=LAT, student_dim=CS,
        teacher_dim=CT,
        fm=FlowMatchingConfig(student_dim=LAT, teacher_dim=LAT,
                              hidden_dim=16, training_sampling=3,
                              meta_encoder_type="mlp",
                              euler_backend=euler_backend))


def _feats(rng):
    s = jnp.asarray(rng.standard_normal((L, B, T, CS)).astype(np.float32))
    t = jnp.asarray(rng.standard_normal((L, B, T, CT)).astype(np.float32))
    return s, t


def _stack(z):
    return z.transpose(1, 0, 2, 3).reshape((B * L,) + z.shape[2:])


@pytest.mark.parametrize("version", [1, 2])
def test_stacked_equals_per_layer_sum(version, rng):
    """Deterministic versions (v1 kd, v2 FM/mlp): stacked + loss_layers=L
    reproduces sum_l of per-layer losses exactly (up to fp reassociation)."""
    pipe = LatentKDPipeline(_cfg(version))
    s, t = _feats(rng)
    rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}
    variables = pipe.init(rngs, _stack(s), _stack(t), train=True,
                          loss_layers=L)

    stacked = pipe.apply(variables, _stack(s), _stack(t), train=True,
                         loss_layers=L, rngs={"noise": jax.random.PRNGKey(2)})
    looped = {}
    for l in range(L):
        one = pipe.apply(variables, s[l], t[l], train=True,
                         rngs={"noise": jax.random.PRNGKey(2)})
        for k, v in one.items():
            looped[k] = looped.get(k, 0.0) + np.float64(v)
    for k in stacked:
        np.testing.assert_allclose(np.asarray(stacked[k]), looped[k],
                                   rtol=2e-5, atol=1e-6, err_msg=k)


@pytest.mark.parametrize("version", [5, 6])
def test_noise_versions_stacked_structure(version, rng):
    """Noise-drawing versions: the stacked pass runs, the deterministic
    recon component still matches the loop exactly, and the FM losses are
    finite (noise draws differ only in stream assignment)."""
    pipe = LatentKDPipeline(_cfg(version))
    s, t = _feats(rng)
    rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}
    variables = pipe.init(rngs, _stack(s), _stack(t), train=True,
                          loss_layers=L)
    stacked = pipe.apply(variables, _stack(s), _stack(t), train=True,
                         loss_layers=L, rngs={"noise": jax.random.PRNGKey(2)})
    recon_loop = sum(
        np.float64(pipe.apply(variables, s[l], t[l], train=True,
                              rngs={"noise": jax.random.PRNGKey(2)}
                              )["recon_loss"])
        for l in range(L))
    np.testing.assert_allclose(np.asarray(stacked["recon_loss"]), recon_loop,
                               rtol=2e-5)
    for k, v in stacked.items():
        assert np.isfinite(np.asarray(v)), k


def test_latent_fm_fused_kernel_active_under_diffm(rng):
    """euler_backend='pallas' now reaches the latent FM (the r3 pin is
    gone): the fused kernel path must produce the same v2 losses as the
    XLA scan (interpret mode on CPU)."""
    s, t = _feats(rng)
    rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}
    outs = {}
    for backend in ("xla", "pallas"):
        pipe = LatentKDPipeline(_cfg(2, euler_backend=backend))
        variables = pipe.init(rngs, _stack(s), _stack(t), train=True,
                              loss_layers=L)
        outs[backend] = pipe.apply(
            variables, _stack(s), _stack(t), train=True, loss_layers=L,
            rngs={"noise": jax.random.PRNGKey(2)})
    np.testing.assert_allclose(np.asarray(outs["pallas"]["fm_loss_pre"]),
                               np.asarray(outs["xla"]["fm_loss_pre"]),
                               rtol=2e-4, atol=1e-5)
