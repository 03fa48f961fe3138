"""Pallas CTC kernel parity (interpret mode on CPU) against the lax.scan
implementation (itself torch.nn.CTCLoss-parity-tested in test_ctc.py):
values AND gradients, across ragged input/target lengths."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_asr.ops.ctc import ctc_forward_logprob
from tpu_asr.ops.pallas_ctc import ctc_nll_pallas


def _random_case(rng, b=4, t=40, v=12, s=9):
    logits = rng.standard_normal((b, t, v)).astype(np.float32)
    log_probs = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    targets = jnp.asarray(rng.integers(0, v - 1, size=(b, s)), jnp.int32)
    input_lengths = jnp.asarray(
        np.concatenate([[t], rng.integers(s * 2 + 2, t, size=b - 1)]),
        jnp.int32)
    target_lengths = jnp.asarray(
        np.concatenate([[s], rng.integers(1, s, size=b - 1)]), jnp.int32)
    return log_probs, targets, input_lengths, target_lengths, v


def test_ctc_pallas_nll_matches_scan(rng):
    lp, tgt, il, tl, v = _random_case(rng)
    want = np.asarray(ctc_forward_logprob(lp, tgt, il, tl, blank=v - 1))
    got = np.asarray(ctc_nll_pallas(lp, tgt, il, tl, v - 1, True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_ctc_pallas_grads_match_scan(rng):
    lp, tgt, il, tl, v = _random_case(rng, b=4, t=32, v=10, s=7)
    w = jnp.asarray(rng.standard_normal(4).astype(np.float32))

    def loss_scan(lp):
        return jnp.sum(ctc_forward_logprob(lp, tgt, il, tl, blank=v - 1) * w)

    def loss_pallas(lp):
        return jnp.sum(ctc_nll_pallas(lp, tgt, il, tl, v - 1, True) * w)

    np.testing.assert_allclose(float(loss_pallas(lp)), float(loss_scan(lp)),
                               rtol=1e-5)
    g_want = np.asarray(jax.grad(loss_scan)(lp))
    g_got = np.asarray(jax.grad(loss_pallas)(lp))
    np.testing.assert_allclose(g_got, g_want, rtol=1e-4, atol=1e-5)


def test_ctc_pallas_zero_target_length(rng):
    lp, tgt, il, tl, v = _random_case(rng, b=3, t=20, v=8, s=5)
    tl = tl.at[1].set(0)
    want = np.asarray(ctc_forward_logprob(lp, tgt, il, tl, blank=v - 1))
    got = np.asarray(ctc_nll_pallas(lp, tgt, il, tl, v - 1, True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_pick_bc_raises_actionable_error_when_vmem_overflows():
    """ADVICE r2 (low): a batch with no 8-multiple divisor (e.g. 12) whose
    lattice exceeds the VMEM budget must fail with a clear message, not a
    Mosaic compile error."""
    import pytest
    from tpu_asr.ops.pallas_ctc import _pick_bc
    with pytest.raises(ValueError, match="VMEM"):
        _pick_bc(12, t_max=10000, lp_pad=512, n_cubes=2)
    # and a batch that allows small chunks still picks one
    assert _pick_bc(32, t_max=100, lp_pad=128, n_cubes=2) in (8, 16, 32)
