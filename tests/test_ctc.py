"""CTC loss/decode parity vs torch.nn.CTCLoss (the reference's cuDNN-backed loss,
NeMo ctc.py:25-82) and hand-computed greedy decoding."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from tpu_asr.ops.ctc import ctc_loss, ctc_forward_logprob, ctc_greedy_decode


def _rand_problem(rng, b=4, t=50, v=12, s_max=15):
    logits = rng.standard_normal((b, t, v)).astype(np.float32)
    log_probs = torch.log_softmax(torch.tensor(logits), dim=-1).numpy()
    input_lengths = rng.integers(t // 2, t + 1, size=b)
    target_lengths = rng.integers(1, s_max + 1, size=b)
    targets = rng.integers(0, v - 1, size=(b, s_max))  # blank = v-1 never a target
    return log_probs, targets, input_lengths, target_lengths


def torch_ctc(log_probs, targets, input_lengths, target_lengths, v):
    lp = torch.tensor(log_probs).transpose(0, 1)  # (T, B, V)
    tgt = torch.tensor(targets, dtype=torch.long)
    return torch.nn.CTCLoss(blank=v - 1, reduction="none", zero_infinity=True)(
        lp, tgt, torch.tensor(input_lengths), torch.tensor(target_lengths)
    ).numpy()


def test_ctc_loss_parity(rng):
    log_probs, targets, il, tl, = _rand_problem(rng)
    v = log_probs.shape[-1]
    ref = torch_ctc(log_probs, targets, il, tl, v)
    got = np.asarray(ctc_forward_logprob(
        jnp.asarray(log_probs), jnp.asarray(targets), jnp.asarray(il), jnp.asarray(tl)
    ))
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)


def test_ctc_loss_repeated_labels(rng):
    # repeated labels force the skip-transition mask to matter
    b, t, v, s = 2, 30, 6, 8
    logits = rng.standard_normal((b, t, v)).astype(np.float32)
    log_probs = torch.log_softmax(torch.tensor(logits), dim=-1).numpy()
    targets = np.array([[1, 1, 2, 2, 2, 3, 1, 1], [4, 4, 4, 4, 1, 2, 3, 4]])
    il = np.array([30, 25])
    tl = np.array([8, 8])
    ref = torch_ctc(log_probs, targets, il, tl, v)
    got = np.asarray(ctc_forward_logprob(
        jnp.asarray(log_probs), jnp.asarray(targets), jnp.asarray(il), jnp.asarray(tl)
    ))
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)


def test_ctc_grad_parity(rng):
    # Compare gradients w.r.t. LOGITS through log_softmax on both sides: torch's CTC
    # backward folds the log-softmax jacobian in (it returns the logits gradient), so
    # grads w.r.t. log_probs are not directly comparable — composed with log_softmax
    # both frameworks must agree.
    b, t, v, s_max = 3, 20, 8, 6
    logits = rng.standard_normal((b, t, v)).astype(np.float32)
    targets = rng.integers(0, v - 1, size=(b, s_max))
    il = rng.integers(t // 2, t + 1, size=b)
    tl = rng.integers(1, s_max + 1, size=b)

    lg_t = torch.tensor(logits, requires_grad=True)
    lp_t = torch.log_softmax(lg_t, dim=-1)
    loss_t = torch.nn.CTCLoss(blank=v - 1, reduction="none", zero_infinity=True)(
        lp_t.transpose(0, 1), torch.tensor(targets, dtype=torch.long),
        torch.tensor(il), torch.tensor(tl),
    ).mean()
    loss_t.backward()
    ref_grad = lg_t.grad.numpy()

    f = lambda lg: jnp.mean(ctc_forward_logprob(
        jax.nn.log_softmax(lg, axis=-1), jnp.asarray(targets), jnp.asarray(il), jnp.asarray(tl)))
    got_grad = np.asarray(jax.grad(f)(jnp.asarray(logits)))
    np.testing.assert_allclose(got_grad, ref_grad, atol=1e-4, rtol=1e-3)


def test_ctc_zero_infinity():
    # target longer than input -> infeasible -> inf -> zeroed
    b, t, v, s = 1, 3, 5, 10
    log_probs = np.log(np.full((b, t, v), 1.0 / v, dtype=np.float32))
    targets = np.ones((b, s), dtype=np.int32)
    out = ctc_loss(jnp.asarray(log_probs), jnp.asarray(targets),
                   jnp.asarray([t]), jnp.asarray([s]), reduction="none")
    assert float(out[0]) == 0.0


def test_ctc_reductions(rng):
    log_probs, targets, il, tl = _rand_problem(rng)
    args = (jnp.asarray(log_probs), jnp.asarray(targets), jnp.asarray(il), jnp.asarray(tl))
    none = np.asarray(ctc_loss(*args, reduction="none"))
    assert np.isclose(float(ctc_loss(*args, reduction="mean_batch")), none.mean(), atol=1e-5)
    assert np.isclose(float(ctc_loss(*args, reduction="sum")), none.sum(), atol=1e-4)
    mv = none.sum() / tl.sum()
    assert np.isclose(float(ctc_loss(*args, reduction="mean_volume")), mv, atol=1e-5)


def test_greedy_decode():
    v = 5  # blank = 4
    # sequence: a a blank a b b blank blank c
    ids = np.array([[0, 0, 4, 0, 1, 1, 4, 4, 2]])
    log_probs = np.full((1, 9, v), -10.0, dtype=np.float32)
    for t, i in enumerate(ids[0]):
        log_probs[0, t, i] = 0.0
    toks, n = ctc_greedy_decode(jnp.asarray(log_probs), jnp.asarray([9]))
    toks, n = np.asarray(toks), np.asarray(n)
    assert n[0] == 4
    np.testing.assert_array_equal(toks[0, :4], [0, 0, 1, 2])
    assert np.all(toks[0, 4:] == -1)
    # honor lengths: truncate at 4 -> a (repeats collapsed)
    toks2, n2 = ctc_greedy_decode(jnp.asarray(log_probs), jnp.asarray([4]))
    assert int(n2[0]) == 2
    np.testing.assert_array_equal(np.asarray(toks2)[0, :2], [0, 0])
