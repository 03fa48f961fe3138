"""CTC loss and greedy decoding — TPU-native.

Replaces the reference's cuDNN CTC (NeMo/nemo/collections/asr/losses/ctc.py:25-82, which
wraps `torch.nn.CTCLoss` with blank = num_classes (last index), `zero_infinity=True`,
reductions `mean_batch` / `mean_volume`) with a log-space forward recursion implemented
as a single `lax.scan` over time. Everything is batched and length-masked with static
shapes; gradients flow through the scan via autodiff (XLA rematerializes efficiently).

Greedy decoding (collapse repeats, drop blanks) is fully vectorized on device — the
contract of the snapshot-stripped `ctc_decoding.py` greedy path (see SURVEY.md N10).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1.0e30


def _interleave_blanks(targets: jnp.ndarray, blank: int) -> jnp.ndarray:
    """(B, S) labels -> (B, 2S+1) extended labels [blank, y1, blank, y2, ..., blank]."""
    b, s = targets.shape
    ext = jnp.full((b, 2 * s + 1), blank, dtype=targets.dtype)
    return ext.at[:, 1::2].set(targets)


def ctc_forward_logprob(
    log_probs: jnp.ndarray,       # (B, T, V) log-softmax outputs; blank index = V-1
    targets: jnp.ndarray,         # (B, S) int labels (padded arbitrarily beyond target_length)
    input_lengths: jnp.ndarray,   # (B,)
    target_lengths: jnp.ndarray,  # (B,)
    blank: Optional[int] = None,
) -> jnp.ndarray:
    """Per-sample CTC negative log likelihood, shape (B,). Unreduced, un-normalized
    (same contract as torch.nn.CTCLoss(reduction='none'))."""
    b, t_max, v = log_probs.shape
    if blank is None:
        blank = v - 1
    s = targets.shape[1]
    l = 2 * s + 1

    ext = _interleave_blanks(targets, blank)                    # (B, L)
    # positions beyond 2*target_length are invalid
    pos = jnp.arange(l)[None, :]                                # (1, L)
    valid_pos = pos <= 2 * target_lengths[:, None]              # (B, L)

    # can we skip from s-2 (label differs and current is non-blank)?
    ext_prev2 = jnp.concatenate([jnp.full((b, 2), blank, ext.dtype), ext[:, :-2]], axis=1)
    can_skip = (ext != blank) & (ext != ext_prev2) & (pos >= 2)

    # gather per-step label log-probs up front: (B, T, L)
    lp_labels = jnp.take_along_axis(log_probs, ext[:, None, :].astype(jnp.int32), axis=2)

    alpha0 = jnp.full((b, l), NEG_INF)
    alpha0 = alpha0.at[:, 0].set(lp_labels[:, 0, 0])
    has_label = target_lengths > 0
    alpha0 = alpha0.at[:, 1].set(jnp.where(has_label, lp_labels[:, 0, 1], NEG_INF))
    alpha0 = jnp.where(valid_pos, alpha0, NEG_INF)

    t_idx = jnp.arange(1, t_max)

    def step(alpha, t):
        lp_t = lp_labels[:, t, :]                               # (B, L)
        a_prev1 = jnp.concatenate([jnp.full((b, 1), NEG_INF), alpha[:, :-1]], axis=1)
        a_prev2 = jnp.concatenate([jnp.full((b, 2), NEG_INF), alpha[:, :-2]], axis=1)
        a_prev2 = jnp.where(can_skip, a_prev2, NEG_INF)
        stacked = jnp.stack([alpha, a_prev1, a_prev2], axis=0)
        m = jnp.max(stacked, axis=0)
        summed = m + jnp.log(jnp.sum(jnp.exp(stacked - m[None]), axis=0))
        new_alpha = jnp.where(m <= NEG_INF / 2, NEG_INF, summed) + lp_t
        new_alpha = jnp.where(valid_pos, new_alpha, NEG_INF)
        # freeze once past this sample's input length
        active = (t < input_lengths)[:, None]
        return jnp.where(active, new_alpha, alpha), None

    # unroll amortizes per-iteration scan overhead on the sequential T loop
    alpha_final, _ = jax.lax.scan(step, alpha0, t_idx, unroll=8)

    # final: logsumexp(alpha[2S], alpha[2S-1]) at S = target_length
    idx_last = (2 * target_lengths).astype(jnp.int32)           # (B,)
    a_last = jnp.take_along_axis(alpha_final, idx_last[:, None], axis=1)[:, 0]
    idx_prev = jnp.maximum(idx_last - 1, 0)
    a_prev = jnp.take_along_axis(alpha_final, idx_prev[:, None], axis=1)[:, 0]
    a_prev = jnp.where(target_lengths > 0, a_prev, NEG_INF)
    m = jnp.maximum(a_last, a_prev)
    ll = m + jnp.log(jnp.exp(a_last - m) + jnp.exp(a_prev - m))
    return -ll


def ctc_loss(
    log_probs: jnp.ndarray,
    targets: jnp.ndarray,
    input_lengths: jnp.ndarray,
    target_lengths: jnp.ndarray,
    blank: Optional[int] = None,
    reduction: str = "mean_batch",
    zero_infinity: bool = True,
    backend: str = "auto",
) -> jnp.ndarray:
    """CTC loss matching NeMo's reduction semantics (ctc.py:25-82).

    reduction: 'mean_batch' (mean of per-sample NLLs), 'mean' (torch 'mean': per-sample
    NLL / target_length, then batch mean), 'mean_volume' (sum / total target tokens),
    'sum', or 'none'.
    backend: 'auto' runs the single-launch Pallas forward-backward kernel on
    TPU (ops/pallas_ctc.py) and the lax.scan recursion elsewhere.
    """
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "scan"
    if backend == "pallas":
        from tpu_asr.ops.pallas_ctc import ctc_nll_pallas
        v = log_probs.shape[-1]
        nll = ctc_nll_pallas(log_probs, targets, input_lengths, target_lengths,
                             blank if blank is not None else v - 1)
    else:
        nll = ctc_forward_logprob(log_probs, targets, input_lengths,
                                  target_lengths, blank)
    if zero_infinity:
        bad = ~jnp.isfinite(nll) | (nll >= -NEG_INF / 2)
        nll = jnp.where(bad, 0.0, nll)
    if reduction == "none":
        return nll
    if reduction == "mean_batch":
        return jnp.mean(nll)
    if reduction == "sum":
        return jnp.sum(nll)
    if reduction == "mean":
        return jnp.mean(nll / jnp.maximum(target_lengths.astype(nll.dtype), 1.0))
    if reduction == "mean_volume":
        return jnp.sum(nll) / jnp.maximum(jnp.sum(target_lengths).astype(nll.dtype), 1.0)
    raise ValueError(f"unknown reduction: {reduction}")


def ctc_greedy_decode(
    log_probs: jnp.ndarray,      # (B, T, V), blank = V-1
    lengths: jnp.ndarray,        # (B,)
    blank: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy CTC decode fully on device.

    Returns (tokens (B, T) int32 left-packed with -1 padding, n_tokens (B,)).
    Collapse repeats, then drop blanks, honoring per-sample lengths.
    """
    b, t, v = log_probs.shape
    if blank is None:
        blank = v - 1
    ids = jnp.argmax(log_probs, axis=-1).astype(jnp.int32)      # (B, T)
    prev = jnp.concatenate([jnp.full((b, 1), -1, jnp.int32), ids[:, :-1]], axis=1)
    t_idx = jnp.arange(t)[None, :]
    keep = (ids != blank) & (ids != prev) & (t_idx < lengths[:, None])
    # left-pack kept tokens: position = cumsum(keep) - 1
    pos = jnp.cumsum(keep.astype(jnp.int32), axis=1) - 1
    n_tokens = jnp.sum(keep.astype(jnp.int32), axis=1)
    # scatter kept ids to their packed positions; dropped ids go out of bounds (mode='drop')
    scatter_pos = jnp.where(keep, pos, t)
    out = jax.vmap(
        lambda p, i: jnp.full((t,), -1, jnp.int32).at[p].set(i, mode="drop")
    )(scatter_pos, ids)
    return out, n_tokens


def ctc_greedy_decode_with_timestamps(
    log_probs: jnp.ndarray,
    lengths: jnp.ndarray,
    blank: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Greedy decode + per-token emission frame indices (the decoding
    `timestamps` feature — snapshot-stripped ctc_decoding contract, SURVEY.md
    N10). Returns (tokens (B, T), n_tokens (B,), frames (B, T) int32, -1 pad):
    frames[b, j] is the first encoder frame of packed token j (multiply by the
    subsampling factor x hop for audio time)."""
    b, t, v = log_probs.shape
    if blank is None:
        blank = v - 1
    ids = jnp.argmax(log_probs, axis=-1).astype(jnp.int32)
    prev = jnp.concatenate([jnp.full((b, 1), -1, jnp.int32), ids[:, :-1]], axis=1)
    t_idx = jnp.arange(t)[None, :]
    keep = (ids != blank) & (ids != prev) & (t_idx < lengths[:, None])
    pos = jnp.cumsum(keep.astype(jnp.int32), axis=1) - 1
    n_tokens = jnp.sum(keep.astype(jnp.int32), axis=1)
    scatter_pos = jnp.where(keep, pos, t)

    def pack(p, val):
        return jax.vmap(
            lambda pp, vv: jnp.full((t,), -1, jnp.int32).at[pp].set(
                vv, mode="drop"))(p, val)

    tokens = pack(scatter_pos, ids)
    frames = pack(scatter_pos, jnp.broadcast_to(t_idx, (b, t)).astype(jnp.int32))
    return tokens, n_tokens, frames


def ctc_greedy_decode_full(
    log_probs: jnp.ndarray,      # (B, T, V), blank = V-1
    lengths: jnp.ndarray,        # (B,)
    blank: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Greedy decode with full per-token extent + raw frame labels — feeds the
    decoding layer's timestamp-offset dict, alignments, and confidence
    aggregation (snapshot-stripped ctc_decoding contract; offset semantics
    pinned by NeMo/tests/collections/asr/decoding/test_timestamps.py).

    Returns (tokens (B,T), n_tokens (B,), starts (B,T), ends (B,T), labels
    (B,T)): starts[b,j]/ends[b,j] are the FIRST and LAST encoder frame of
    packed token j's emission run (inclusive; -1 pad), labels[b,t] the raw
    per-frame argmax before collapse (the `preserve_alignments` payload).

    A "token" is a maximal run of identical non-blank argmax frames — starts
    mark run heads (ids != prev), ends mark run tails (ids != next, or the
    last valid frame when the run touches the length boundary), so the k-th
    start pairs with the k-th end by construction.
    """
    b, t, v = log_probs.shape
    if blank is None:
        blank = v - 1
    ids = jnp.argmax(log_probs, axis=-1).astype(jnp.int32)
    prev = jnp.concatenate([jnp.full((b, 1), -1, jnp.int32), ids[:, :-1]], axis=1)
    nxt = jnp.concatenate([ids[:, 1:], jnp.full((b, 1), -1, jnp.int32)], axis=1)
    t_idx = jnp.arange(t)[None, :]
    valid = t_idx < lengths[:, None]
    keep_s = (ids != blank) & (ids != prev) & valid
    keep_e = (ids != blank) & ((ids != nxt) | (t_idx == lengths[:, None] - 1)) & valid
    pos_s = jnp.cumsum(keep_s.astype(jnp.int32), axis=1) - 1
    pos_e = jnp.cumsum(keep_e.astype(jnp.int32), axis=1) - 1
    n_tokens = jnp.sum(keep_s.astype(jnp.int32), axis=1)

    def pack(keep, p, val):
        sp = jnp.where(keep, p, t)
        return jax.vmap(
            lambda pp, vv: jnp.full((t,), -1, jnp.int32).at[pp].set(
                vv, mode="drop"))(sp, val)

    frames = jnp.broadcast_to(t_idx, (b, t)).astype(jnp.int32)
    tokens = pack(keep_s, pos_s, ids)
    starts = pack(keep_s, pos_s, frames)
    ends = pack(keep_e, pos_e, frames)
    return tokens, n_tokens, starts, ends, ids
