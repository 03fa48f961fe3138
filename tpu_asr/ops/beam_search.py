"""Batched CTC prefix beam search ON DEVICE — the vectorized counterpart of
the host `ops/decoding.py::ctc_prefix_beam_search` oracle (N10 in SURVEY.md;
NeMo's batched beam decoding layer is ~1200 LoC of torch host code — here the
whole search is one `lax.scan` over frames inside jit).

Algorithm (Hannun et al. 2014 prefix search, vectorized):
- Beam state is fixed-width tensors: token buffers (B, W, L), lengths,
  last-token, (p_blank, p_non_blank) in log space, and TWO independent
  32-bit rolling prefix hashes (merge key; collision odds ~2^-64 per pair).
- Each frame expands a (B, W*V) candidate grid: slot (j, c) is "extend beam
  j with token c" for c != blank and the "stay on beam j" candidate for
  c == blank (which fuses the blank transition AND the same-symbol
  non-blank continuation — exactly the two `add(prefix, ...)` calls of the
  oracle).
- Equal prefixes from different parents must MERGE (logsumexp). Beam
  prefixes are distinct by construction, so a live prefix q has at most TWO
  producers: the "stay" of beam q and the ONE extend of beam q[:-1] by
  q's last token — i.e. every merge pairs an extend candidate with an
  EXISTING beam's stay. The merge is therefore a direct (B, W, V, W) hash
  match of rolled extend hashes against the beam hashes: matched extends
  are absorbed into their beam's stay slot and dropped. (An earlier
  version sorted all W*V candidates by hash pair and ran a segmented
  logsumexp; the multi-payload `lax.sort` per frame dominated BOTH the
  ~4 min TPU compile — sorting networks — and the runtime.)
- `top_k` keeps the best W candidates; parents' buffers are gathered and
  extended in one vectorized write.
- Rows beyond a sample's `length` are identity steps (state select), so one
  scan serves ragged batches with static shapes.

Shallow-fusion hooks (device-resident, optional):
- `word_bonus`: constant added per token extension (mirrors the oracle).
- `bigram_lm` (V, V): log P(c | prev) table added on extensions, row
  `blank` = BOS scores.
- `ngram_tables` (scores (S, V), next_state (S, V), init_state): a full
  ARPA/backoff n-gram LM compiled to a dense finite-state automaton
  (ngram_lm.NgramLM.to_dense_automaton) — each beam carries an i32 LM state,
  extensions pay one gather. This is the TPU-native equivalent of the
  host KenLM callback (pointer-chasing replaced by table lookups); the
  host path (ops/decoding.py) remains the semantics oracle and the home of
  the lexicon-trie constraint.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1.0e30

# rolling-hash multipliers (odd => invertible mod 2^32, well-mixed)
_H1_MULT = jnp.uint32(0x9E3779B1)      # golden-ratio constant
_H2_MULT = jnp.uint32(0x85EBCA77)      # murmur3 constant


def _lse(a, b):
    m = jnp.maximum(a, b)
    m_safe = jnp.maximum(m, NEG_INF)
    return m_safe + jnp.log1p(jnp.exp(jnp.minimum(a, b) - m_safe))


@functools.partial(jax.jit, static_argnames=("beam_width", "blank",
                                             "max_tokens"))
def ctc_beam_search_batched(
    log_probs: jnp.ndarray,            # (B, T, V) log-softmax
    lengths: jnp.ndarray,              # (B,) valid frame counts
    beam_width: int = 16,
    blank: Optional[int] = None,
    word_bonus: float = 0.0,
    bigram_lm: Optional[jnp.ndarray] = None,   # (V, V) log P(col | row)
    lm_weight: float = 1.0,
    max_tokens: Optional[int] = None,
    ngram_tables: Optional[Tuple[jnp.ndarray, jnp.ndarray, int]] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (tokens (B, W, Lcap) i32, token_lens (B, W) i32,
    scores (B, W) f32), beams sorted best-first per row.

    Lcap = max_tokens or T (a CTC decode emits at most one token per frame).
    """
    b, t_max, v = log_probs.shape
    w = beam_width
    if blank is None:
        blank = v - 1
    l_cap = int(max_tokens or t_max)
    lp_all = log_probs.astype(jnp.float32)
    lengths = lengths.astype(jnp.int32)

    tok_ids = jnp.arange(v, dtype=jnp.int32)          # candidate token per slot
    if bigram_lm is not None and ngram_tables is not None:
        raise ValueError("pass bigram_lm or ngram_tables, not both")
    if bigram_lm is not None:
        lm_tab = lm_weight * bigram_lm.astype(jnp.float32)
    if ngram_tables is not None:
        lm_scores = lm_weight * jnp.asarray(ngram_tables[0], jnp.float32)
        lm_next = jnp.asarray(ngram_tables[1], jnp.int32)       # (S, V)
        lm_init = jnp.int32(ngram_tables[2])

    init = dict(
        buf=jnp.zeros((b, w, l_cap), jnp.int32),
        length=jnp.zeros((b, w), jnp.int32),
        last=jnp.full((b, w), -1, jnp.int32),
        pb=jnp.full((b, w), NEG_INF, jnp.float32).at[:, 0].set(0.0),
        pnb=jnp.full((b, w), NEG_INF, jnp.float32),
        h1=jnp.zeros((b, w), jnp.uint32).at[:, 0].set(1),
        h2=jnp.zeros((b, w), jnp.uint32).at[:, 0].set(1),
    )
    if ngram_tables is not None:
        # per-beam LM automaton state; the LM score of a prefix depends only
        # on its token sequence, so hash merges stay exact under fusion
        init["lm_s"] = jnp.full((b, w), lm_init, jnp.int32)

    lower = jnp.tril(jnp.ones((w, w), bool), -1)      # [q, r]: r < q

    def step(state, inputs):
        lp, active = inputs                           # (B, V), (B,) bool
        pb, pnb = state["pb"], state["pnb"]           # (B, W)
        last, length = state["last"], state["length"]
        h1, h2 = state["h1"], state["h2"]

        # canonicalize duplicate beams: equal-hash beams are the same prefix
        # (possible only when finite candidates are scarcer than W, e.g.
        # tiny vocabularies — top_k then keeps -inf leftover slots); fold
        # later twins into the earliest so each prefix holds ALL its mass in
        # one slot (the sorted-merge formulation did this implicitly by
        # merging stay candidates of equal hash).
        eq = ((h1[:, :, None] == h1[:, None, :])
              & (h2[:, :, None] == h2[:, None, :]))   # (B, W, W)
        has_earlier = jnp.any(eq & lower[None], axis=2)        # (B, W)
        into = eq & lower.T[None] & ~has_earlier[:, :, None]   # r > q into q
        inflow_pb = jax.nn.logsumexp(
            jnp.where(into, pb[:, None, :], NEG_INF), axis=2)
        inflow_pnb = jax.nn.logsumexp(
            jnp.where(into, pnb[:, None, :], NEG_INF), axis=2)
        pb = jnp.where(has_earlier, NEG_INF, _lse(pb, inflow_pb))
        pnb = jnp.where(has_earlier, NEG_INF, _lse(pnb, inflow_pnb))

        p_tot = _lse(pb, pnb)                         # (B, W)
        lp_c = lp[:, None, :]                         # (B, 1, V)
        # gather lp[last[j]] for the same-symbol continuation of "stay"
        lp_last = jnp.take_along_axis(
            lp, jnp.maximum(last, 0), axis=1)          # (B, W)
        has_last = length > 0

        is_rep = tok_ids[None, None, :] == last[:, :, None]   # (B, W, V)
        base = jnp.where(is_rep, pb[:, :, None], p_tot[:, :, None])
        cand_pnb = base + lp_c + word_bonus           # (B, W, V) extends
        if bigram_lm is not None:
            prev = jnp.where(has_last, last, blank)   # BOS row = blank
            cand_pnb = cand_pnb + lm_tab[prev]        # (B, W, V)
        if ngram_tables is not None:
            cand_pnb = cand_pnb + lm_scores[state["lm_s"]]   # (B, W, V)
        cand_pb = jnp.full((b, w, v), NEG_INF, jnp.float32)

        # the blank slot is the STAY candidate
        stay_pb = p_tot + lp[:, None, blank]
        stay_pnb = pnb + jnp.where(has_last, lp_last, NEG_INF)

        # hashes: extends roll the parent hash; stay keeps it
        tok_u = tok_ids.astype(jnp.uint32)[None, None, :] + jnp.uint32(2)
        rh1 = h1[:, :, None] * _H1_MULT + tok_u        # (B, W, V)
        rh2 = h2[:, :, None] * _H2_MULT + tok_u

        # merge: an extend whose rolled hash equals an EXISTING beam's hash
        # produces that beam's prefix — absorb it into the beam's stay slot
        # and drop it. At most one live match exists on each side (beam
        # prefixes are distinct; only q[:-1]+q[-1] rebuilds q), so a first-
        # match guard + max-reduction implement the exact logsumexp merge.
        is_ext = tok_ids != blank                      # (V,)
        match = ((rh1[..., None] == h1[:, None, None, :])
                 & (rh2[..., None] == h2[:, None, None, :])
                 & is_ext[None, None, :, None])        # (B, W, V, Wq)
        first = match & (jnp.cumsum(match, axis=-1) == 1)
        contrib = jnp.where(first, cand_pnb[..., None], NEG_INF)
        absorbed = jnp.max(contrib, axis=(1, 2))       # (B, Wq)
        stay_pnb = _lse(stay_pnb, absorbed)
        merged_away = jnp.any(first, axis=-1)          # (B, W, V)
        cand_pnb = jnp.where(merged_away, NEG_INF, cand_pnb)

        cand_pb = cand_pb.at[:, :, blank].set(stay_pb)
        cand_pnb = cand_pnb.at[:, :, blank].set(stay_pnb)
        ch1 = rh1.at[:, :, blank].set(h1)
        ch2 = rh2.at[:, :, blank].set(h2)

        n = w * v
        flat = lambda x: x.reshape(b, n)
        totals = _lse(flat(cand_pb), flat(cand_pnb))
        _, top_idx = jax.lax.top_k(totals, w)          # (B, W)
        take = lambda x: jnp.take_along_axis(flat(x), top_idx, axis=1)
        new_pb, new_pnb = take(cand_pb), take(cand_pnb)
        new_h1, new_h2 = take(ch1), take(ch2)
        sel_parent = top_idx // v                      # slot (j, c) layout
        sel_tok = top_idx % v
        is_stay = sel_tok == blank

        parent_buf = jnp.take_along_axis(
            state["buf"], sel_parent[:, :, None], axis=1)      # (B, W, L)
        parent_len = jnp.take_along_axis(length, sel_parent, axis=1)
        parent_last = jnp.take_along_axis(last, sel_parent, axis=1)

        write_pos = jnp.minimum(parent_len, l_cap - 1)
        write_here = (jnp.arange(l_cap)[None, None, :]
                      == write_pos[:, :, None]) & ~is_stay[:, :, None]
        new_buf = jnp.where(write_here, sel_tok[:, :, None], parent_buf)
        new_len = parent_len + jnp.where(is_stay, 0, 1)
        new_last = jnp.where(is_stay, parent_last, sel_tok)

        sel = lambda new, old: jnp.where(
            active[:, None] if new.ndim == 2 else active[:, None, None],
            new, old)
        new_state = dict(
            buf=sel(new_buf, state["buf"]),
            length=sel(new_len, length), last=sel(new_last, last),
            pb=sel(new_pb, pb), pnb=sel(new_pnb, pnb),
            h1=sel(new_h1, h1), h2=sel(new_h2, h2))
        if ngram_tables is not None:
            parent_lm = jnp.take_along_axis(state["lm_s"], sel_parent, axis=1)
            new_lm = jnp.where(is_stay, parent_lm,
                               lm_next[parent_lm, sel_tok])
            new_state["lm_s"] = sel(new_lm, state["lm_s"])
        return new_state, None

    frames = jnp.moveaxis(lp_all, 1, 0)               # (T, B, V)
    active = (jnp.arange(t_max)[:, None] < lengths[None, :])   # (T, B)
    final, _ = jax.lax.scan(step, init, (frames, active))

    totals = _lse(final["pb"], final["pnb"])          # (B, W)
    order = jnp.argsort(-totals, axis=1)
    tokens = jnp.take_along_axis(final["buf"], order[:, :, None], axis=1)
    lens = jnp.take_along_axis(final["length"], order, axis=1)
    scores = jnp.take_along_axis(totals, order, axis=1)
    return tokens, lens, scores
