"""CTC decoding strategies + Hypothesis — rebuild of the snapshot-stripped
`ctc_decoding.py` / `rnnt_utils.Hypothesis` contract (N10 in SURVEY.md §2.2;
call sites: WER.update -> decoding.ctc_decoder_predictions_tensor,
wer.py:292-354, and predict_step, asr_train.py:780-788).

- greedy: vectorized collapse/dedup on device (ops/ctc.ctc_greedy_decode).
- beam: host-side CTC prefix beam search (Hannun et al. 2014): beams over
  collapsed prefixes carrying (p_blank, p_non_blank), optional word-insertion
  bonus and an optional external LM scoring hook — covering the contract of
  NeMo's `beam` / pyctcdecode strategies without the external deps.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

from tpu_asr.ops.ctc import ctc_greedy_decode

NEG_INF = -float("inf")


@dataclass
class Hypothesis:
    """Decoding hypothesis (NeMo rnnt_utils.Hypothesis contract subset)."""

    score: float
    y_sequence: List[int]
    text: Optional[str] = None
    timestamp: List[int] = field(default_factory=list)
    alignments: Optional[np.ndarray] = None


def _logsumexp(*xs: float) -> float:
    m = max(xs)
    if m == NEG_INF:
        return NEG_INF
    return m + math.log(sum(math.exp(x - m) for x in xs))


class Lexicon:
    """Token-id trie over an allowed word list — the flashlight/pyctcdecode
    lexicon-constrained strategy (SURVEY.md N10 beam externals): beam
    extensions must stay on a trie path; a completed word may chain into the
    next word from the root.

    Build from word token-id sequences (each word tokenized STANDALONE so a
    BPE/SPM first piece carries its word-boundary marker):
    `Lexicon(tokenizer.text_to_ids(w) for w in words)`."""

    _ROOT = 0

    def __init__(self, word_id_seqs):
        self._children: List[dict] = [{}]
        self._terminal: List[bool] = [False]
        for seq in word_id_seqs:
            node = self._ROOT
            for tok in seq:
                nxt = self._children[node].get(tok)
                if nxt is None:
                    nxt = len(self._children)
                    self._children.append({})
                    self._terminal.append(False)
                    self._children[node][tok] = nxt
                node = nxt
            self._terminal[node] = True

    def start(self) -> int:
        return self._ROOT

    def step(self, state: int, token: int) -> Optional[int]:
        """Next trie state after emitting `token`, or None (prune). A
        terminal state may restart from the root (next word)."""
        nxt = self._children[state].get(token)
        if nxt is not None:
            return nxt
        if self._terminal[state]:
            return self._children[self._ROOT].get(token)
        return None

    def is_terminal(self, state: int) -> bool:
        return self._terminal[state]


def ctc_prefix_beam_search(
    log_probs: np.ndarray,          # (T, V) log-softmax; blank = V-1
    seq_len: Optional[int] = None,
    beam_width: int = 16,
    blank: Optional[int] = None,
    lm_score_fn: Optional[Callable[[Tuple[int, ...], int], float]] = None,
    lm_weight: float = 0.0,
    word_bonus: float = 0.0,
    lexicon: Optional[Lexicon] = None,
) -> List[Hypothesis]:
    """Single-utterance prefix beam search. Returns hypotheses sorted by
    total log-probability (best first). With `lexicon`, extensions that
    leave the word trie are pruned (flashlight-style constrained search)."""
    t_max, v = log_probs.shape
    if blank is None:
        blank = v - 1
    if seq_len is not None:
        t_max = min(t_max, int(seq_len))
    states: dict = {(): lexicon.start()} if lexicon is not None else {}

    # prefix -> (log p ending in blank, log p ending in non-blank)
    beams = {(): (0.0, NEG_INF)}
    for t in range(t_max):
        lp = log_probs[t]
        # prune vocabulary to the top candidates for speed
        topk = np.argpartition(lp, -min(beam_width * 2, v))[-min(beam_width * 2, v):]
        next_beams: dict = {}

        def add(prefix, pb, pnb):
            old_pb, old_pnb = next_beams.get(prefix, (NEG_INF, NEG_INF))
            next_beams[prefix] = (_logsumexp(old_pb, pb),
                                  _logsumexp(old_pnb, pnb))

        for prefix, (p_b, p_nb) in beams.items():
            p_tot = _logsumexp(p_b, p_nb)
            for c in topk:
                c = int(c)
                p_c = float(lp[c])
                if c == blank:
                    add(prefix, p_tot + p_c, NEG_INF)
                    continue
                last = prefix[-1] if prefix else None
                if c == last:
                    # repeat: extends the non-blank path of the same prefix,
                    # or starts a new symbol after a blank
                    add(prefix, NEG_INF, p_nb + p_c)
                    ext = p_b + p_c
                else:
                    ext = p_tot + p_c
                new_prefix = prefix + (c,)
                if lexicon is not None and new_prefix not in states:
                    nxt_state = lexicon.step(states[prefix], c)
                    if nxt_state is None:
                        continue                       # off-lexicon: prune
                    states[new_prefix] = nxt_state
                if lm_score_fn is not None:
                    ext += lm_weight * lm_score_fn(prefix, c)
                add(new_prefix, NEG_INF, ext + word_bonus)

        ranked = sorted(next_beams.items(),
                        key=lambda kv: _logsumexp(*kv[1]), reverse=True)
        beams = dict(ranked[:beam_width])
        if lexicon is not None:
            states = {p: states[p] for p in beams}

    items = beams.items()
    if lexicon is not None:
        # final hypotheses must end on a COMPLETE word (or be empty);
        # mid-word prefixes were only legal as in-flight beams
        done = [(p, s) for p, s in items
                if not p or lexicon.is_terminal(states[p])]
        items = done or items
    hyps = [Hypothesis(score=_logsumexp(*pbs), y_sequence=list(prefix))
            for prefix, pbs in items]
    hyps.sort(key=lambda h: h.score, reverse=True)
    return hyps


class CTCDecoding:
    """Strategy dispatcher matching NeMo CTCBPEDecoding's exercised surface.

    strategy: 'greedy' (device, vectorized) or 'beam' (host prefix search).
    """

    def __init__(self, tokenizer, strategy: str = "greedy",
                 beam_width: int = 16, lm_score_fn=None, lm_weight: float = 0.0,
                 word_bonus: float = 0.0, compute_timestamps: bool = False,
                 ngram_lm=None, lexicon_words=None, bigram_lm=None):
        """ngram_lm: an ops.ngram_lm.NgramLM (or path to an ARPA file) used as
        the beam-search LM — the KenLM/pyctcdecode strategy equivalent.
        lexicon_words: iterable of allowed words; beams are constrained to
        their token-trie (the flashlight lexicon strategy).
        strategy 'beam_batch' runs the whole batch's prefix search on device
        (ops/beam_search.py); it supports word_bonus, a dense (V, V)
        `bigram_lm` log-prob table (row `blank` = BOS), and full ARPA/backoff
        `ngram_lm` fusion (compiled once to a dense automaton,
        NgramLM.to_dense_automaton). Host-callback hooks (`lm_score_fn`) and
        the lexicon-trie constraint stay on strategy='beam'."""
        if strategy not in ("greedy", "greedy_batch", "beam", "beam_batch"):
            raise ValueError(f"unknown decoding strategy: {strategy}")
        if strategy == "beam_batch" and (lm_score_fn is not None
                                         or lexicon_words is not None):
            raise ValueError(
                "beam_batch is the on-device search: host lm_score_fn/"
                "lexicon hooks are not supported — use strategy='beam', or "
                "pass ngram_lm/bigram_lm (device-compiled) instead")
        self.bigram_lm = bigram_lm
        self.ngram_tables = None     # compiled lazily: needs the logits vocab
        self._device_ngram = None
        if strategy == "beam_batch" and ngram_lm is not None:
            from tpu_asr.ops.ngram_lm import NgramLM
            if isinstance(ngram_lm, str):
                ngram_lm = NgramLM.load_arpa(ngram_lm)
            self._device_ngram = ngram_lm
            if lm_weight == 0.0:
                lm_weight = 1.0
            ngram_lm = None          # consumed: skip the host-path adapter
        if bigram_lm is not None and lm_weight == 0.0:
            lm_weight = 1.0          # same default-on as the ngram_lm path
        self.tokenizer = tokenizer
        self.strategy = strategy
        self.beam_width = beam_width
        self.lexicon = None
        if lexicon_words is not None:
            self.lexicon = Lexicon(
                tokenizer.text_to_ids(w) for w in lexicon_words)
        if ngram_lm is not None and lm_score_fn is None:
            from tpu_asr.ops.ngram_lm import NgramLM
            if isinstance(ngram_lm, str):
                ngram_lm = NgramLM.load_arpa(ngram_lm)
            lm_score_fn = ngram_lm.lm_score_fn()
            if lm_weight == 0.0:
                lm_weight = 1.0
        self.lm_score_fn = lm_score_fn
        self.lm_weight = lm_weight
        self.word_bonus = word_bonus
        self.compute_timestamps = compute_timestamps

    def decode_tokens_to_str(self, tokens: Sequence[int]) -> str:
        return self.tokenizer.ids_to_text(list(tokens))

    def ctc_decoder_predictions_tensor(
        self,
        decoder_outputs,            # (B, T, V) log-probs (device or host)
        decoder_lengths,            # (B,)
        return_hypotheses: bool = False,
    ):
        if self.strategy in ("greedy", "greedy_batch"):
            if self.compute_timestamps:
                from tpu_asr.ops.ctc import ctc_greedy_decode_with_timestamps
                tokens, n_tokens, frames = ctc_greedy_decode_with_timestamps(
                    decoder_outputs, decoder_lengths)
                tokens = np.asarray(tokens)
                n_tokens = np.asarray(n_tokens)
                frames = np.asarray(frames)
                hyps = [Hypothesis(
                    score=0.0, y_sequence=tokens[i, :n_tokens[i]].tolist(),
                    timestamp=frames[i, :n_tokens[i]].tolist())
                    for i in range(tokens.shape[0])]
            else:
                tokens, n_tokens = ctc_greedy_decode(decoder_outputs,
                                                     decoder_lengths)
                tokens = np.asarray(tokens)
                n_tokens = np.asarray(n_tokens)
                hyps = [Hypothesis(
                    score=0.0, y_sequence=tokens[i, :n_tokens[i]].tolist())
                    for i in range(tokens.shape[0])]
        elif self.strategy == "beam_batch":
            from tpu_asr.ops.beam_search import ctc_beam_search_batched
            if self._device_ngram is not None and self.ngram_tables is None:
                # compile once against the LOGITS vocab (num_classes + blank;
                # the blank column is overwritten by the stay candidate)
                v_logits = int(decoder_outputs.shape[-1])
                self.ngram_tables = self._device_ngram.to_dense_automaton(
                    v_logits)
            tokens, lens, scores = ctc_beam_search_batched(
                decoder_outputs, decoder_lengths,
                beam_width=self.beam_width, word_bonus=self.word_bonus,
                bigram_lm=self.bigram_lm, lm_weight=self.lm_weight,
                ngram_tables=self.ngram_tables)
            tokens = np.asarray(tokens)
            lens = np.asarray(lens)
            scores = np.asarray(scores)
            hyps = [Hypothesis(score=float(scores[i, 0]),
                               y_sequence=tokens[i, 0, :lens[i, 0]].tolist())
                    for i in range(tokens.shape[0])]
        else:
            lp = np.asarray(decoder_outputs, np.float32)
            lens = np.asarray(decoder_lengths)
            hyps = [ctc_prefix_beam_search(
                lp[i], int(lens[i]), self.beam_width,
                lm_score_fn=self.lm_score_fn, lm_weight=self.lm_weight,
                word_bonus=self.word_bonus, lexicon=self.lexicon)[0]
                for i in range(lp.shape[0])]
        for h in hyps:
            h.text = self.decode_tokens_to_str(h.y_sequence)
        if return_hypotheses:
            return hyps
        return [h.text for h in hyps]
