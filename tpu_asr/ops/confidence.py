"""ASR confidence estimation — rebuild of the snapshot-stripped
`asr_confidence_utils` contract (the source `NeMo/nemo/collections/asr/parts/
utils/asr_confidence_utils.py` is blob-filtered out of the reference; the
behavior is pinned by `NeMo/tests/collections/asr/confidence/
test_asr_confidence_primitives.py:26-140` and the decoding integration by
`NeMo/tests/collections/asr/decoding/test_ctc_decoding.py:207-287`).

Pinned contracts (the tests ARE the spec, SURVEY.md §0 snapshot-gap rule):
- `get_confidence_measure_bank()` -> dict of `measure(logprobs, vocab, alpha)`
  mapping a (..., V) log-prob vector to a scalar confidence per row with
  measure(one_hot) == 1, measure(uniform) == 0, and a peakier distribution
  scoring strictly higher than a flatter one (partial order), all in [0, 1]
  on those inputs.
- `get_confidence_aggregation_bank()` -> {mean, min, max, prod} reductions
  used to pool frame confidences into token/word confidences.
- `ConfidenceConfig` mirrors NeMo's surface: preserve_frame/token/word
  confidence, exclude_blank, aggregation, and a method config
  (name 'entropy'|'max_prob', entropy_type 'gibbs'|'tsallis'|'renyi',
  alpha, entropy_norm 'lin'|'exp').

All measures are closed-form in the log-probs and jit/vmap-friendly (pure
jnp element-wise + one reduction over the vocab axis), so frame confidence
for a whole batch is computed on device in the same program as the decode.

Derivations (p = exp(x), t = alpha > 0, t != 1, v = vocab size):
- max_prob:        (max_i p_i * v - 1) / (v - 1)          # affine [1/v,1]->[0,1]
- Tsallis entropy  S_t = (1 - sum p^t) / (t - 1), S_max at uniform
                   = (1 - v^(1-t)) / (t - 1)
- Renyi entropy    R_t = ln(sum p^t) / (1 - t), R_max = ln v
- Gibbs entropy    H_t = -sum p^t * ln p (alpha-weighted Gibbs),
                   H_uni = v^(1-t) * ln v
  'lin'  norm: 1 - S/S_max
  'exp'  norm: (exp(-S) - exp(-S_max)) / (1 - exp(-S_max))
Each is exactly 1 at a one-hot and exactly 0 at the uniform distribution.
NOTE (documented edge): for t < 1 the alpha-weighted Gibbs entropy is not
globally maximized at the uniform distribution, so `entropy_gibbs_lin` can
dip marginally below 0 on adversarial near-uniform inputs; the reference's
normalization has the same property and its tests only probe one-hot /
uniform / random-softmax vectors, where all banks stay in [0, 1].
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp


@dataclass
class ConfidenceMethodConfig:
    """How a single (..., V) log-prob vector becomes one confidence value.

    Defaults follow the reference (`ConfidenceMethodConfig`: entropy /
    tsallis / 0.33 / exp)."""

    name: str = "entropy"            # 'entropy' | 'max_prob'
    entropy_type: str = "tsallis"    # 'gibbs' | 'tsallis' | 'renyi'
    alpha: float = 0.33
    entropy_norm: str = "exp"        # 'lin' | 'exp'

    def measure_name(self) -> str:
        if self.name == "max_prob":
            return "max_prob"
        if self.name != "entropy":
            raise ValueError(f"unknown confidence method name: {self.name}")
        key = f"entropy_{self.entropy_type}_{self.entropy_norm}"
        bank = get_confidence_measure_bank()
        if key not in bank:
            raise ValueError(f"unknown entropy measure: {key}")
        return key


@dataclass
class ConfidenceConfig:
    """NeMo `ConfidenceConfig` surface (test_ctc_decoding.py:250)."""

    preserve_frame_confidence: bool = False
    preserve_token_confidence: bool = False
    preserve_word_confidence: bool = False
    # exclude blank frames when pooling frame confidences into tokens
    exclude_blank: bool = True
    aggregation: str = "min"         # 'mean' | 'min' | 'max' | 'prod'
    method_cfg: ConfidenceMethodConfig = field(
        default_factory=ConfidenceMethodConfig)

    def wants_any(self) -> bool:
        return (self.preserve_frame_confidence
                or self.preserve_token_confidence
                or self.preserve_word_confidence)


def _sum_p_alpha(x, t):
    """sum_i p_i^t, computed stably as exp(logsumexp(t * x))."""
    return jnp.exp(jax.scipy.special.logsumexp(t * x, axis=-1))


def get_confidence_measure_bank():
    """Measure bank: name -> fn(logprobs (..., V), vocab_size, alpha) -> (...)

    Accepts jnp or np arrays (everything lowers to jnp); differentiable and
    jittable so frame confidence can live inside the decode program."""

    def max_prob(x, v, t):
        return (jnp.exp(jnp.max(x, axis=-1)) * v - 1.0) / (v - 1.0)

    def _is_shannon(t):
        # alpha == 1 is every entropy family's common Shannon limit; the
        # generic formulas have a removable 0/0 there, so branch statically
        # (alpha is a Python float — no trace-time control flow involved).
        return abs(t - 1.0) < 1e-8

    def _shannon_h(x):
        return -jnp.sum(jnp.exp(x) * x, axis=-1)

    def _lin_shannon(x, v):
        return 1.0 - _shannon_h(x) / math.log(v)

    def _exp_shannon(x, v):
        return (jnp.exp(-_shannon_h(x)) - 1.0 / v) / (1.0 - 1.0 / v)

    # --- Tsallis: S = (1 - sum p^t)/(t - 1), S_max = (1 - v^(1-t))/(t - 1)
    def entropy_tsallis_lin(x, v, t):
        if _is_shannon(t):
            return _lin_shannon(x, v)
        return 1.0 - (1.0 - _sum_p_alpha(x, t)) / (1.0 - math.pow(v, 1.0 - t))

    def entropy_tsallis_exp(x, v, t):
        if _is_shannon(t):
            return _exp_shannon(x, v)
        s = (1.0 - _sum_p_alpha(x, t)) / (t - 1.0)
        exp_neg_max = math.exp(-(1.0 - math.pow(v, 1.0 - t)) / (t - 1.0))
        return (jnp.exp(-s) - exp_neg_max) / (1.0 - exp_neg_max)

    # --- Renyi: R = ln(sum p^t)/(1 - t), R_max = ln v
    def entropy_renyi_lin(x, v, t):
        if _is_shannon(t):
            return _lin_shannon(x, v)
        r = jnp.log(_sum_p_alpha(x, t)) / (1.0 - t)
        return 1.0 - r / math.log(v)

    def entropy_renyi_exp(x, v, t):
        if _is_shannon(t):
            return _exp_shannon(x, v)
        # exp(-R) = (sum p^t)^(1/(t-1)); affine-map [1/v, 1] -> [0, 1]
        return (_sum_p_alpha(x, t) ** (1.0 / (t - 1.0)) * v - 1.0) / (v - 1.0)

    # --- alpha-weighted Gibbs: H = -sum p^t ln p, H_uni = v^(1-t) ln v
    def _gibbs_h(x, t):
        return -jnp.sum(jnp.exp(t * x) * x, axis=-1)

    def entropy_gibbs_lin(x, v, t):
        if _is_shannon(t):
            return _lin_shannon(x, v)
        return 1.0 - _gibbs_h(x, t) / (math.pow(v, 1.0 - t) * math.log(v))

    def entropy_gibbs_exp(x, v, t):
        if _is_shannon(t):
            return _exp_shannon(x, v)
        exp_neg_max = math.exp(-math.pow(v, 1.0 - t) * math.log(v))
        return (jnp.exp(-_gibbs_h(x, t)) - exp_neg_max) / (1.0 - exp_neg_max)

    return {
        "max_prob": max_prob,
        "entropy_gibbs_lin": entropy_gibbs_lin,
        "entropy_gibbs_exp": entropy_gibbs_exp,
        "entropy_tsallis_lin": entropy_tsallis_lin,
        "entropy_tsallis_exp": entropy_tsallis_exp,
        "entropy_renyi_lin": entropy_renyi_lin,
        "entropy_renyi_exp": entropy_renyi_exp,
    }


def get_confidence_aggregation_bank():
    """Aggregation bank over a 1-D sequence of confidences (host-side lists
    or arrays). Empty input -> 0.0 (nothing to be confident about)."""
    import numpy as np

    def _arr(xs):
        return np.asarray(xs, np.float64)

    return {
        "mean": lambda xs: float(_arr(xs).mean()) if len(xs) else 0.0,
        "min": lambda xs: float(_arr(xs).min()) if len(xs) else 0.0,
        "max": lambda xs: float(_arr(xs).max()) if len(xs) else 0.0,
        "prod": lambda xs: float(_arr(xs).prod()) if len(xs) else 0.0,
    }


def frame_confidence_fn(method_cfg: ConfidenceMethodConfig, vocab_size: int):
    """Returns a jittable fn: log_probs (B, T, V) -> confidence (B, T) fp32."""
    measure = get_confidence_measure_bank()[method_cfg.measure_name()]
    alpha = float(method_cfg.alpha)

    def fn(log_probs):
        return measure(log_probs.astype(jnp.float32), vocab_size,
                       alpha).astype(jnp.float32)

    return fn
