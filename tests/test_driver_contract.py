"""Driver-contract guards: __graft_entry__ exposes entry()/dryrun_multichip
with the right shapes, and the bench scripts are importable with the expected
constants. (The driver compile-checks entry and runs dryrun_multichip on a
virtual CPU mesh; bench.py runs on the real chip.)"""

import importlib.util
import sys
from pathlib import Path

import jax
import pytest

REPO = Path(__file__).resolve().parent.parent


def _load(name):
    spec = importlib.util.spec_from_file_location(name, REPO / f"{name}.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def test_graft_entry_contract():
    g = _load("__graft_entry__")
    fn, args = g.entry()
    assert len(args) == 2
    out = jax.jit(fn)(*args)
    log_probs, encoded_len, greedy = out
    assert log_probs.ndim == 3 and log_probs.shape[-1] == 129
    assert encoded_len.shape == (args[0].shape[0],)
    assert greedy.shape == log_probs.shape[:2]


def test_dryrun_multichip_small():
    g = _load("__graft_entry__")
    g.dryrun_multichip(2)        # dp2 on the CPU mesh


def test_bench_scripts_importable():
    b = _load("bench")
    assert hasattr(b, "main") and b.BATCH > 0 and b.ITERS > 0
    bt = _load("bench_train")
    assert hasattr(bt, "main") and bt.STEPS > 0
