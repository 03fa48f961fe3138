"""Test harness config: run all tests on a simulated 8-device CPU mesh.

Mirrors the rebuild test strategy in SURVEY.md §4: JAX's virtual host devices give
multi-device (data/tensor parallel) coverage without a TPU pod — something the
reference's DDP tests could not do without a GPU cluster.

NOTE: this environment pre-imports jax via sitecustomize with JAX_PLATFORMS=axon, so
env vars alone are ignored; `jax.config.update` before first backend use is required.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = _flags + " --xla_force_host_platform_device_count=8"
# Silence the per-load cpu_aot_loader machine-feature ERROR spam triggered by
# persistent-cache hits (XLA pseudo-features like +prefer-no-scatter are not
# host CPUID bits; the loads are correct). Must be set before jax import.
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax

jax.config.update("jax_platforms", "cpu")
# Parity tests compare fp32 numerics against torch-CPU: keep matmuls at full precision.
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent XLA compilation cache: the suite is dominated by ~20 jit-heavy
# tests (KD train steps, CLI end-to-end runs); warm-cache reruns skip the
# XLA compile entirely (measured 76s -> 30s on the dryrun test alone).
# Threshold 0: eager phases (un-jitted model.init / value_and_grad in older
# tests) dispatch hundreds of micro-programs per test — at the default 0.5 s
# threshold none of them persisted and a single warm test still paid ~14 s
# of micro-compiles (measured on test_distil_model_losses[logit]).
_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np
import pytest

assert jax.default_backend() == "cpu", "tests must run on the virtual CPU mesh"
assert jax.device_count() == 8, "expected 8 virtual CPU devices"


@pytest.fixture(autouse=True, scope="module")
def _drop_live_executables():
    """Free compiled-executable memory between test modules.

    jaxlib segfaults/aborts inside persistent-cache executable
    (de)serialization when a full single-process suite run has accumulated
    hundreds of live compiled programs (reproduced at the same late-suite
    point across cold and warm caches; every smaller subset passes). Clearing
    jit caches at module boundaries keeps the process lean; the on-disk
    compilation cache makes the re-lowering cheap (a 3-module clear window
    was tried and saved nothing: 5:37 vs 5:27 warm)."""
    yield
    jax.clear_caches()


@pytest.fixture
def rng():
    return np.random.default_rng(0)
