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

import jax

jax.config.update("jax_platforms", "cpu")
# Parity tests compare fp32 numerics against torch-CPU: keep matmuls at full precision.
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np
import pytest

assert jax.default_backend() == "cpu", "tests must run on the virtual CPU mesh"
assert jax.device_count() == 8, "expected 8 virtual CPU devices"


@pytest.fixture
def rng():
    return np.random.default_rng(0)
