"""Platform forcing for CPU-simulated multi-device runs.

On a real TPU pod the framework just uses `jax.devices()`. For development
and CI without a pod, an n-device virtual CPU mesh (XLA host platform) gives
full data/tensor-parallel coverage (SURVEY.md §4). Forcing it is fiddly in
environments that pre-import jax with a hardware platform pinned via env
(JAX_PLATFORMS): env vars alone are ignored, and XLA_FLAGS is parsed only at
first backend initialization — this module centralizes the working recipe
(also used by __graft_entry__.dryrun_multichip, the driver's multi-chip gate).
"""

from __future__ import annotations

import os


def force_cpu_devices(n_devices: int) -> None:
    """Force JAX onto the CPU platform with >= n_devices virtual devices.

    Must run before the first JAX backend initialization in this process.
    If a non-CPU backend was already initialized, the cached clients are
    dropped; if the CPU client was already created without the device-count
    flag (XLA_FLAGS is parsed once, at first init), raises RuntimeError —
    re-exec in a fresh process in that case.
    """
    flag = f"--xla_force_host_platform_device_count={n_devices}"
    flags = os.environ.get("XLA_FLAGS", "")
    if "--xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = f"{flags} {flag}".strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    if jax.default_backend() != "cpu":
        from jax._src import xla_bridge

        xla_bridge._clear_backends()
        xla_bridge.get_backend.cache_clear()
        jax.config.update("jax_platforms", "cpu")

    if jax.default_backend() != "cpu" or jax.device_count() < n_devices:
        raise RuntimeError(
            f"cannot force a {n_devices}-device CPU mesh in this process "
            f"(backend={jax.default_backend()}, devices={jax.device_count()}); "
            "XLA_FLAGS is parsed at first backend init — set "
            f"XLA_FLAGS='{flag}' JAX_PLATFORMS=cpu before starting python, "
            "or call force_cpu_devices() before any JAX use")
