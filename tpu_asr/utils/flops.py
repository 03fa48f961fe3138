"""FLOPs / MFU accounting for the benchmarks.

MFU = (XLA-counted FLOPs per executed program) / elapsed / peak-FLOPs — the
"model FLOPs utilization" convention: measured against the chip's dense
bf16 matmul peak, so roofline distance is directly readable. The reference
repo reports no utilization figure (BASELINE.md); VERDICT.md round 1 asked
for an MFU number alongside RTFx so "is it actually fast" can be judged.
"""

from __future__ import annotations

from typing import Optional

# Dense bf16 peak FLOPs/s per chip, by device_kind substring (public specs).
_PEAK_FLOPS = [
    ("v6",       918e12),   # Trillium / v6e
    ("v5p",      459e12),
    ("v5 lite",  197e12),   # v5e device_kind is "TPU v5 lite"
    ("v5e",      197e12),
    ("v4",       275e12),
    ("v3",       123e12),
    ("v2",       45e12),
]
_DEFAULT_PEAK = 197e12


def peak_flops(device=None) -> float:
    """Dense bf16 peak for the given (default: first visible) device."""
    import jax
    if device is None:
        device = jax.devices()[0]
    kind = getattr(device, "device_kind", "").lower()
    for key, peak in _PEAK_FLOPS:
        if key in kind:
            return peak
    return _DEFAULT_PEAK


def compiled_flops(jitted_fn, *args, **kwargs) -> Optional[float]:
    """XLA's FLOP count for one execution of `jitted_fn(*args)`.

    Returns None when the backend exposes no cost analysis (e.g. some
    tunneled/virtual platforms)."""
    try:
        compiled = jitted_fn.lower(*args, **kwargs).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):   # older JAX: one dict per program
            cost = cost[0] if cost else {}
        flops = float(cost.get("flops", 0.0))
        return flops if flops > 0 else None
    except Exception:
        return None


def mfu(flops_per_call: Optional[float], seconds_per_call: float,
        device=None) -> Optional[float]:
    """Fraction of the chip's dense bf16 peak achieved; None if unknown."""
    if not flops_per_call or seconds_per_call <= 0:
        return None
    return flops_per_call / seconds_per_call / peak_flops(device)
