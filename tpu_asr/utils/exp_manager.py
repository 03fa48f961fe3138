"""Experiment management helpers — the exercised slice of NeMo's exp_manager
(N18 in SURVEY.md §2.2) rebuilt for this framework:

- `setup_experiment`: run-dir layout (PRJ_NAME/EXP_NAME contract from the
  launcher scripts), config snapshot, version-suffixed reruns.
- `StepTimer`: TimingCallback equivalent (exp_manager.py:269-321) — per-step
  wall-time stats (mean/p50/p95) cheaply accumulated.
- `profile_trace`: JAX profiler trace behind a flag (SURVEY.md §5 tracing:
  "JAX profiler traces + per-step timing metrics are cheap; expose as a flag").
  View with TensorBoard or xprof.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from dataclasses import asdict, is_dataclass
from pathlib import Path
from typing import Dict, Optional


def setup_experiment(output_dir, config=None, project: Optional[str] = None,
                     name: Optional[str] = None, version_rerun: bool = True
                     ) -> Path:
    """Create outputs/<project>/<name>[ -vN ] and snapshot the config."""
    from tpu_asr.parallel.mesh import broadcast_int, is_main_process

    project = project or os.getenv("PRJ_NAME") or "default"
    name = name or os.getenv("EXP_NAME") or "run"
    workdir = Path(output_dir) / project / name
    # version suffix is decided ONCE on process 0 and broadcast: per-process
    # directory probing would race (proc 0 mkdirs, proc 1 then sees a
    # non-empty dir and picks -v1, splitting the run across two workdirs)
    n = 0
    if is_main_process() and version_rerun and workdir.exists() \
            and any(workdir.iterdir()):
        n = 1
        while (Path(output_dir) / project / f"{name}-v{n}").exists():
            n += 1
    n = broadcast_int(n)
    if n:
        workdir = Path(output_dir) / project / f"{name}-v{n}"
    if is_main_process():
        workdir.mkdir(parents=True, exist_ok=True)
        if config is not None:
            cfg = asdict(config) if is_dataclass(config) else config
            (workdir / "config.json").write_text(json.dumps(cfg, indent=2,
                                                            default=str))
    from tpu_asr.parallel.mesh import sync_processes
    sync_processes("setup_experiment")
    return workdir


class StepTimer:
    """Accumulates step wall-times; `summary()` -> mean/p50/p95/total."""

    def __init__(self, window: int = 1000):
        self.window = window
        self._times = []
        self._last = None

    def tick(self) -> Optional[float]:
        now = time.perf_counter()
        dt = None
        if self._last is not None:
            dt = now - self._last
            self._times.append(dt)
            if len(self._times) > self.window:
                self._times.pop(0)
        self._last = now
        return dt

    def summary(self) -> Dict[str, float]:
        if not self._times:
            return {}
        xs = sorted(self._times)
        n = len(xs)
        return {
            "step_time_mean": sum(xs) / n,
            "step_time_p50": xs[n // 2],
            "step_time_p95": xs[min(n - 1, int(n * 0.95))],
            "steps_measured": float(n),
        }


@contextlib.contextmanager
def profile_trace(workdir, enabled: bool = False):
    """JAX profiler trace context (no-op unless enabled)."""
    if not enabled:
        yield None
        return
    import jax

    trace_dir = Path(workdir) / "profile"
    trace_dir.mkdir(parents=True, exist_ok=True)
    with jax.profiler.trace(str(trace_dir)):
        yield trace_dir
