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


class StragglerDetector:
    """Straggler detection — the exercised spirit of NeMo's optional
    straggler-detection callback (reference NeMo/nemo/utils/exp_manager.py
    :443-530, nvidia-resiliency-ext backed; config-gated and unused by the
    KD scripts) rebuilt TPU-natively: every process accumulates its own
    per-step wall times; `report()` all-gathers the per-process means (a
    one-hot `process_allgather` sum — no extra deps) and flags ranks slower
    than `threshold` x the fleet median. On a pod this catches the
    slow-host/slow-chip cases that show up as whole-fleet step-time
    inflation (SPMD steps run at the slowest participant's pace)."""

    def __init__(self, threshold: float = 1.25, window: int = 100):
        self.threshold = threshold
        self.window = window
        self._times = []

    def tick(self, dt_s: float) -> None:
        self._times.append(float(dt_s))
        if len(self._times) > self.window:
            self._times = self._times[-self.window:]

    def report(self) -> Dict:
        import jax
        import numpy as np

        from tpu_asr.parallel.mesh import cross_process_sum

        n = jax.process_count()
        mine = float(np.mean(self._times)) if self._times else 0.0
        vec = np.zeros(n, np.float64)
        vec[jax.process_index()] = mine
        per_rank = np.asarray(cross_process_sum(vec))
        med = float(np.median(per_rank)) if n else 0.0
        stragglers = [int(i) for i, t in enumerate(per_rank)
                      if med > 0 and t > self.threshold * med]
        return {"per_rank_mean_s": per_rank.tolist(),
                "median_s": med,
                "threshold": self.threshold,
                "stragglers": stragglers}


def maybe_inject_fault(spec: Optional[str], step: int,
                       n_done: int = 1) -> None:
    """Fault injection for resilience testing — the reference's
    FaultToleranceCallback `simulated_fault` knob (NeMo exp_manager.py:
    188-264, config-gated, unused by the KD scripts). `spec` is
    "rank_killed:<rank>:<step>" or "rank_hung:<rank>:<step>": at train step
    <step>, process <rank> either exits hard (os._exit(1) — the preemption/
    crash case checkpoint-resume must survive) or hangs (sleeps forever —
    the case heartbeat monitoring must catch). No-op when spec is None or
    this process/step does not match. `n_done`: steps covered by this
    check — with steps_per_dispatch > 1 the counter advances in strides,
    so the fault fires when <step> falls anywhere in (step - n_done,
    step]."""
    if not spec:
        return
    kind, rank, at = spec.split(":")
    import jax
    at = int(at)
    if jax.process_index() != int(rank) \
            or not (step - n_done < at <= step):
        return
    if kind == "rank_killed":
        os._exit(1)
    elif kind == "rank_hung":
        while True:           # pragma: no cover - watched by heartbeats
            time.sleep(60)
    else:
        raise ValueError(f"unknown simulated fault kind: {kind!r}")


def write_heartbeat(workdir, step: int) -> None:
    """Per-process heartbeat file (atomic rename): <workdir>/heartbeats/
    rank<i> holds the last step + wall time. A monitor (or
    `check_heartbeats`) flags ranks whose file went stale — the detection
    half of the fault-tolerance story (the reaction half is the SIGTERM
    checkpoint save + resume, utils/checkpoint.py)."""
    import jax

    hb = Path(workdir) / "heartbeats"
    hb.mkdir(parents=True, exist_ok=True)
    path = hb / f"rank{jax.process_index()}"
    tmp = hb / f".rank{jax.process_index()}.tmp"
    tmp.write_text(json.dumps({"step": int(step), "time": time.time()}))
    tmp.rename(path)


def check_heartbeats(workdir, timeout_s: float = 60.0) -> Dict:
    """Ranks whose heartbeat is older than `timeout_s` (hung or dead)."""
    hb = Path(workdir) / "heartbeats"
    now = time.time()
    stale, live = [], {}
    for f in sorted(hb.glob("rank*")):
        rec = json.loads(f.read_text())
        rank = int(f.name[4:])
        live[rank] = rec
        if now - rec["time"] > timeout_s:
            stale.append(rank)
    return {"stale": stale, "ranks": live}
