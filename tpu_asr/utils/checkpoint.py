"""Checkpoint / resume — orbax-backed rebuild of the reference's Lightning
ModelCheckpoint + .nemo archive behavior (SURVEY.md §5):

- `save_last` / rotation: `checkpoints/last` with `last -> last-vN` rotation on
  restart (asr_train.py:1691-1705).
- Full-train-state checkpoints (params + batch_stats + opt_state + step) for
  resume, and STUDENT-ONLY exports for inference — an explicit partition that
  replaces the reference's `load_state_dict(strict=False)` smell
  (asr_inference.py:389-395): KD wrapper weights (teacher.*, flow_matching.*,
  router.*) are simply not part of the student export.
- Preemption-safe: `install_preemption_handler` checkpoints on SIGTERM before
  re-raising (NeMo PreemptionCallback equivalent, exp_manager.py:443-530).
"""

from __future__ import annotations

import json
import shutil
import signal
import sys
from pathlib import Path
from typing import Any, Callable, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _as_path(p) -> Path:
    return Path(p).absolute()


def rotate_last(ckpt_dir) -> None:
    """last -> last-vN rotation on restart (asr_train.py:1695-1705).

    Multi-process: only process 0 renames (one rename on the shared
    filesystem), with barriers so no process probes `last` mid-rotation."""
    from tpu_asr.parallel.mesh import is_main_process, sync_processes

    ckpt_dir = _as_path(ckpt_dir)
    if is_main_process():
        last = ckpt_dir / "last"
        if last.exists():
            n = 1
            while (ckpt_dir / f"last-v{n}").exists():
                n += 1
            last.rename(ckpt_dir / f"last-v{n}")
    sync_processes("rotate_last")


def save_train_state(ckpt_dir, state, name: str = "last",
                     overwrite: bool = True) -> Path:
    """Save {step, params, batch_stats, opt_state} with orbax."""
    from tpu_asr.parallel.mesh import is_main_process, sync_processes

    ckpt_dir = _as_path(ckpt_dir)
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    target = ckpt_dir / name
    if target.exists() and overwrite:
        # one rmtree on the shared filesystem; every process then calls
        # orbax save (the multi-process save protocol requires all of them)
        if is_main_process():
            shutil.rmtree(target)
        sync_processes("ckpt_rmtree")
    ckptr = ocp.StandardCheckpointer()
    payload = {"step": state.step, "params": state.params,
               "batch_stats": state.batch_stats, "opt_state": state.opt_state}
    ckptr.save(target, payload)
    ckptr.wait_until_finished()
    return target


def restore_train_state(ckpt_dir, state, name: str = "last"):
    """Restore into the structure of `state` (same model/optimizer)."""
    target = _as_path(ckpt_dir) / name
    ckptr = ocp.StandardCheckpointer()
    template = {"step": state.step, "params": state.params,
                "batch_stats": state.batch_stats, "opt_state": state.opt_state}
    restored = ckptr.restore(target, template)
    return state.replace(step=restored["step"], params=restored["params"],
                         batch_stats=restored["batch_stats"],
                         opt_state=restored["opt_state"])


def export_student(ckpt_dir, state, student_cfg, name: str = "student") -> Path:
    """Inference export: student params/batch_stats + config only."""
    from tpu_asr.parallel.mesh import is_main_process, sync_processes

    ckpt_dir = _as_path(ckpt_dir)
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    target = ckpt_dir / name
    if target.exists():
        if is_main_process():
            shutil.rmtree(target)
        sync_processes("export_rmtree")
    ckptr = ocp.StandardCheckpointer()
    stats = state.batch_stats.get("student", {}) if state.batch_stats else {}
    ckptr.save(target, {"params": state.params["student"],
                        "batch_stats": stats})
    ckptr.wait_until_finished()
    if is_main_process():
        (ckpt_dir / f"{name}_config.json").write_text(
            json.dumps(student_cfg.to_dict(), indent=2))
    sync_processes("export_config")
    return target


def load_student(ckpt_path, template_params, template_stats=None):
    """Load a student export; returns (params, batch_stats)."""
    ckptr = ocp.StandardCheckpointer()
    template = {"params": template_params, "batch_stats": template_stats or {}}
    restored = ckptr.restore(_as_path(ckpt_path), template)
    return restored["params"], restored["batch_stats"]


def install_preemption_handler(save_fn: Callable[[], None],
                               sig=signal.SIGTERM):
    """Checkpoint on SIGTERM then exit — TPU preemptions are real (SURVEY.md §5).

    Returns the previous handler so callers can scope the hook to the
    training run (Trainer.fit restores it on exit; a leaked handler turns
    any later SIGTERM — e.g. a test-harness timeout — into a bogus
    checkpoint-save-and-exit inside unrelated code)."""

    def handler(signum, frame):
        save_fn()
        sys.exit(143)

    return signal.signal(sig, handler)


def restore_signal_handler(prev, sig=signal.SIGTERM) -> None:
    signal.signal(sig, prev if prev is not None else signal.SIG_DFL)
