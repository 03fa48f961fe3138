#!/usr/bin/env python
"""Multi-process (pod-style) simulation over loopback — two JAX processes,
two virtual CPU devices each, running the REAL CLI entry points end-to-end.

The single-controller seams this exercises are exactly the ones a TPU pod
uses (MULTIHOST.md): per-process manifest striping,
`jax.make_array_from_process_local_data` batch assembly, gloo cross-process
collectives (the GSPMD psum path), `cross_process_sum` metric reduction,
orbax multi-process checkpoint save/restore, and the rank-zero gating of
metrics files / checkpoint rotation / tokenizer sidecars.

Phases:
  A. single-process reference: train (dp=4 on one process) + eval
  B. 2-process training: same global batch (2 local x 2 procs), shared
     output dir — asserts completion, un-duplicated metrics.jsonl, and a
     restorable checkpoint
  C. 2-process distributed eval of phase A's checkpoint — WER must match
     the single-process eval exactly, loss to float-sum tolerance
  D. single-process eval of phase B's (multi-process-saved) checkpoint —
     cross-restore in the other direction

Usage:
  python scripts/multiprocess_sim.py            # run all phases
  python scripts/multiprocess_sim.py --workdir /tmp/mp_sim --keep

Worker mode (internal):
  python scripts/multiprocess_sim.py worker --coordinator localhost:P \
      --num_processes 2 --process_id 0 --local_devices 2 \
      --entry asr_train -- <cli flags...>

Reference behavior being modeled: Lightning DDP multi-node training of the
KD trainers (SURVEY.md §2.4 — strategy 'ddp'); there the reference has no
cluster-free test at all, this gives one.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import socket
import subprocess
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


# ---------------------------------------------------------------------------
# worker
# ---------------------------------------------------------------------------

def run_worker(argv):
    p = argparse.ArgumentParser()
    p.add_argument("--coordinator", required=True)
    p.add_argument("--num_processes", type=int, required=True)
    p.add_argument("--process_id", type=int, required=True)
    p.add_argument("--local_devices", type=int, default=2)
    p.add_argument("--entry", required=True,
                   choices=["asr_train", "asr_inference"])
    p.add_argument("--cache_dir", default=str(REPO / ".jax_cache"))
    args, rest = p.parse_known_args(argv)
    if rest and rest[0] == "--":
        rest = rest[1:]

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", args.local_devices)
    # gloo TCP collectives: the CPU stand-in for the pod's ICI/DCN fabric
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.config.update("jax_compilation_cache_dir", args.cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    if args.num_processes > 1:
        jax.distributed.initialize(args.coordinator, args.num_processes,
                                   args.process_id)
    assert jax.process_count() == args.num_processes
    assert jax.device_count() == args.num_processes * args.local_devices

    sys.path.insert(0, str(REPO))
    module = __import__(args.entry)
    sys.argv = [f"{args.entry}.py"] + rest
    module.main()


# ---------------------------------------------------------------------------
# launcher
# ---------------------------------------------------------------------------

def _free_port() -> int:
    s = socket.socket()
    s.bind(("", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _spawn_phase(name, num_processes, local_devices, entry, cli_args,
                 workdir, timeout=900):
    """Spawn `num_processes` workers, stream logs to files, wait for all."""
    port = _free_port()
    procs, logs = [], []
    for pid in range(num_processes):
        log = workdir / "logs" / f"{name}_proc{pid}.log"
        log.parent.mkdir(parents=True, exist_ok=True)
        cmd = [sys.executable, str(REPO / "scripts" / "multiprocess_sim.py"),
               "worker",
               "--coordinator", f"localhost:{port}",
               "--num_processes", str(num_processes),
               "--process_id", str(pid),
               "--local_devices", str(local_devices),
               "--entry", entry, "--"] + list(cli_args)
        f = open(log, "w")
        procs.append((pid, subprocess.Popen(
            cmd, stdout=f, stderr=subprocess.STDOUT, cwd=str(REPO)), f))
        logs.append(log)
    deadline = time.time() + timeout
    rcs = {}
    for pid, proc, f in procs:
        try:
            rcs[pid] = proc.wait(timeout=max(1, deadline - time.time()))
        except subprocess.TimeoutExpired:
            proc.kill()
            rcs[pid] = -9
        f.close()
    for pid in rcs:
        if rcs[pid] != 0:
            tail = "\n".join(
                logs[pid].read_text().splitlines()[-25:])
            raise RuntimeError(
                f"[{name}] proc{pid} failed rc={rcs[pid]}\n--- log tail ---\n"
                f"{tail}")
    print(f"[{name}] {num_processes} proc(s) OK "
          f"(logs: {logs[0].parent})", flush=True)
    return logs


_METRIC_RE = re.compile(
    r"\[([\w/.]+)\] wer=([0-9.]+) loss=([0-9.na-]+) \((\d+) utts\)")


def _parse_metrics(log_path) -> dict:
    out = {}
    for m in _METRIC_RE.finditer(Path(log_path).read_text()):
        out[m.group(1)] = {"wer": float(m.group(2)),
                           "loss": float(m.group(3)),
                           "num_utts": int(m.group(4))}
    return out


def _make_corpus(root: Path):
    """Tiny deterministic synthetic corpus + model config (no teacher:
    the CLI falls back to a random teacher + trained BPE tokenizer)."""
    import numpy as np
    sys.path.insert(0, str(REPO))
    from tpu_asr.data.audio import write_wav
    from tpu_asr.data.manifest import ManifestEntry, write_manifest

    texts = ["the cat sat on a mat", "a dog ran far", "hello wide world",
             "speech is fun to model", "jax runs on tpu pods",
             "quick brown fox jumps", "over the lazy dog", "one more short utt"]
    rng = np.random.default_rng(7)
    entries = []
    for i, text in enumerate(texts):
        dur = 0.8 + 0.08 * i
        x = (rng.normal(size=int(16000 * dur)) * 0.1).astype(np.float32)
        p = root / f"utt{i}.wav"
        write_wav(p, x, 16000)
        entries.append(ManifestEntry(str(p), dur, text))
    write_manifest(root / "train.jsonl", entries)
    write_manifest(root / "val.jsonl", entries[:6])

    cfg = {
        "preprocessor": {"sample_rate": 16000, "features": 32, "n_fft": 512,
                         "window_size": 0.025, "window_stride": 0.01},
        "encoder": {"feat_in": 32, "n_layers": 2, "d_model": 16,
                    "n_heads": 2, "conv_kernel_size": 7,
                    "ff_expansion_factor": 2, "dropout": 0.0,
                    "dropout_pre_encoder": 0.0, "dropout_att": 0.0},
        "decoder": {"feat_in": 16, "num_classes": 32},
    }
    import yaml
    (root / "tiny.yaml").write_text(yaml.safe_dump(cfg))


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        run_worker(sys.argv[2:])
        return

    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default=None)
    p.add_argument("--keep", action="store_true")
    p.add_argument("--timeout", type=int, default=900)
    args = p.parse_args()

    root = Path(args.workdir or tempfile.mkdtemp(prefix="tpu_asr_mpsim_"))
    root.mkdir(parents=True, exist_ok=True)
    print(f"workdir: {root}", flush=True)
    _make_corpus(root)

    common = ["--train_manifest", str(root / "train.jsonl"),
              "--val_manifest", str(root / "val.jsonl"),
              "--config", str(root / "tiny.yaml"),
              "--epochs", "2", "--gpus", "-1",
              "--use_logit_distillation", "true"]

    # A: single-process reference (4 devices on one process, global batch 4)
    _spawn_phase("A_train_1proc", 1, 4, "asr_train",
                 common + ["--batch_size", "4",
                           "--output_dir", str(root / "out_single")],
                 root, args.timeout)
    ckpt_a = root / "out_single" / "run" / "checkpoints" / "last"
    assert ckpt_a.exists(), "phase A left no checkpoint"

    # B: 2-process training, same global batch (2 local x 2)
    _spawn_phase("B_train_2proc", 2, 2, "asr_train",
                 common + ["--batch_size", "2",
                           "--output_dir", str(root / "out_mp")],
                 root, args.timeout)
    ckpt_b = root / "out_mp" / "run" / "checkpoints" / "last"
    assert ckpt_b.exists(), "phase B left no checkpoint"
    mj = (root / "out_mp" / "run" / "metrics.jsonl").read_text().splitlines()
    steps = [json.loads(r)["step"] for r in mj]
    assert len(steps) == len(set(steps)), \
        f"metrics.jsonl has duplicated steps (both processes wrote): {steps}"

    # C: distributed eval of phase A's checkpoint must reproduce the
    # single-process eval exactly (order-invariant sums)
    infer = ["--ckpt_path", str(ckpt_a),
             "--test_manifest", str(root / "val.jsonl"),
             "--config", str(root / "tiny.yaml"),
             "--use_logit_distillation", "true"]
    log_1 = _spawn_phase("C_eval_1proc", 1, 4, "asr_inference",
                         infer + ["--batch_size", "4", "--gpus", "-1",
                                  "--output_dir", str(root / "ev1")],
                         root, args.timeout)[0]
    log_2 = _spawn_phase("C_eval_2proc", 2, 2, "asr_inference",
                         infer + ["--batch_size", "2", "--gpus", "-1",
                                  "--output_dir", str(root / "ev2")],
                         root, args.timeout)[0]
    m1, m2 = _parse_metrics(log_1), _parse_metrics(log_2)
    assert m1 and m2, f"could not parse metrics: {m1} {m2}"
    for split in m1:
        a, b = m1[split], m2[split]
        assert a["num_utts"] == b["num_utts"] == 6, (a, b)
        assert a["wer"] == b["wer"], f"WER mismatch {split}: {a} vs {b}"
        assert abs(a["loss"] - b["loss"]) < 1e-5, \
            f"loss mismatch {split}: {a} vs {b}"
    print(f"[C] distributed eval parity OK: {m1}", flush=True)

    # D: cross-restore — single-process eval of the multi-process checkpoint
    log_d = _spawn_phase("D_eval_mp_ckpt_1proc", 1, 4, "asr_inference",
                         ["--ckpt_path", str(ckpt_b),
                          "--test_manifest", str(root / "val.jsonl"),
                          "--config", str(root / "tiny.yaml"),
                          "--use_logit_distillation", "true",
                          "--batch_size", "4", "--gpus", "-1",
                          "--output_dir", str(root / "ev3")],
                         root, args.timeout)[0]
    md = _parse_metrics(log_d)
    assert md and all(v["num_utts"] == 6 for v in md.values()), md
    print(f"[D] cross-restore OK: {md}", flush=True)

    print("MULTIPROCESS SIM: ALL PHASES OK", flush=True)
    if not args.keep and args.workdir is None:
        import shutil
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
