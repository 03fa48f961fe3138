"""Multi-PROCESS coverage (SURVEY.md §2.4 DDP; MULTIHOST.md): two real JAX
processes over loopback with gloo CPU collectives — the seams a TPU pod uses
that the in-process 8-device virtual mesh cannot reach:
`jax.make_array_from_process_local_data`, `process_allgather`
(cross_process_sum), rank-0 gating, and `local_rows` shard extraction.

The light probe (tests/mp_worker.py) runs in-suite. The full CLI simulation
(scripts/multiprocess_sim.py: 2-process training + distributed-eval parity +
orbax cross-restore, ~6 min on this 1-core host) is opt-in:
  TPU_ASR_MP_SIM=1 python -m pytest tests/test_multiprocess.py -q
or run the script directly.
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def _free_port() -> int:
    s = socket.socket()
    s.bind(("", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_mesh_seams(tmp_path):
    """Both workers must finish rc=0 and print MP_PROBE_OK (asserts inside
    tests/mp_worker.py)."""
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)        # worker pins its own device count
    procs, logs = [], []
    for pid in range(2):
        log = open(tmp_path / f"proc{pid}.log", "w")
        procs.append(subprocess.Popen(
            [sys.executable, str(REPO / "tests" / "mp_worker.py"),
             f"localhost:{port}", "2", str(pid)],
            stdout=log, stderr=subprocess.STDOUT, cwd=str(REPO), env=env))
        logs.append(log)
    rcs = [p.wait(timeout=300) for p in procs]
    for log in logs:
        log.close()
    for pid in range(2):
        text = (tmp_path / f"proc{pid}.log").read_text()
        assert rcs[pid] == 0, \
            f"proc{pid} rc={rcs[pid]}\n{text[-2000:]}"
        assert f"MP_PROBE_OK {pid}" in text


def test_scoped_fit_eval_cross_restore(tmp_path):
    """Default-suite 2-process sim (scoped-down multiprocess_sim.py): a
    3-step distributed Trainer.fit with distributed eval, then a
    SINGLE-process cross-restore of the multi-process orbax checkpoint that
    must reproduce the distributed eval's WER exactly (order-invariant
    (scores, words) sums) and loss to float tolerance."""
    import json

    import numpy as np

    from tests.mp_fit_worker import TEXTS
    from tpu_asr.data.audio import write_wav
    from tpu_asr.data.manifest import ManifestEntry, write_manifest

    rng = np.random.default_rng(5)
    entries = []
    for i, text in enumerate(TEXTS):
        dur = 0.7 + 0.08 * i
        x = (rng.normal(size=int(16000 * dur)) * 0.1).astype(np.float32)
        p = tmp_path / f"utt{i}.wav"
        write_wav(p, x, 16000)
        entries.append(ManifestEntry(str(p), dur, text))
    write_manifest(tmp_path / "train.jsonl", entries)
    write_manifest(tmp_path / "val.jsonl", entries)

    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    procs, logs = [], []
    for pid in range(2):
        log = open(tmp_path / f"fit{pid}.log", "w")
        procs.append(subprocess.Popen(
            [sys.executable, str(REPO / "tests" / "mp_fit_worker.py"),
             "fit", f"localhost:{port}", "2", str(pid), str(tmp_path)],
            stdout=log, stderr=subprocess.STDOUT, cwd=str(REPO), env=env))
        logs.append(log)
    rcs = [p.wait(timeout=420) for p in procs]
    for log in logs:
        log.close()
    for pid in range(2):
        text = (tmp_path / f"fit{pid}.log").read_text()
        assert rcs[pid] == 0, f"fit proc{pid} rc={rcs[pid]}\n{text[-2500:]}"
        assert f"MP_FIT_OK {pid}" in text
    fit_m = json.loads((tmp_path / "fit_metrics.json").read_text())
    assert fit_m["num_utts"] == len(TEXTS)

    r = subprocess.run(
        [sys.executable, str(REPO / "tests" / "mp_fit_worker.py"),
         "eval", str(tmp_path)],
        capture_output=True, text=True, timeout=420, cwd=str(REPO), env=env)
    assert r.returncode == 0, r.stdout[-2500:] + r.stderr[-2500:]
    ev_m = json.loads((tmp_path / "eval_metrics.json").read_text())
    assert ev_m["num_utts"] == fit_m["num_utts"]
    assert ev_m["wer"] == fit_m["wer"], (ev_m, fit_m)
    assert abs(ev_m["loss"] - fit_m["loss"]) < 1e-5, (ev_m, fit_m)


@pytest.mark.skipif(not os.environ.get("TPU_ASR_MP_SIM"),
                    reason="full 2-process CLI simulation is opt-in "
                           "(TPU_ASR_MP_SIM=1); ~6 min on a 1-core host")
def test_full_multiprocess_simulation(tmp_path):
    r = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "multiprocess_sim.py"),
         "--workdir", str(tmp_path / "sim")],
        capture_output=True, text=True, timeout=1500, cwd=str(REPO))
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    assert "MULTIPROCESS SIM: ALL PHASES OK" in r.stdout
