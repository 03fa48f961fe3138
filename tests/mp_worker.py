"""Worker body for tests/test_multiprocess.py — runs in a SUBPROCESS as one
of two cooperating JAX processes over loopback (gloo CPU collectives), and
asserts the multi-host seams of tpu_asr.parallel.mesh behave like they must
on a pod: cross_process_sum, broadcast_int, local_rows (sharded AND
replicated layouts), sync_processes, and the
make_array_from_process_local_data batch-assembly convention
(process p's local rows land at global rows [p*local, (p+1)*local)).

Not a pytest file (no test_ prefix): invoked as
  python tests/mp_worker.py <coordinator> <num_processes> <process_id>
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    coord, n, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(coord, n, pid)

    import numpy as np

    from tpu_asr.parallel.mesh import (batch_sharding, broadcast_int,
                                       cross_process_sum, is_main_process,
                                       local_rows, make_mesh, replicated,
                                       sync_processes)

    assert jax.process_count() == n
    assert jax.device_count() == 2 * n
    assert is_main_process() == (pid == 0)

    # metric reduction: torchmetrics dist_reduce_fx='sum' equivalent
    s = cross_process_sum([1.0 + pid, 2.0])
    np.testing.assert_allclose(s, [sum(1.0 + p for p in range(n)), 2.0 * n])

    # rank-0 value agreement (experiment-dir version suffix)
    assert broadcast_int(7 if pid == 0 else 99) == 7

    # batch assembly + local_rows on a data-sharded global array
    mesh = make_mesh()
    local = (np.arange(4, dtype=np.float32).reshape(2, 2) + 10 * pid)
    ga = jax.make_array_from_process_local_data(batch_sharding(mesh), local)
    assert ga.shape == (2 * n, 2)
    np.testing.assert_array_equal(local_rows(ga), local)

    # local_rows when XLA replicates the output instead
    rep = jax.jit(lambda x: x, out_shardings=replicated(mesh))(ga)
    np.testing.assert_array_equal(local_rows(rep), local)

    # a global reduction through the jitted psum path
    tot = jax.jit(lambda x: x.sum(), out_shardings=replicated(mesh))(ga)
    expect = sum(float((np.arange(4) + 10 * p).sum()) for p in range(n))
    assert float(tot) == expect, (float(tot), expect)

    sync_processes("probe_done")
    print(f"MP_PROBE_OK {pid}", flush=True)


if __name__ == "__main__":
    main()
