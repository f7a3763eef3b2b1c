"""REAL multi-process distributed run (the ``mpirun -n 2`` analogue).

The rest of the suite validates sharding on one process with 8 virtual
devices; this test launches TWO separate Python processes joined through
``jax.distributed`` (Gloo CPU collectives), builds the global device
mesh across them, runs the sharded monodomain solver SPMD, and compares
global checksums against a single-process reference — the counterpart
of the reference's ``mpirun -n 2`` CI job
(``.github/workflows/main-mpi.yml:15-31`` there) that round-2 review
marked unverifiable.  Both runs build the identical problem through
``tests/_mp_problem.py``.
"""

import json
import os
import socket
import subprocess
import sys
import textwrap
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent

WORKER = textwrap.dedent(
    """
    import json, sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    port, pid = sys.argv[1], int(sys.argv[2])
    sys.path.insert(0, %(repo)r)
    sys.path.insert(0, %(tests)r)
    # through the package's own entry point (explicit kwargs re-raise on
    # failure rather than degrading)
    from fenicsx_beat_tpu.parallel.distributed import initialize_distributed
    initialize_distributed(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=2, process_id=pid)
    assert jax.process_count() == 2 and jax.device_count() >= 2
    from _mp_problem import build_solver, run_and_checksum

    solver = build_solver(n_devices=2)
    result = run_and_checksum(solver)
    result.update(n_devices=jax.device_count(), n_processes=jax.process_count())
    if jax.process_index() == 0:
        print("RESULT " + json.dumps(result), flush=True)
    """
) % {"repo": str(REPO), "tests": str(REPO / "tests")}


def _spawn_workers(tmp_path, port):
    worker_file = tmp_path / "worker.py"
    worker_file.write_text(WORKER)
    # one local device per process -> a 2-device global mesh, independent
    # of the suite's own 8-virtual-device XLA_FLAGS (the checksum covers
    # padded rows, so both runs must use the identical 2-way partition)
    env = {**os.environ, "XLA_FLAGS": "--xla_force_host_platform_device_count=1"}
    return [
        subprocess.Popen(
            [sys.executable, str(worker_file), str(port), str(pid)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for pid in (0, 1)
    ]


def test_two_process_distributed_matches_single_process(tmp_path):
    # bind-then-close free-port discovery races other processes on the
    # host, so retry the whole launch once on a fresh port
    result = None
    outs = ["", ""]
    for attempt in range(2):
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]
        procs = _spawn_workers(tmp_path, port)
        try:
            outs = [p.communicate(timeout=540)[0] for p in procs]
        finally:
            for p in procs:
                if p.poll() is None:
                    p.kill()
        if all(p.returncode == 0 for p in procs):
            break
        if attempt == 1:
            for pid, out in enumerate(outs):
                assert procs[pid].returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
    for line in outs[0].splitlines():
        if line.startswith("RESULT "):
            result = json.loads(line[len("RESULT "):])
    assert result is not None, f"no RESULT line:\n{outs[0][-2000:]}"
    assert result["n_processes"] == 2 and result["n_devices"] >= 2

    # single-process reference on the identical problem (same module)
    sys.path.insert(0, str(REPO / "tests"))
    from _mp_problem import build_solver, run_and_checksum

    ref = run_and_checksum(build_solver(n_devices=2))

    np.testing.assert_allclose(result["vsum"], ref["vsum"], rtol=1e-9)
    np.testing.assert_allclose(result["vmax"], ref["vmax"], rtol=1e-9)
    assert result["n_act"] == ref["n_act"] and ref["n_act"] > 0
