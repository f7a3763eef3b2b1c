"""REAL multi-process distributed run (the ``mpirun -n 2`` analogue).

The rest of the suite validates sharding on one process with 8 virtual
devices; this test launches TWO separate Python processes joined through
``jax.distributed.initialize`` (Gloo CPU collectives), builds the global
device mesh across them, runs the sharded monodomain solver SPMD, and
compares global checksums against a single-process reference — the
counterpart of the reference's ``mpirun -n 2`` CI job
(``.github/workflows/main-mpi.yml:15-31`` there) that round-2 review
marked unverifiable.
"""

import json
import socket
import subprocess
import sys
import textwrap
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent

WORKER = textwrap.dedent(
    """
    import json, sys
    import numpy as np
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    port, pid = sys.argv[1], int(sys.argv[2])
    sys.path.insert(0, %(repo)r)
    # through the package's own entry point (explicit kwargs re-raise on
    # failure rather than degrading)
    from fenicsx_beat_tpu.parallel.distributed import initialize_distributed
    initialize_distributed(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=2, process_id=pid)
    import jax.numpy as jnp
    from fenicsx_beat_tpu.geometry import get_2D_slab_mesh
    from fenicsx_beat_tpu import mesh as meshmod, stimulation
    from fenicsx_beat_tpu.models import fitzhughnagumo as fhn
    from fenicsx_beat_tpu.parallel import ShardedMonodomainSolver
    from fenicsx_beat_tpu.parallel.distributed import make_device_mesh

    assert jax.process_count() == 2 and jax.device_count() >= 2

    mesh = get_2D_slab_mesh(None, dx=0.1, Lx=2.0, Ly=1.0)
    cells = meshmod.locate_entities(mesh, 2, lambda x: x[0] < 0.4)
    tags = meshmod.meshtags(mesh, 2, cells, 1)
    I_s = stimulation.Stimulus(
        expr=stimulation.TimeWindow(amplitude=40.0, start=0.0, duration=1.0),
        dZ=stimulation.dx(mesh, subdomain_data=tags), marker=1)
    solver = ShardedMonodomainSolver(
        mesh=mesh, M=0.001, ode_fun=fhn.forward_euler,
        init_states=fhn.init_state_values(),
        parameters=fhn.init_parameter_values(),
        v_index=fhn.state_index("v"), I_s=I_s,
        device_mesh=make_device_mesh(2))
    amps = solver.stimulus_amplitudes()
    dtj = jnp.asarray(0.05, dtype=solver.states.dtype)
    t0 = jnp.asarray(0.0, dtype=solver.states.dtype)
    out = solver._run_chunk(solver.states, solver.activation_time, t0, dtj, amps, 40)
    states, act = out[0], out[1]

    # replicated global reductions: safe to pull on every process
    v = states[solver.v_index]
    vsum = float(jnp.sum(v))
    vmax = float(jnp.max(v))
    n_act = int(jnp.sum(act >= 0))
    if jax.process_index() == 0:
        print("RESULT " + json.dumps({"vsum": vsum, "vmax": vmax, "n_act": n_act,
                                      "n_devices": jax.device_count(),
                                      "n_processes": jax.process_count()}), flush=True)
    """
) % {"repo": str(REPO)}


def test_two_process_distributed_matches_single_process(tmp_path):
    # free port for the coordinator
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    worker_file = tmp_path / "worker.py"
    worker_file.write_text(WORKER)
    # one local device per process -> a 2-device global mesh, independent
    # of the suite's own 8-virtual-device XLA_FLAGS (the checksum covers
    # padded rows, so both runs must use the identical 2-way partition)
    import os

    env = {**os.environ, "XLA_FLAGS": "--xla_force_host_platform_device_count=1"}
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker_file), str(port), str(pid)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=540)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
    result = None
    for line in outs[0].splitlines():
        if line.startswith("RESULT "):
            result = json.loads(line[len("RESULT "):])
    assert result is not None, f"no RESULT line:\n{outs[0][-2000:]}"
    assert result["n_processes"] == 2 and result["n_devices"] >= 2

    # single-process reference on the identical problem
    import jax
    import jax.numpy as jnp

    from fenicsx_beat_tpu import mesh as meshmod
    from fenicsx_beat_tpu import stimulation
    from fenicsx_beat_tpu.geometry import get_2D_slab_mesh
    from fenicsx_beat_tpu.models import fitzhughnagumo as fhn
    from fenicsx_beat_tpu.parallel import ShardedMonodomainSolver
    from fenicsx_beat_tpu.parallel.distributed import make_device_mesh

    mesh = get_2D_slab_mesh(None, dx=0.1, Lx=2.0, Ly=1.0)
    cells = meshmod.locate_entities(mesh, 2, lambda x: x[0] < 0.4)
    tags = meshmod.meshtags(mesh, 2, cells, 1)
    I_s = stimulation.Stimulus(
        expr=stimulation.TimeWindow(amplitude=40.0, start=0.0, duration=1.0),
        dZ=stimulation.dx(mesh, subdomain_data=tags),
        marker=1,
    )
    solver = ShardedMonodomainSolver(
        mesh=mesh,
        M=0.001,
        ode_fun=fhn.forward_euler,
        init_states=fhn.init_state_values(),
        parameters=fhn.init_parameter_values(),
        v_index=fhn.state_index("v"),
        I_s=I_s,
        device_mesh=make_device_mesh(2),
    )
    amps = solver.stimulus_amplitudes()
    dtj = jnp.asarray(0.05, dtype=solver.states.dtype)
    t0 = jnp.asarray(0.0, dtype=solver.states.dtype)
    out = solver._run_chunk(solver.states, solver.activation_time, t0, dtj, amps, 40)
    v = out[0][solver.v_index]
    vsum, vmax = float(jnp.sum(v)), float(jnp.max(v))
    n_act = int(jnp.sum(out[1] >= 0))

    np.testing.assert_allclose(result["vsum"], vsum, rtol=1e-9)
    np.testing.assert_allclose(result["vmax"], vmax, rtol=1e-9)
    assert result["n_act"] == n_act and n_act > 0
