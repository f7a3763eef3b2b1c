"""Shared problem definition for the multi-process distributed test.

Imported by BOTH the in-test single-process reference and the spawned
workers (tests/test_multiprocess.py), so the two runs cannot drift onto
different problems."""

import numpy as np


def build_solver(n_devices):
    import jax.numpy as jnp  # noqa: F401  (after jax.distributed init)

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
    return ShardedMonodomainSolver(
        mesh=mesh,
        M=0.001,
        ode_fun=fhn.forward_euler,
        init_states=fhn.init_state_values(),
        parameters=fhn.init_parameter_values(),
        v_index=fhn.state_index("v"),
        I_s=I_s,
        device_mesh=make_device_mesh(n_devices),
    )


def run_and_checksum(solver, n_steps=40, dt=0.05):
    import jax.numpy as jnp

    amps = solver.stimulus_amplitudes()
    dtj = jnp.asarray(dt, dtype=solver.states.dtype)
    t0 = jnp.asarray(0.0, dtype=solver.states.dtype)
    out = solver._run_chunk(solver.states, solver.activation_time, t0, dtj, amps, n_steps)
    v = out[0][solver.v_index]
    return {
        "vsum": float(jnp.sum(v)),
        "vmax": float(jnp.max(v)),
        "n_act": int(jnp.sum(out[1] >= 0)),
    }
