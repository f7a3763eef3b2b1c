"""Single-cell steady-state pacing tests (reference ``single_cell.py:86-156``):
limit-cycle convergence on a simple relaxation ODE, hash-keyed cache
behavior, and TP06 0-D pacing smoke."""

import numpy as np

from fenicsx_beat_tpu.models import tentusscher_panfilov_2006 as tp06
from fenicsx_beat_tpu.single_cell import compute_hash, get_steady_state


def decay_ode(states, t, dt, parameters):
    # dy/dt = -(y - target)/tau — exact propagator step
    (y,) = states
    tau, target = parameters
    e = np.exp(-dt / tau)
    out = np.zeros_like(states)
    out[0] = target + (y - target) * e
    return out


def test_steady_state_converges_and_caches(tmp_path):
    init = np.array([[10.0]])
    params = np.array([5.0, 1.0])
    y = get_steady_state(
        fun=decay_ode,
        init_states=init,
        parameters=params,
        outdir=tmp_path,
        nbeats=3,
        BCL=100,
        dt=0.1,
    )
    # after 3x100 time units with tau=5 the state must be at the target
    assert np.allclose(y, 1.0, atol=1e-6)

    # a cache file must exist and a second call must hit it
    caches = list(tmp_path.glob("steady_states_*.npy"))
    assert len(caches) == 1
    # poison the cache to prove the second call reads it instead of solving
    np.save(caches[0], np.array([42.0]))
    y2 = get_steady_state(
        fun=decay_ode,
        init_states=init,
        parameters=params,
        outdir=tmp_path,
        nbeats=3,
        BCL=100,
        dt=0.1,
    )
    assert np.allclose(y2, 42.0)


def test_hash_distinguishes_inputs():
    init = np.array([[10.0]])
    p1 = np.array([5.0, 1.0])
    p2 = np.array([5.0, 2.0])
    h1 = compute_hash(fun=decay_ode, init_states=init, parameters=p1, nbeats=3, BCL=100, dt=0.1)
    h2 = compute_hash(fun=decay_ode, init_states=init, parameters=p2, nbeats=3, BCL=100, dt=0.1)
    h3 = compute_hash(fun=decay_ode, init_states=init, parameters=p1, nbeats=4, BCL=100, dt=0.1)
    assert h1 != h2
    assert h1 != h3


def test_tp06_single_cell_paces(tmp_path):
    """One paced beat of TP06 with its own stimulus current produces an AP."""
    init = tp06.init_state_values()
    params = tp06.init_parameter_values(stim_amplitude=-52.0, stim_start=10.0)
    y = get_steady_state(
        fun=tp06.generalized_rush_larsen,
        init_states=init,
        parameters=params,
        outdir=tmp_path,
        nbeats=1,
        BCL=400,
        dt=0.05,
    )
    assert y.shape[0] == init.shape[0]
    v = y[tp06.state_index("V")]
    # back near rest at end of beat, and finite everywhere
    assert np.all(np.isfinite(y))
    assert v < 0.0
