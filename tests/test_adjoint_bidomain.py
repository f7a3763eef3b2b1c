"""Gradient correctness of the differentiable BIDOMAIN simulation.

Same ground truth as ``tests/test_adjoint.py``: every gradient is
checked against central finite differences in f64.  Forward correctness
is pinned against the production :class:`BidomainSolver` (same block
discretization, deflation and theta choreography), and against the exact
monodomain reduction for proportional conductivities.  (The reference is
monodomain-only and has no adjoint path: neither the model nor its
gradients exist in ``/root/reference/src/beat``.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fenicsx_beat_tpu import mesh as meshmod
from fenicsx_beat_tpu import stimulation
from fenicsx_beat_tpu.adjoint import (
    build_diff_bidomain_simulator,
    build_diff_simulator,
    host_segmented_value_and_grad,
)
from fenicsx_beat_tpu.bidomain import BidomainSolver
from fenicsx_beat_tpu.models import fitzhughnagumo as fhn


def _fd(f, x, eps=1e-6):
    x = np.asarray(x, dtype=np.float64)
    g = np.zeros_like(x)
    for i in range(x.size):
        xp = x.copy()
        xm = x.copy()
        xp.flat[i] += eps
        xm.flat[i] -= eps
        g.flat[i] = (float(f(xp)) - float(f(xm))) / (2 * eps)
    return g


def _setup(nx=8):
    mesh = meshmod.create_unit_square(None, nx, nx)
    cells = meshmod.locate_entities(mesh, 2, lambda x: (x[0] < 0.3) & (x[1] < 0.3))
    tags = meshmod.meshtags(mesh, 2, cells, 1)
    I_s = stimulation.Stimulus(
        expr=stimulation.TimeWindow(amplitude=30.0, start=0.0, duration=1.0),
        dZ=stimulation.dx(mesh, subdomain_data=tags),
        marker=1,
    )
    probes = np.array([[0.15, 0.15], [0.7, 0.7]])
    return mesh, I_s, probes


@pytest.fixture(scope="module")
def bi_sim():
    mesh, I_s, probes = _setup()
    sim = build_diff_bidomain_simulator(
        mesh,
        ode_fun=fhn.forward_euler,
        init_states=fhn.init_state_values(),
        v_index=fhn.state_index("v"),
        I_s=I_s,
        probe_points=probes,
        u_probe_points=probes,
        dt=0.1,
        n_steps=20,
    )
    return sim


@pytest.mark.parametrize("theta", [1.0, 0.5])
def test_forward_matches_bidomain_solver(theta):
    """The diff simulator IS the production bidomain discretization:
    v and u_e match BidomainSolver step for step to solver tolerance."""
    mesh, I_s, probes = _setup()
    gi, ge = 0.004, 0.008
    params = fhn.init_parameter_values(stim_amplitude=0.0)
    common = dict(
        ode_fun=fhn.forward_euler,
        init_states=fhn.init_state_values(),
        v_index=fhn.state_index("v"),
        theta=theta,
        pde_theta=0.5,
    )
    n_steps, dt = 15, 0.1

    solver = BidomainSolver(
        mesh=mesh, M_i=gi, M_e=ge, I_s=I_s, parameters=params,
        cg_rtol=1e-12, cg_atol=1e-14, **common,
    )
    solver.solve((0.0, n_steps * dt), dt=dt)

    sim = build_diff_bidomain_simulator(
        mesh, I_s=I_s, probe_points=probes, u_probe_points=probes,
        dt=dt, n_steps=n_steps, cg_rtol=1e-12, cg_atol=1e-14, **common,
    )
    out, (states_fin, u_fin) = sim(
        {"gi": gi, "ge": ge, "ionic": jnp.asarray(params)}, return_final=True
    )
    v_sim = np.asarray(states_fin[fhn.state_index("v")])
    np.testing.assert_allclose(v_sim, np.asarray(solver.v), atol=5e-8)
    np.testing.assert_allclose(
        np.asarray(u_fin), np.asarray(solver.u_e), atol=5e-8
    )
    assert np.isfinite(np.asarray(out["v"])).all()
    assert np.abs(np.asarray(out["u_e"])).max() > 1e-5  # genuinely nonzero


def test_proportional_reduction_matches_diff_monodomain():
    """M_e = lam*M_i collapses to monodomain with M = lam/(1+lam)*M_i:
    the two DIFF simulators must agree on the v traces."""
    mesh, I_s, probes = _setup()
    lam, gi = 2.0, 0.004
    ionic = jnp.asarray(fhn.init_parameter_values(stim_amplitude=0.0))
    kw = dict(
        ode_fun=fhn.forward_euler,
        init_states=fhn.init_state_values(),
        v_index=fhn.state_index("v"),
        I_s=I_s,
        probe_points=probes,
        dt=0.1,
        n_steps=15,
        pde_theta=0.5,
        cg_rtol=1e-12,
        cg_atol=1e-14,
    )
    bi = build_diff_bidomain_simulator(mesh, **kw)
    mono = build_diff_simulator(mesh, **kw)
    tr_bi = bi({"gi": gi, "ge": lam * gi, "ionic": ionic})
    tr_mono = mono({"g": lam / (1.0 + lam) * gi, "ionic": ionic})
    np.testing.assert_allclose(
        np.asarray(tr_bi), np.asarray(tr_mono), atol=2e-7
    )


def test_gradients_match_fd(bi_sim):
    """gi, ge, stim_amplitude gradients of a v-trace loss vs central FD."""
    ionic = jnp.asarray(fhn.init_parameter_values(stim_amplitude=0.0))
    target = np.asarray(
        bi_sim({"gi": 0.004, "ge": 0.009, "ionic": ionic})["v"]
    )

    def loss_jax(p):
        out = bi_sim({**p, "ionic": ionic})
        return jnp.mean((out["v"] - target) ** 2)

    def loss_np(gi, ge, amp):
        return float(
            loss_jax({"gi": float(gi), "ge": float(ge), "stim_amplitude": float(amp)})
        )

    p0 = {"gi": 0.003, "ge": 0.007, "stim_amplitude": 28.0}
    grads = jax.grad(loss_jax)(p0)
    fd_gi = _fd(lambda x: loss_np(x, p0["ge"], p0["stim_amplitude"]),
                np.array([p0["gi"]]), eps=1e-7)[0]
    fd_ge = _fd(lambda x: loss_np(p0["gi"], x, p0["stim_amplitude"]),
                np.array([p0["ge"]]), eps=1e-7)[0]
    fd_a = _fd(lambda x: loss_np(p0["gi"], p0["ge"], x),
               np.array([p0["stim_amplitude"]]), eps=1e-5)[0]
    np.testing.assert_allclose(float(grads["gi"]), fd_gi, rtol=2e-4)
    np.testing.assert_allclose(float(grads["ge"]), fd_ge, rtol=2e-4)
    np.testing.assert_allclose(float(grads["stim_amplitude"]), fd_a, rtol=2e-4)


def test_ue_observable_gradient_matches_fd(bi_sim):
    """The genuinely bidomain inverse problem: a loss on the EXTRACELLULAR
    electrode traces differentiates w.r.t. the anisotropy ratio knob ge
    (no monodomain observable can pose this)."""
    ionic = jnp.asarray(fhn.init_parameter_values(stim_amplitude=0.0))
    target = np.asarray(bi_sim({"gi": 0.004, "ge": 0.009, "ionic": ionic})["u_e"])

    def loss(ge):
        out = bi_sim({"gi": 0.004, "ge": ge, "ionic": ionic})
        return jnp.mean((out["u_e"] - target) ** 2)

    ge0 = 0.006
    g = float(jax.grad(loss)(ge0))
    fd = _fd(lambda x: float(loss(float(x))), np.array([ge0]), eps=1e-7)[0]
    np.testing.assert_allclose(g, fd, rtol=2e-4)
    # the u_e mismatch genuinely pulls ge toward the target value
    assert g != 0.0


def test_ionic_parameter_gradient_matches_fd(bi_sim):
    """Directional FD check through the ionic parameter vector."""
    ionic0 = np.asarray(fhn.init_parameter_values(stim_amplitude=0.0))
    i_tau = fhn.parameter_index("b")
    target = np.asarray(bi_sim({"gi": 0.004, "ge": 0.009,
                                "ionic": jnp.asarray(ionic0)})["v"])

    def loss(bval):
        p = jnp.asarray(ionic0).at[i_tau].set(bval)
        out = bi_sim({"gi": 0.004, "ge": 0.009, "ionic": p})
        return jnp.mean((out["v"] - target) ** 2)

    b0 = float(ionic0[i_tau]) * 1.1
    g = float(jax.grad(loss)(b0))
    fd = _fd(lambda x: float(loss(float(x[0]))), np.array([b0]), eps=1e-5)[0]
    np.testing.assert_allclose(g, fd, rtol=2e-4)


def test_component_vectors_and_checkpointing():
    """Vector gi over two per-region components + nested checkpointing:
    gradients must be identical to the flat scan's."""
    mesh, I_s, probes = _setup(6)
    left = meshmod.locate_entities(mesh, 2, lambda x: x[0] < 0.5)
    right = meshmod.locate_entities(mesh, 2, lambda x: x[0] >= 0.5)
    n_cells = mesh.cells.shape[0]

    def region_spec(cells):
        w = np.zeros((n_cells, 2, 2))
        w[cells] = np.eye(2)
        return w  # per-cell isotropic tensor field, unit in the region

    comps = [region_spec(left), region_spec(right)]
    ionic = jnp.asarray(fhn.init_parameter_values(stim_amplitude=0.0))
    kw = dict(
        ode_fun=fhn.forward_euler,
        init_states=fhn.init_state_values(),
        v_index=fhn.state_index("v"),
        I_s=I_s,
        probe_points=probes,
        dt=0.1,
        n_steps=12,
        intra_components=comps,
        extra_components=comps,
    )
    flat = build_diff_bidomain_simulator(mesh, **kw)
    nested = build_diff_bidomain_simulator(mesh, checkpoint_segments=4, **kw)
    gi0 = jnp.asarray([0.003, 0.005])
    ge0 = jnp.asarray([0.008, 0.006])
    target = np.asarray(flat({"gi": gi0 * 1.2, "ge": ge0, "ionic": ionic}))

    def loss(sim, gi):
        return jnp.mean((sim({"gi": gi, "ge": ge0, "ionic": ionic}) - target) ** 2)

    g_flat = jax.grad(lambda g: loss(flat, g))(gi0)
    g_nested = jax.grad(lambda g: loss(nested, g))(gi0)
    np.testing.assert_allclose(np.asarray(g_flat), np.asarray(g_nested), rtol=1e-9)
    # per-region gradients differ (the stimulus sits in the left region)
    assert not np.isclose(float(g_flat[0]), float(g_flat[1]))
    # FD gate on the first component
    fd0 = _fd(
        lambda x: float(loss(flat, gi0.at[0].set(float(np.ravel(x)[0])))),
        np.array([float(gi0[0])]),
        eps=1e-7,
    )[0]
    np.testing.assert_allclose(float(g_flat[0]), fd0, rtol=2e-4)


def test_host_segmented_bidomain_matches_monolithic():
    """host_segmented_value_and_grad covers the bidomain simulator: the
    (states, u_e) carry chains through segment boundaries and the
    segmented gradient equals the monolithic one."""
    mesh, I_s, probes = _setup(5)
    ionic = jnp.asarray(fhn.init_parameter_values(stim_amplitude=0.0))
    m, K = 5, 4
    kw = dict(
        ode_fun=fhn.forward_euler,
        init_states=fhn.init_state_values(),
        v_index=fhn.state_index("v"),
        I_s=I_s,
        probe_points=probes,
        dt=0.1,
    )
    seg = build_diff_bidomain_simulator(mesh, n_steps=m, **kw)
    mono = build_diff_bidomain_simulator(mesh, n_steps=m * K, **kw)
    n = mesh.num_vertices
    states0 = (
        jnp.tile(jnp.asarray(fhn.init_state_values())[:, None], (1, n)),
        jnp.zeros((n,)),
    )
    p0 = {"gi": 0.003, "ge": 0.007}

    full = np.asarray(mono({**p0, "ionic": ionic, "gi": 0.004}))
    seg_aux = [jnp.asarray(full[k * m : (k + 1) * m]) for k in range(K)]

    def run_sim(p, **kws):
        return seg({**p, "ionic": ionic}, **kws)

    def seg_loss(traces, aux):
        return jnp.sum((traces - aux) ** 2)

    val, grads = host_segmented_value_and_grad(
        run_sim, p0, seg_loss, seg_aux, segment_ms=m * 0.1, states0=states0
    )

    def loss_ref(p):
        tr = mono({**p, "ionic": ionic})
        return jnp.sum((tr - jnp.asarray(full)) ** 2)

    val_ref, grad_ref = jax.value_and_grad(loss_ref)(p0)
    np.testing.assert_allclose(val, float(val_ref), rtol=1e-10)
    np.testing.assert_allclose(float(grads["gi"]), float(grad_ref["gi"]), rtol=1e-8)
    np.testing.assert_allclose(float(grads["ge"]), float(grad_ref["ge"]), rtol=1e-8)
