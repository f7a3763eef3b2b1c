"""Stimulus tests — mirror of reference ``tests/test_stimulation.py``:
exact integration with M=0, effective dims, measures, unit conversions,
random activation windows."""

import numpy as np
import pytest

import fenicsx_beat_tpu as beat
from fenicsx_beat_tpu import fem
from fenicsx_beat_tpu import mesh as meshmod
from fenicsx_beat_tpu.units import ureg


def test_single_stimulation():
    mesh = meshmod.create_unit_interval(None, 10)
    value = 2.0
    end = 1.0
    start = 0.5
    dt = 0.01
    time = fem.Constant(0.0)

    expr = beat.stimulation.TimeWindow(amplitude=value, start=start, duration=end - start)
    I_s = beat.stimulation.Stimulus(dZ=beat.stimulation.dx(mesh), expr=expr)

    pde = beat.MonodomainModel(time=time, mesh=mesh, M=0.0, I_s=I_s)

    pde.step((0.0, 0.4))
    assert np.allclose(pde.state.x.array, 0.0)

    t0 = 0.9
    stim_t0 = value * (t0 - start)
    pde.solve((0.4, t0), dt=dt)
    assert np.allclose(pde.state.x.array, stim_t0)

    pde.solve((t0, end + dt), dt=dt)
    assert np.allclose(pde.state.x.array, (end - start - dt) * value)

    pde.solve((end + dt, 2 * end), dt=dt)
    assert np.allclose(pde.state.x.array, (end - start - dt) * value)


def test_double_stimulation():
    mesh = meshmod.create_unit_interval(None, 10)
    dt = 0.01
    value1, value2 = 2.0, 3.0
    start1, end1 = 0.5, 1.0
    start2, end2 = 0.9, 1.5

    time = fem.Constant(0.0)
    expr1 = beat.stimulation.TimeWindow(amplitude=value1, start=start1, duration=end1 - start1)
    expr2 = beat.stimulation.TimeWindow(amplitude=value2, start=start2, duration=end2 - start2)
    dxm = beat.stimulation.dx(mesh)
    I_s = [
        beat.stimulation.Stimulus(dZ=dxm, expr=expr1),
        beat.stimulation.Stimulus(dZ=dxm, expr=expr2),
    ]

    pde = beat.MonodomainModel(time=time, mesh=mesh, M=0.0, I_s=I_s)

    pde.step((0.0, 0.4))
    assert np.allclose(pde.state.x.array, 0.0)

    t0 = 0.9
    stim_t0 = value1 * (t0 - start1)
    pde.solve((0.4, t0), dt=dt)
    assert np.allclose(pde.state.x.array, stim_t0)

    pde.solve((t0, end1 + dt), dt=dt)
    assert np.allclose(
        pde.state.x.array,
        (end1 - start1 - dt) * value1 + (end1 + dt - start2) * value2,
    )

    pde.solve((end1 + dt, end2 + dt), dt=dt)
    assert np.allclose(
        pde.state.x.array,
        (end1 - start1 - dt) * value1 + (end2 - start2 - dt) * value2,
    )

    pde.solve((end2 + dt, 2 * end2), dt=dt)
    assert np.allclose(
        pde.state.x.array,
        (end1 - start1 - dt) * value1 + (end2 - start2 - dt) * value2,
    )


@pytest.mark.parametrize("subdomain_dim", [0, 1, 2, 3])
def test_effective_dim_3D(subdomain_dim):
    mesh = meshmod.create_unit_cube(None, 2, 2, 2)
    entities = meshmod.locate_entities(mesh, subdomain_dim, lambda x: np.full(x.shape[1], True))
    subdomain_data = meshmod.meshtags(mesh, subdomain_dim, entities, 1)
    assert beat.stimulation.compute_effective_dim(mesh, subdomain_data) == subdomain_dim


@pytest.mark.parametrize("subdomain_dim", [0, 1, 2])
def test_effective_dim_2D(subdomain_dim):
    mesh = meshmod.create_unit_square(None, 2, 2)
    entities = meshmod.locate_entities(mesh, subdomain_dim, lambda x: np.full(x.shape[1], True))
    subdomain_data = meshmod.meshtags(mesh, subdomain_dim, entities, 1)
    assert beat.stimulation.compute_effective_dim(mesh, subdomain_data) == subdomain_dim + 1


@pytest.mark.parametrize("subdomain_dim", [0, 1])
def test_effective_dim_1D(subdomain_dim):
    mesh = meshmod.create_unit_interval(None, 2)
    entities = meshmod.locate_entities(mesh, subdomain_dim, lambda x: np.full(x.shape[1], True))
    subdomain_data = meshmod.meshtags(mesh, subdomain_dim, entities, 1)
    assert beat.stimulation.compute_effective_dim(mesh, subdomain_data) == subdomain_dim + 2


@pytest.mark.parametrize("subdomain_dim, integral_type", [(1, "exterior_facet"), (2, "cell")])
def test_get_dZ_2D(subdomain_dim, integral_type):
    mesh = meshmod.create_unit_square(None, 2, 2)
    cells = meshmod.locate_entities(
        mesh, subdomain_dim, lambda x: np.logical_and(x[0] <= 0.5, x[1] <= 0.5)
    )
    stim_tags = meshmod.meshtags(mesh, subdomain_dim, cells, 1)
    dZ = beat.stimulation.get_dZ(mesh, stim_tags)
    assert isinstance(dZ, beat.stimulation.Measure)
    assert dZ.integral_type() == integral_type


@pytest.mark.parametrize("subdomain_dim, integral_type", [(2, "exterior_facet"), (3, "cell")])
def test_get_dZ_3D(subdomain_dim, integral_type):
    mesh = meshmod.create_unit_cube(None, 2, 2, 2)
    cells = meshmod.locate_entities(
        mesh, subdomain_dim, lambda x: np.logical_and(x[0] <= 0.5, x[1] <= 0.5)
    )
    stim_tags = meshmod.meshtags(mesh, subdomain_dim, cells, 1)
    dZ = beat.stimulation.get_dZ(mesh, stim_tags)
    assert dZ.integral_type() == integral_type


@pytest.mark.parametrize(
    "effective_dim, mesh_unit, expected_unit",
    [
        (0, "cm", "uA"),
        (1, "cm", "uA"),
        (2, "cm", "uA/cm"),
        (3, "cm", "uA/cm**2"),
        (0, "m", "uA"),
        (1, "m", "uA"),
        (2, "m", "uA/m"),
    ],
)
def test_compute_stimulus_unit(effective_dim, mesh_unit, expected_unit):
    assert beat.stimulation.compute_stimulus_unit(effective_dim, mesh_unit) == ureg(expected_unit)


@pytest.mark.parametrize(
    "value, mesh_unit, expected_value",
    [
        (1.0, "cm", 1.0 * ureg("cm**-1")),
        (2.0 * ureg("mm**-1"), "cm", 2.0 * ureg("mm**-1")),
    ],
)
def test_convert_chi(value, mesh_unit, expected_value):
    assert beat.stimulation.convert_chi(value, mesh_unit) == expected_value


@pytest.mark.parametrize(
    "effective_dim, amplitude, expected_value",
    [
        (1, 2.0, 2.0 * ureg("uA / cm")),
        (2, 2.0, 2.0 * ureg("uA / cm**2")),
        (3, 2.0, 2.0 * ureg("uA / cm**3")),
    ],
)
def test_convert_amplitude(effective_dim, amplitude, expected_value):
    assert beat.stimulation.convert_amplitude(effective_dim, amplitude) == expected_value


def test_define_stimulus():
    mesh = meshmod.create_unit_square(None, 2, 2)
    cells = meshmod.locate_entities(mesh, mesh.tdim, lambda x: np.full(x.shape[1], True))
    stim_marker = 1
    stim_tags = meshmod.meshtags(mesh, mesh.tdim, cells, stim_marker)

    time = fem.Constant(0.0)
    start, duration, amplitude, chi = 1.0, 2.0, 3.0, 2.0
    stimulus = beat.stimulation.define_stimulus(
        mesh=mesh,
        chi=chi,
        time=time,
        amplitude=amplitude,
        start=start,
        duration=duration,
        mesh_unit="cm",
        marker=stim_marker,
        subdomain_data=stim_tags,
    )
    assert stimulus.marker == stim_marker

    V = fem.functionspace(mesh, ("P", 1))
    quad = fem.cell_quadrature(V, stimulus.dz.entities(), degree=2)

    def stim_integral(t):
        return float(quad.integrate(lambda x: stimulus.expr(x, t)))

    assert np.isclose(stim_integral(0.0), 0.0)
    assert np.isclose(stim_integral(start), amplitude / chi)
    assert np.isclose(stim_integral(start + duration / 2), amplitude / chi)
    assert np.isclose(stim_integral(start + duration + 1e-6), 0.0)


def test_generate_random_activation():
    """Spatial and temporal activation logic (mirrors reference
    ``tests/test_stimulation.py:307-374``)."""
    domain = meshmod.create_unit_cube(None, 4, 4, 4)
    t = fem.Constant(0.0)

    points = np.array([[0.5, 0.5, 0.5], [1.0, 1.0, 1.0]])
    delays = np.array([1.0, 3.0])
    stim_amplitude = 5.0
    tol = 0.2

    stim_expr = beat.stimulation.generate_random_activation(
        mesh=domain,
        time=t,
        points=points,
        delays=delays,
        stim_start=0.0,
        stim_duration=1.0,
        stim_amplitude=stim_amplitude,
        tol=tol,
    )

    V = fem.functionspace(domain, ("DG", 0))
    stim_func = fem.Function(V)

    def interp(tval):
        stim_func.interpolate(lambda x: np.asarray(stim_expr(x, tval)))

    interp(0.5)
    assert np.allclose(stim_func.x.array, 0.0)

    interp(1.5)
    assert np.max(stim_func.x.array) == pytest.approx(stim_amplitude)
    assert np.min(stim_func.x.array) == pytest.approx(0.0)

    interp(2.5)
    assert np.allclose(stim_func.x.array, 0.0)

    interp(3.5)
    assert np.max(stim_func.x.array) == pytest.approx(stim_amplitude)

    interp(4.5)
    assert np.allclose(stim_func.x.array, 0.0)


def test_generate_random_activation_assertion():
    domain = meshmod.create_unit_cube(None, 1, 1, 1)
    t = fem.Constant(0.0)
    points = np.array([[0.5, 0.5, 0.5], [1.0, 1.0, 1.0]])
    delays = np.array([1.0])
    with pytest.raises(AssertionError, match="Points and delays must have the same length"):
        beat.stimulation.generate_random_activation(domain, t, points, delays)


def test_generate_random_activation_many_points():
    """1500 points must evaluate without recursion issues (the reference
    needed a balanced UFL tree for this, ``stimulation.py:356-362``; the
    data-driven formulation here is flat by construction)."""
    import sys

    sys.setrecursionlimit(1000)
    mesh = meshmod.create_unit_cube(None, 2, 2, 2)
    time = fem.Constant(0.0)
    num_points = 1500
    rng = np.random.default_rng(0)
    points = rng.random((num_points, 3))
    delays = rng.random(num_points)
    expr = beat.stimulation.generate_random_activation(
        mesh=mesh, time=time, points=points, delays=delays, tol=1e-12
    )
    x = np.zeros((3, 5))
    out = np.asarray(expr(x, 0.5))
    assert out.shape == (5,)


def test_facet_stimulus_integration():
    """ds-measure stimulus: integral over the left boundary edge of the
    unit square equals amplitude * edge length."""
    mesh = meshmod.create_unit_square(None, 4, 4)
    facets = meshmod.locate_entities_boundary(mesh, 1, lambda x: x[0] <= 1e-12)
    tags = meshmod.meshtags(mesh, 1, facets, 7)
    dZ = beat.stimulation.get_dZ(mesh, tags)
    assert dZ.integral_type() == "exterior_facet"

    V = fem.functionspace(mesh, ("P", 1))
    quad = fem.facet_quadrature(V, dZ(7).entities(), degree=2)
    val = float(quad.integrate(lambda x: 3.0 * np.ones(1) * (1 + 0 * x[0])))
    assert np.isclose(val, 3.0)


def test_stimulus_assign_takes_effect():
    """Stimulus.assign must change the injected current on subsequent steps
    (reference ``stimulation.py:23-24``; S1-S2 protocols rely on it)."""
    import fenicsx_beat_tpu as beat
    from fenicsx_beat_tpu import fem
    from fenicsx_beat_tpu import mesh as meshmod

    mesh = meshmod.create_unit_square(None, 8, 8)
    cells = meshmod.locate_entities(mesh, 2, lambda x: np.ones(x.shape[1], dtype=bool))
    tags = meshmod.meshtags(mesh, 2, cells, 1)
    dxm = beat.stimulation.dx(mesh, subdomain_data=tags)
    stim = beat.Stimulus(
        expr=beat.stimulation.TimeWindow(amplitude=10.0, start=0.0, duration=100.0),
        dZ=dxm,
        marker=1,
    )
    model = beat.MonodomainModel(time=fem.Constant(0.0), mesh=mesh, M=0.0, I_s=stim, dx=dxm)

    # with M=0 each step adds exactly dt*amplitude to v
    model.step((0.0, 1.0))
    total1 = fem.assemble_scalar(fem.function_integral(model.state, lambda x, u: u))
    assert np.isclose(total1, 10.0, rtol=1e-6)

    model.assign_previous()
    stim.assign(3.0)
    model.step((1.0, 2.0))
    total2 = fem.assemble_scalar(fem.function_integral(model.state, lambda x, u: u))
    assert np.isclose(total2 - total1, 3.0, rtol=1e-6), "assign was a no-op"

    # fused solver: assign takes effect at the next chunk
    from fenicsx_beat_tpu.fused import FusedMonodomainSolver
    from fenicsx_beat_tpu.models import fitzhughnagumo as fhn

    solver = FusedMonodomainSolver(
        mesh=mesh,
        M=0.001,
        ode_fun=fhn.forward_euler,
        init_states=fhn.init_state_values(),
        parameters=fhn.init_parameter_values(stim_amplitude=0.0),
        v_index=fhn.state_index("v"),
        I_s=stim,
    )
    import copy

    stim.assign(10.0)
    kept = FusedMonodomainSolver(
        mesh=mesh,
        M=0.001,
        ode_fun=fhn.forward_euler,
        init_states=fhn.init_state_values(),
        parameters=fhn.init_parameter_values(stim_amplitude=0.0),
        v_index=fhn.state_index("v"),
        I_s=beat.Stimulus(
            expr=beat.stimulation.TimeWindow(amplitude=10.0, start=0.0, duration=100.0),
            dZ=dxm,
            marker=1,
        ),
    )
    solver.solve((0.0, 1.0), dt=0.05)
    kept.solve((0.0, 1.0), dt=0.05)
    stim.assign(0.0)  # switch the shared stimulus off for `solver` only
    solver.solve((1.0, 3.0), dt=0.05)
    kept.solve((1.0, 3.0), dt=0.05)
    v_off = float(np.asarray(solver.v).max())
    v_on = float(np.asarray(kept.v).max())
    assert v_on - v_off > 1.0, "fused solver ignored Stimulus.assign"


def test_stimulus_assign_chunk_boundary_semantics():
    """PIN: on the fused path, Stimulus.assign takes effect at the NEXT
    chunk boundary (amplitudes are per-chunk traced arguments), not
    mid-chunk — see PARITY.md 'Known semantic deltas'. An assign issued
    from a save_callback at t=1.0 must produce exactly the trajectory of
    separate solves switching amplitude at t=1.0."""
    import fenicsx_beat_tpu as beat
    from fenicsx_beat_tpu import fem
    from fenicsx_beat_tpu import mesh as meshmod
    from fenicsx_beat_tpu.fused import FusedMonodomainSolver
    from fenicsx_beat_tpu.models import fitzhughnagumo as fhn

    mesh = meshmod.create_unit_square(None, 8, 8)
    cells = meshmod.locate_entities(mesh, 2, lambda x: np.ones(x.shape[1], dtype=bool))
    tags = meshmod.meshtags(mesh, 2, cells, 1)
    dxm = beat.stimulation.dx(mesh, subdomain_data=tags)

    def build(stim):
        return FusedMonodomainSolver(
            mesh=mesh,
            M=0.001,
            ode_fun=fhn.forward_euler,
            init_states=fhn.init_state_values(),
            parameters=fhn.init_parameter_values(stim_amplitude=0.0),
            v_index=fhn.state_index("v"),
            I_s=stim,
        )

    def window(amp):
        return beat.Stimulus(
            expr=beat.stimulation.TimeWindow(amplitude=amp, start=0.0, duration=100.0),
            dZ=dxm,
            marker=1,
        )

    # A: assign(0) from the save_callback fired at the t=1.0 chunk boundary
    stim_a = window(10.0)
    a = build(stim_a)

    def cb(t, v):
        if t >= 1.0 - 1e-9:
            stim_a.assign(0.0)

    a.solve((0.0, 2.0), dt=0.05, save_freq=20, save_callback=cb)  # 1.0ms chunks

    # B: explicit separate solves switching at exactly t=1.0
    stim_b = window(10.0)
    b = build(stim_b)
    b.solve((0.0, 1.0), dt=0.05)
    stim_b.assign(0.0)
    b.solve((1.0, 2.0), dt=0.05)

    np.testing.assert_allclose(np.asarray(a.v), np.asarray(b.v), atol=1e-12)
