"""Monodomain PDE MMS tests — mirror of reference ``tests/test_monodomain.py``.

Manufactured solution v = cos(2 pi x) cos(2 pi y) sin(t) with matching
source; L2 error thresholds, spatial order >= 2 and temporal order >= 2
(Crank-Nicolson).  Derivations and threshold rationale: ``tests/README.md``
in this repo (counterpart of the reference's ``tests/README.md:5-93``).
"""

import jax.numpy as jnp
import numpy as np
import pytest

import fenicsx_beat_tpu as beat
from fenicsx_beat_tpu import fem
from fenicsx_beat_tpu import mesh as meshmod


def _l2_error(state, exact_fn, T):
    form = fem.function_integral(
        state, lambda x, u: (u - exact_fn(x, T)) ** 2, degree=8
    )
    return np.sqrt(fem.assemble_scalar(form))


@pytest.mark.parametrize(
    "M, ac_str, err",
    (
        (
            0.0,
            lambda x, t: jnp.cos(2 * jnp.pi * x[0]) * jnp.cos(2 * jnp.pi * x[1]) * jnp.cos(t),
            1e-4,
        ),
        (
            1.0,
            lambda x, t: jnp.cos(2 * jnp.pi * x[0])
            * jnp.cos(2 * jnp.pi * x[1])
            * (jnp.cos(t) + 8 * jnp.pi**2 * jnp.sin(t)),
            2e-4,
        ),
        (
            2.0,
            lambda x, t: jnp.cos(2 * jnp.pi * x[0])
            * jnp.cos(2 * jnp.pi * x[1])
            * (jnp.cos(t) + 16 * jnp.pi**2 * jnp.sin(t)),
            2e-4,
        ),
    ),
)
def test_monodomain_analytic(M, ac_str, err):
    N = 15
    theta = 0.5
    dt = 0.001
    T = 10 * dt

    params = dict(theta=theta, linear_solver_type="direct")
    mesh = meshmod.create_unit_square(None, N, N)
    time = fem.Constant(0.0)

    exact = lambda x, t: jnp.cos(2 * jnp.pi * x[0]) * jnp.cos(2 * jnp.pi * x[1]) * jnp.sin(t)

    model = beat.MonodomainModel(time=time, mesh=mesh, M=M, I_s=ac_str, params=params)
    res = model.solve((0, T), dt=dt)

    v_error = _l2_error(res.state, exact, T)
    assert v_error < err


def test_monodomain_spatial_convergence():
    Ns = [2**level for level in (2, 3, 4, 5)]
    errors = []
    theta = 0.5
    dt = 0.001
    T = 10 * dt
    params = dict(theta=theta, linear_solver_type="direct")

    ac = lambda x, t: (
        jnp.cos(2 * jnp.pi * x[0])
        * jnp.cos(2 * jnp.pi * x[1])
        * (jnp.cos(t) + 8 * jnp.pi**2 * jnp.sin(t))
    )
    exact = lambda x, t: jnp.cos(2 * jnp.pi * x[0]) * jnp.cos(2 * jnp.pi * x[1]) * jnp.sin(t)

    for N in Ns:
        mesh = meshmod.create_unit_square(None, N, N)
        time = fem.Constant(0.0)
        model = beat.MonodomainModel(time=time, mesh=mesh, M=1.0, I_s=ac, params=params)
        res = model.solve((0, T), dt=dt)
        errors.append(_l2_error(res.state, exact, T))

    rates = [np.log(e1 / e2) / np.log(2) for e1, e2 in zip(errors[:-1], errors[1:])]
    assert all(rate >= 2.0 for rate in rates), (rates, errors)


def test_monodomain_temporal_convergence():
    theta = 0.5
    T = 1.0
    N = 100
    params = dict(theta=theta, linear_solver_type="direct")
    mesh = meshmod.create_unit_square(None, N, N)

    ac = lambda x, t: (
        jnp.cos(2 * jnp.pi * x[0])
        * jnp.cos(2 * jnp.pi * x[1])
        * (jnp.cos(t) + 8 * jnp.pi**2 * jnp.sin(t))
    )
    exact = lambda x, t: jnp.cos(2 * jnp.pi * x[0]) * jnp.cos(2 * jnp.pi * x[1]) * jnp.sin(t)

    errors = []
    dts = [1.0 / (2**level) for level in (0, 1, 2, 3)]
    for dt in dts:
        time = fem.Constant(0.0)
        model = beat.MonodomainModel(time=time, mesh=mesh, M=1.0, I_s=ac, params=params)
        res = model.solve((0, T), dt=dt)
        errors.append(_l2_error(res.state, exact, T))

    rates = [np.log(e1 / e2) / np.log(2) for e1, e2 in zip(errors[:-1], errors[1:])]
    assert all(rate >= 2.0 for rate in rates), (rates, errors)


@pytest.mark.parametrize(
    "degree,min_rate,Ns,params",
    [
        (2, 2.7, (4, 8, 16), {"degree": 2}),
        # higher degrees: order p+1 (the reference accepts any Lagrange
        # degree via Basix, base_model.py:158-168); P4 needs a load
        # quadrature beyond the default to see its order
        (3, 3.7, (2, 4, 8), {"degree": 3}),
        (4, 4.2, (2, 4, 8), {"degree": 4, "quadrature_degree": 10}),
    ],
)
def test_monodomain_higher_degree_spatial_convergence(degree, min_rate, Ns, params):
    """Higher-degree PDE state spaces (the reference's ``degree``
    parameter, base_model.py:158-168): L2 convergence at order p+1."""
    dt = 1e-3
    T = 0.05
    errors = []
    for N in Ns:
        mesh = meshmod.create_unit_square(None, N, N)
        time = fem.Constant(0.0)
        model = beat.MonodomainModel(
            time=time,
            mesh=mesh,
            M=1.0,
            I_s=lambda x, t: jnp.cos(2 * jnp.pi * x[0])
            * jnp.cos(2 * jnp.pi * x[1])
            * (jnp.cos(t) + 8 * jnp.pi**2 * jnp.sin(t)),
            params=params,
        )
        res = model.solve((0.0, T), dt=dt)
        exact = lambda x, t: jnp.cos(2 * jnp.pi * x[0]) * jnp.cos(2 * jnp.pi * x[1]) * jnp.sin(t)
        errors.append(_l2_error(res.state, exact, T))
    rates = [np.log2(e1 / e2) for e1, e2 in zip(errors[:-1], errors[1:])]
    assert sum(rates) / len(rates) > min_rate, (rates, errors)


def test_solve_returns_not_converging_when_cg_capped():
    """ksp_max_it=1 starves the CG; BaseModel.solve must surface it as
    Status.NOT_CONVERGING (reference plumbs the KSP converged_reason,
    base_model.py:23-25 there)."""
    mesh = meshmod.create_unit_square(None, 8, 8)
    time = fem.Constant(0.0)
    model = beat.MonodomainModel(
        time=time,
        mesh=mesh,
        M=1.0,
        I_s=lambda x, t: jnp.ones_like(x[0]),
        params={
            "petsc_options": {"ksp_rtol": 1e-14, "ksp_atol": 1e-16, "ksp_max_it": 1}
        },
    )
    res = model.solve((0.0, 0.2), dt=0.1)
    assert res.status == beat.base_model.Status.NOT_CONVERGING

    healthy = beat.MonodomainModel(
        time=fem.Constant(0.0),
        mesh=mesh,
        M=1.0,
        I_s=lambda x, t: jnp.ones_like(x[0]),
    )
    assert healthy.solve((0.0, 0.2), dt=0.1).status == beat.base_model.Status.OK


@pytest.mark.parametrize("degree", [2, 3, 4])
def test_facet_quadrature_higher_degree(degree):
    """Facet ("ds") quadrature beyond P1: boundary loads integrate exactly
    and facet interpolation of a degree-p FE function is exact (reference
    gets facet integrals of any degree from Basix/FFCx)."""
    for mesh in (
        meshmod.create_unit_square(None, 4, 4),
        meshmod.create_unit_cube(None, 2, 2, 2),
    ):
        facets = mesh.exterior_facets()
        V = fem.functionspace(mesh, ("P", degree))
        quad = fem.facet_quadrature(V, facets, degree=2 * degree + 2)
        b = quad.assemble_load(lambda x, t: jnp.ones_like(x[0]), 0.0)
        expected = 4.0 if mesh.tdim == 2 else 6.0
        np.testing.assert_allclose(float(jnp.sum(b)), expected, rtol=1e-12)

        u = fem.Function(V)
        c = V.tabulate_dof_coordinates()
        u.x.array[:] = (1 + c[:, 0]) * c[:, 1] + c[:, 0] ** min(degree, 3)
        vals = np.asarray(quad.interpolate(jnp.asarray(u.x.array)))
        X = np.asarray(quad.X)
        flat = X.reshape(-1, X.shape[-1])
        exact = ((1 + flat[:, 0]) * flat[:, 1] + flat[:, 0] ** min(degree, 3)).reshape(
            vals.shape
        )
        np.testing.assert_allclose(vals, exact, atol=1e-10)
