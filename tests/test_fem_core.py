"""Sanity tests of the FEM layer: geometry, assembly, quadrature, transfer."""

import jax.numpy as jnp
import numpy as np
import pytest

from fenicsx_beat_tpu import fem
from fenicsx_beat_tpu import mesh as meshmod


@pytest.mark.parametrize(
    "make_mesh, vol",
    [
        (lambda: meshmod.create_unit_interval(None, 7), 1.0),
        (lambda: meshmod.create_unit_square(None, 4, 5), 1.0),
        (lambda: meshmod.create_unit_cube(None, 2, 3, 2), 1.0),
        (lambda: meshmod.create_rectangle(None, ((0, 0), (2.0, 3.0)), (4, 4)), 6.0),
        (lambda: meshmod.create_box(None, ((0, 0, 0), (2.0, 1.0, 0.5)), (3, 2, 2)), 1.0),
    ],
)
def test_cell_volumes(make_mesh, vol):
    mesh = make_mesh()
    geom = fem.cell_geometry(mesh)
    assert np.isclose(geom.volume.sum(), vol)


def test_mass_matrix_total():
    mesh = meshmod.create_unit_square(None, 8, 8)
    V = fem.functionspace(mesh, ("P", 1))
    mass, stiff = fem.assemble_mass_stiffness(V, 1.0)
    ones = jnp.ones(V.ndofs)
    # 1^T M 1 = |domain| ; K @ constant = 0
    assert np.isclose(float(jnp.dot(ones, mass @ ones)), 1.0)
    assert np.allclose(np.asarray(stiff @ ones), 0.0, atol=1e-12)


def test_stiffness_poisson_energy():
    # For u = x, grad u = e_x: u^T K u = |domain| * M_xx
    mesh = meshmod.create_unit_square(None, 10, 10)
    V = fem.functionspace(mesh, ("P", 1))
    Mtensor = np.array([[2.0, 0.0], [0.0, 1.0]])
    _, stiff = fem.assemble_mass_stiffness(V, Mtensor)
    u = jnp.asarray(V.dof_coords[:, 0])
    assert np.isclose(float(jnp.dot(u, stiff @ u)), 2.0)
    v = jnp.asarray(V.dof_coords[:, 1])
    assert np.isclose(float(jnp.dot(v, stiff @ v)), 1.0)


def test_quadrature_exactness():
    from fenicsx_beat_tpu.ops.quadrature import simplex_rule

    # integrate x^a y^b over reference triangle: a! b! / (a+b+2)!
    import math

    for deg in (2, 4, 8):
        pts, w = simplex_rule(2, deg)
        for a, b in [(0, 0), (1, 1), (2, 1), (4, 4)]:
            if a + b > deg:
                continue
            exact = math.factorial(a) * math.factorial(b) / math.factorial(a + b + 2)
            approx = np.sum(w * pts[:, 0] ** a * pts[:, 1] ** b)
            assert np.isclose(approx, exact, rtol=1e-12), (deg, a, b)
    # tetrahedron: x^a y^b z^c -> a! b! c! / (a+b+c+3)!
    for deg in (2, 5):
        pts, w = simplex_rule(3, deg)
        for a, b, c in [(0, 0, 0), (1, 1, 1), (2, 1, 0)]:
            if a + b + c > deg:
                continue
            exact = (
                math.factorial(a)
                * math.factorial(b)
                * math.factorial(c)
                / math.factorial(a + b + c + 3)
            )
            approx = np.sum(w * pts[:, 0] ** a * pts[:, 1] ** b * pts[:, 2] ** c)
            assert np.isclose(approx, exact, rtol=1e-12), (deg, a, b, c)


def test_integral_form():
    mesh = meshmod.create_unit_square(None, 16, 16)
    form = fem.integral(mesh, lambda x: jnp.sin(jnp.pi * x[0]) * jnp.sin(jnp.pi * x[1]), degree=6)
    val = fem.assemble_scalar(form)
    assert np.isclose(val, (2 / np.pi) ** 2, rtol=1e-6)


def test_interpolate_and_evaluate():
    mesh = meshmod.create_unit_square(None, 6, 6)
    V = fem.functionspace(mesh, ("P", 1))
    f = fem.Function(V)
    f.interpolate(lambda x: 2 * x[0] + 3 * x[1])
    pts = np.array([[0.25, 0.5], [0.7, 0.1], [1.0, 1.0]])
    vals = fem.evaluate_function(f, pts)
    assert np.allclose(vals, 2 * pts[:, 0] + 3 * pts[:, 1])


@pytest.mark.parametrize("family,deg", [("P", 2), ("DG", 1), ("DG", 0)])
def test_transfer_roundtrip(family, deg):
    mesh = meshmod.create_unit_square(None, 5, 5)
    Vp = fem.functionspace(mesh, ("P", 1))
    Vo = fem.functionspace(mesh, (family, deg))
    src = fem.Function(Vp)
    src.interpolate(lambda x: x[0] + 2 * x[1])
    tgt = fem.Function(Vo)
    tgt.interpolate(src)  # P1 -> other
    if deg >= 1:
        # linear functions are reproduced exactly by P2/DG1
        assert np.allclose(np.asarray(tgt.x.array), Vo.dof_coords[:, 0] + 2 * Vo.dof_coords[:, 1])
        back = fem.Function(Vp)
        back.interpolate(tgt)
        assert np.allclose(back.x.array, src.x.array)


def test_p2_space_sizes():
    mesh = meshmod.create_unit_square(None, 4, 4)
    V2 = fem.functionspace(mesh, ("P", 2))
    n_edges = mesh.entities(1).shape[0]
    assert V2.ndofs == mesh.num_vertices + n_edges


def test_locate_entities_and_facets():
    mesh = meshmod.create_unit_square(None, 4, 4)
    cells = meshmod.locate_entities(mesh, 2, lambda x: np.logical_and(x[0] <= 0.5, x[1] <= 0.5))
    assert len(cells) == 8  # quarter of 32 triangles
    left = meshmod.locate_entities_boundary(mesh, 1, lambda x: x[0] <= 1e-12)
    assert len(left) == 4
    ext = mesh.exterior_facets()
    assert len(ext) == 16


def test_batched_det_inv_matches_lapack():
    """Closed-form cofactor det/inv (the LAPACK-batch replacement,
    fem.py::_batched_det_inv) must agree with np.linalg to fp accuracy."""
    rng = np.random.default_rng(7)
    for d in (1, 2, 3):
        E = rng.uniform(-2, 2, (50, d, d)) + 3 * np.eye(d)
        det, inv = fem._batched_det_inv(E)
        np.testing.assert_allclose(det, np.linalg.det(E), rtol=1e-10)
        np.testing.assert_allclose(inv, np.linalg.inv(E), rtol=1e-9, atol=1e-12)


def test_degenerate_cell_raises():
    """A zero-volume cell must fail loudly at setup (not NaN-poison the
    operators), matching the LinAlgError the LAPACK path raised."""
    from fenicsx_beat_tpu.geometry import get_2D_slab_mesh

    mesh = get_2D_slab_mesh(None, dx=0.5, Lx=2.0, Ly=2.0)
    coords = mesh.coords.copy()
    cells = mesh.cells
    coords[cells[0, 1]] = coords[cells[0, 0]]  # collapse one edge
    bad = meshmod.Mesh(coords=coords, cells=cells, cell_type=mesh.cell_type)
    with pytest.raises(np.linalg.LinAlgError):
        fem.cell_geometry(bad)


def test_operator_disk_cache_roundtrip(tmp_path, monkeypatch):
    """Opt-in assembly cache: exact round trip, and the fingerprint must
    distinguish conductivity tensors of identical shape."""
    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path))
    from fenicsx_beat_tpu.geometry import get_2D_slab_mesh

    mesh = get_2D_slab_mesh(None, dx=0.5, Lx=3.0, Ly=3.0)
    V = fem.functionspace(mesh, ("P", 1))
    m1, k1 = fem.assemble_mass_stiffness(V, 1.0, cache_key="t")
    m1b, k1b = fem.assemble_mass_stiffness(V, 1.0, cache_key="t")  # hit
    np.testing.assert_array_equal(np.asarray(k1.vals), np.asarray(k1b.vals))
    np.testing.assert_array_equal(np.asarray(m1.cols), np.asarray(m1b.cols))
    _, k2 = fem.assemble_mass_stiffness(V, 2.0, cache_key="t")  # miss
    assert not np.allclose(np.asarray(k1.vals), np.asarray(k2.vals))


def test_direct_stencil_assembly_matches_coo_pipeline():
    """assemble_mass_stiffness_stencil (sort-free, scalable path) must
    reproduce the generic COO->ELL->stencil pipeline exactly."""
    from fenicsx_beat_tpu.geometry import get_3D_slab_mesh
    from fenicsx_beat_tpu.ops.sparse import ell_to_stencil

    mesh = get_3D_slab_mesh(None, dx=0.5, Lx=4.0, Ly=3.0, Lz=2.0)
    V = fem.functionspace(mesh, ("P", 1))
    M = np.array([[0.3, 0.05, 0.0], [0.05, 0.2, 0.01], [0.0, 0.01, 0.1]])
    st = fem.assemble_mass_stiffness_stencil(V, M)
    assert st is not None
    mass_d, stiff_d = st
    mass_e, stiff_e = fem.assemble_mass_stiffness(V, M)
    mass_c, stiff_c = ell_to_stencil(mass_e), ell_to_stencil(stiff_e)
    assert mass_d.offsets == mass_c.offsets
    np.testing.assert_allclose(
        np.asarray(mass_d.vals), np.asarray(mass_c.vals), rtol=1e-12, atol=1e-14
    )
    np.testing.assert_allclose(
        np.asarray(stiff_d.vals), np.asarray(stiff_c.vals), rtol=1e-12, atol=1e-14
    )


def test_direct_stencil_assembly_declines_unstructured():
    """On meshes without a small global offset set it must return None
    (the generic pipeline then handles them)."""
    from fenicsx_beat_tpu.geometry import get_lv_ellipsoid_geometry

    geo = get_lv_ellipsoid_geometry(psize_ref=3.0)
    V = fem.functionspace(geo.mesh, ("P", 1))
    assert fem.assemble_mass_stiffness_stencil(V, 1.0, max_offsets=24) is None
