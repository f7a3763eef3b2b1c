"""Utils tests — mirror of reference ``tests/test_utils.py``:
expand_layer / expand_layer_biv marker placement probed at physical points."""

import numpy as np

import fenicsx_beat_tpu as beat
from fenicsx_beat_tpu import fem
from fenicsx_beat_tpu import mesh as meshmod


def test_expand_layer_single():
    N = 50
    mesh = meshmod.create_unit_square(None, N, N)

    endo_marker, epi_marker = 1, 2
    tol = 1.0e-8
    fdim = mesh.tdim - 1

    facets_endo = meshmod.locate_entities_boundary(mesh, fdim, lambda x: x[0] <= tol)
    facets_epi = meshmod.locate_entities_boundary(mesh, fdim, lambda x: x[0] >= 1 - tol)
    marked_facets = np.hstack([facets_endo, facets_epi])
    marked_values = np.hstack(
        [np.full(len(facets_endo), endo_marker), np.full(len(facets_epi), epi_marker)]
    )
    ft = meshmod.meshtags(mesh, fdim, marked_facets, marked_values)

    V = fem.functionspace(mesh, ("P", 1))
    output_mid_marker, output_endo_marker, output_epi_marker = 4, 3, 1
    markers = beat.utils.expand_layer(
        V=V,
        ft=ft,
        endo_marker=endo_marker,
        epi_marker=epi_marker,
        endo_size=0.3,
        epi_size=0.3,
        output_mid_marker=output_mid_marker,
        output_endo_marker=output_endo_marker,
        output_epi_marker=output_epi_marker,
    )

    points = np.array([(x, y) for x in [0.0, 0.1, 0.2] for y in [0.0, 0.5, 1.0]])

    endo = beat.utils.evaluate_function(markers, points)
    assert np.allclose(endo, output_endo_marker)

    mid = beat.utils.evaluate_function(markers, points + np.array([0.4, 0.0]))
    assert np.allclose(mid, output_mid_marker)

    epi = beat.utils.evaluate_function(markers, points + np.array([0.8, 0.0]))
    assert np.allclose(epi, output_epi_marker)


def test_expand_layer_biv():
    N = 50
    mesh = meshmod.create_unit_square(None, N, N)

    endo_lv_marker, endo_rv_marker, epi_marker = 1, 2, 3
    tol = 1.0e-10
    fdim = mesh.tdim - 1

    facets_lv_endo = meshmod.locate_entities_boundary(
        mesh, fdim, lambda x: np.logical_and(x[1] <= tol, x[0] <= 0.5 + tol)
    )
    facets_rv_endo = meshmod.locate_entities_boundary(
        mesh, fdim, lambda x: np.logical_and(x[1] >= 1 - tol, x[0] <= 0.5 + tol)
    )
    facets_epi = meshmod.locate_entities_boundary(mesh, fdim, lambda x: x[0] >= 1 - tol)

    marked_facets = np.hstack([facets_lv_endo, facets_rv_endo, facets_epi])
    marked_values = np.hstack(
        [
            np.full(len(facets_lv_endo), endo_lv_marker),
            np.full(len(facets_rv_endo), endo_rv_marker),
            np.full(len(facets_epi), epi_marker),
        ]
    )
    ft = meshmod.meshtags(mesh, fdim, marked_facets, marked_values)

    V = fem.functionspace(mesh, ("P", 1))
    output_mid_marker, output_endo_marker, output_epi_marker = 4, 3, 1
    markers = beat.utils.expand_layer_biv(
        V=V,
        ft=ft,
        endo_lv_marker=endo_lv_marker,
        endo_rv_marker=endo_rv_marker,
        epi_marker=epi_marker,
        endo_size=0.3,
        epi_size=0.3,
        output_mid_marker=output_mid_marker,
        output_endo_marker=output_endo_marker,
        output_epi_marker=output_epi_marker,
    )

    endo_points = np.array([(0.0, 0.0), (0.0, 1.0), (0.2, 0.2), (0.2, 0.8)])
    mid_points = np.array(
        [(0.5 + i, 0.5 + j) for i in [-0.1, 0.0, 0.1] for j in [-0.1, 0.0, 0.1]] + [(0.0, 0.5)]
    )
    epi_points = np.array([(1.0, 0.0), (1.0, 1.0), (0.8, 0.2), (0.8, 0.8)])

    endo = beat.utils.evaluate_function(markers, endo_points)
    assert np.allclose(endo, output_endo_marker)

    mid = beat.utils.evaluate_function(markers, mid_points)
    assert np.allclose(mid, output_mid_marker)

    epi = beat.utils.evaluate_function(markers, epi_points)
    assert np.allclose(epi, output_epi_marker)


def test_space_from_string():
    mesh = meshmod.create_unit_square(None, 3, 3)
    for s, ndofs in [
        ("Lagrange_1", mesh.num_vertices),
        ("P_1", mesh.num_vertices),
        ("CG_1", mesh.num_vertices),
        ("DG_1", mesh.num_cells * 3),
    ]:
        V = beat.utils.space_from_string(s, mesh, dim=1)
        assert V.ndofs == ndofs

    import pytest

    with pytest.raises(ValueError, match="Unknown element family"):
        beat.utils.parse_element("Bogus_1", mesh, 1)


def test_local_project_same_space():
    mesh = meshmod.create_unit_square(None, 3, 3)
    V = fem.functionspace(mesh, ("P", 1))
    v = fem.Function(V)
    v.x.array[:] = 7.0
    u = beat.utils.local_project(v, V)
    assert np.allclose(u.x.array, 7.0)
