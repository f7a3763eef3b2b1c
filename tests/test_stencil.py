"""Stencil (fixed-offset) SpMV: equivalence with ELL and solver integration."""

import numpy as np
import jax.numpy as jnp
import pytest

from fenicsx_beat_tpu import fem
from fenicsx_beat_tpu import mesh as meshmod
from fenicsx_beat_tpu.geometry import get_3D_slab_geometry
from fenicsx_beat_tpu.ops.sparse import StencilMatrix, ell_to_stencil


@pytest.mark.parametrize(
    "make_mesh",
    [
        lambda: meshmod.create_interval(None, 40),
        lambda: meshmod.create_unit_square(None, 9, 5),
        lambda: get_3D_slab_geometry(None, dx=1.0, Lx=8.0, Ly=4.0, Lz=2.0).mesh,
    ],
    ids=["interval", "square", "slab3d"],
)
def test_stencil_matches_ell(make_mesh):
    mesh = make_mesh()
    V = fem.functionspace(mesh, ("P", 1))
    mass, stiff = fem.assemble_mass_stiffness(V, 1.0)
    for A in (mass, stiff):
        st = ell_to_stencil(A)
        assert st is not None
        x = jnp.asarray(np.random.default_rng(0).standard_normal(V.ndofs))
        np.testing.assert_allclose(np.asarray(A @ x), np.asarray(st @ x), atol=1e-12)
        np.testing.assert_allclose(
            np.asarray(A.diagonal()), np.asarray(st.diagonal()), atol=1e-12
        )
    # mass and stiffness share the offset set (combined value-wise on device)
    assert ell_to_stencil(mass).offsets == ell_to_stencil(stiff).offsets


def test_stencil_with_values_combination():
    mesh = meshmod.create_unit_square(None, 6, 6)
    V = fem.functionspace(mesh, ("P", 1))
    mass, stiff = fem.assemble_mass_stiffness(V, 1.0)
    m_st, k_st = ell_to_stencil(mass), ell_to_stencil(stiff)
    A_ell = mass.with_values(2.0 * mass.vals + 0.3 * stiff.vals)
    A_st = m_st.with_values(2.0 * m_st.vals + 0.3 * k_st.vals)
    x = jnp.asarray(np.random.default_rng(1).standard_normal(V.ndofs))
    np.testing.assert_allclose(np.asarray(A_ell @ x), np.asarray(A_st @ x), atol=1e-12)


def test_fused_solver_uses_stencil():
    from fenicsx_beat_tpu.fused import FusedMonodomainSolver
    from fenicsx_beat_tpu.models import fitzhughnagumo as fhn

    mesh = meshmod.create_unit_square(None, 8, 8)
    solver = FusedMonodomainSolver(
        mesh=mesh,
        M=0.001,
        ode_fun=fhn.forward_euler_jax
        if hasattr(fhn, "forward_euler_jax")
        else fhn.forward_euler,
        init_states=fhn.init_state_values(),
        parameters=fhn.init_parameter_values(stim_amplitude=0.0),
        v_index=fhn.state_index("v"),
    )
    assert isinstance(solver._mass, StencilMatrix)
    solver.solve((0.0, 1.0), dt=0.05)
    assert np.isfinite(np.asarray(solver.v)).all()


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_pallas_spmv_random_offsets(seed):
    """Interpret-mode pallas stencil SpMV vs the XLA StencilMatrix over
    random offset sets (exercises the sublane/lane roll + carry-select
    decomposition for arbitrary shifts)."""
    import jax.numpy as jnp

    from fenicsx_beat_tpu.ops.pallas_spmv import build_pallas_stencil_spmv

    rng = np.random.default_rng(seed)
    n = int(rng.integers(300, 3000))
    K = int(rng.integers(3, 12))
    offs = np.unique(
        np.concatenate([[0], rng.integers(-(n // 3), n // 3, K)])
    )
    vals = rng.standard_normal((n, offs.size))
    # zero out entries whose column would fall outside [0, n)
    rows = np.arange(n)[:, None]
    cols = rows + offs[None, :]
    vals[(cols < 0) | (cols >= n)] = 0.0

    st = StencilMatrix(offsets=tuple(int(d) for d in offs), vals=jnp.asarray(vals), shape=(n, n))
    spmv = build_pallas_stencil_spmv(st.offsets, n, jnp.float64, interpret=True)
    vals3 = spmv.pack_values(vals)
    x = jnp.asarray(rng.standard_normal(n))
    np.testing.assert_allclose(
        np.asarray(spmv(vals3, x)), np.asarray(st @ x), rtol=1e-12, atol=1e-12
    )


def test_pallas_symmetric_spmv_fuzz():
    """Symmetric-stream kernel (d>=0 columns only) vs dense reference over
    random symmetric stencils — lane-only, row-carry, and slab-like offset
    sets, with and without the fused pAp dot."""
    import jax.numpy as jnp

    from fenicsx_beat_tpu.ops.pallas_spmv import (
        build_pallas_stencil_spmv_sym,
        stencil_is_symmetric,
    )

    rng = np.random.default_rng(7)
    for offsets, n in [
        ((-5, -1, 0, 1, 5), 900),
        ((-129, -128, -1, 0, 1, 128, 129), 2500),
        ((-300, -128, -70, 0, 70, 128, 300), 9000),
    ]:
        vals = np.zeros((n, len(offsets)))
        for k, d in enumerate(offsets):
            if d < 0:
                continue
            col = rng.standard_normal(n)
            if d > 0:
                col[n - d:] = 0.0
            vals[:, k] = col
            if d > 0:
                vals[d:, offsets.index(-d)] = col[: n - d]
        assert stencil_is_symmetric(offsets, vals)
        x = rng.standard_normal(n)
        sym = build_pallas_stencil_spmv_sym(offsets, n, np.float64, interpret=True)
        packed = sym.pack_values(vals)
        y_ref = np.zeros(n)
        for k, d in enumerate(offsets):
            src = np.zeros(n)
            if d >= 0:
                src[: n - d if d else n] = x[d:]
            else:
                src[-d:] = x[: n + d]
            y_ref += vals[:, k] * src
        y = np.asarray(sym(packed, jnp.asarray(x)))
        np.testing.assert_allclose(y, y_ref, rtol=1e-12, atol=1e-12)
        y2, dot = sym.spmv_dot(packed, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(y2), y_ref, rtol=1e-12, atol=1e-12)
        np.testing.assert_allclose(float(dot), float(x @ y_ref), rtol=1e-10)


def test_streamed_spmv_matches_base():
    """HBM-streamed windowed SpMV (for operands beyond VMEM) must be
    bit-compatible with the VMEM-resident kernel and the dense result."""
    import numpy as np
    import jax.numpy as jnp

    from fenicsx_beat_tpu.ops.pallas_spmv import (
        build_pallas_stencil_spmv,
        build_pallas_stencil_spmv_streamed,
    )

    rng = np.random.default_rng(11)
    # n/block_rows chosen so the streamed kernel runs a MULTI-block grid
    # (grid >= 4): the per-block DMA window offset arithmetic (i > 0) is
    # exactly what differs from the VMEM-resident kernel
    n = 40_000
    offsets = (-130, -129, -128, -1, 0, 1, 128, 129, 130)
    vals = rng.normal(size=(n, len(offsets)))
    rows = np.arange(n)
    for k, d in enumerate(offsets):
        vals[(rows + d < 0) | (rows + d >= n), k] = 0.0
    x = rng.normal(size=n)
    y_ref = np.zeros(n)
    for k, d in enumerate(offsets):
        idx = rows + d
        ok = (idx >= 0) & (idx < n)
        y_ref[ok] += vals[ok, k] * x[idx[ok]]
    ys = {}
    for name, builder in (
        ("base", build_pallas_stencil_spmv),
        ("streamed", build_pallas_stencil_spmv_streamed),
    ):
        spmv = builder(offsets, n, np.float64, block_rows=64, interpret=True)
        packed = jnp.asarray(spmv.pack_values(vals))
        ys[name] = np.asarray(spmv(packed, jnp.asarray(x)))
        np.testing.assert_allclose(ys[name], y_ref, rtol=1e-12, atol=1e-12)
        y2, dot = spmv.spmv_dot(packed, jnp.asarray(x))
        assert abs(float(dot) - float(x @ y_ref)) < 1e-8
    np.testing.assert_array_equal(ys["base"], ys["streamed"])


def test_pad_granule_rule():
    from fenicsx_beat_tpu.ops.sparse import pad_granule

    # small meshes round to 1024, large (>=262144) to 65536 — the ONE
    # rule shared by solver padding and checkpoint tolerance
    assert pad_granule(500) == 1024
    assert pad_granule(262143) == 1024
    assert pad_granule(262144) == 65536
    assert pad_granule(3_449_001) == 65536


def test_pad_stencil_pair_inert_rows():
    from fenicsx_beat_tpu.ops.sparse import pad_stencil_pair

    mesh = meshmod.create_unit_square(None, 9, 5)
    V = fem.functionspace(mesh, ("P", 1))
    mass, stiff = fem.assemble_mass_stiffness(V, 1.0)
    mass, stiff = ell_to_stencil(mass), ell_to_stencil(stiff)
    n = V.ndofs
    mp, kp, n_pad = pad_stencil_pair(mass, stiff, n)
    assert n_pad == 1024 and mp.shape == (1024, 1024)
    mv, kv = np.asarray(mp.vals), np.asarray(kp.vals)
    # live rows unchanged
    np.testing.assert_array_equal(mv[:n], np.asarray(mass.vals))
    np.testing.assert_array_equal(kv[:n], np.asarray(stiff.vals))
    # pad rows: zero stiffness, unit mass diagonal (Jacobi-CG stays finite)
    k0 = mp.offsets.index(0)
    np.testing.assert_array_equal(kv[n:], 0.0)
    np.testing.assert_array_equal(mv[n:, k0], 1.0)
    off_diag = np.delete(mv[n:], k0, axis=1)
    np.testing.assert_array_equal(off_diag, 0.0)
    # already-aligned n is a no-copy identity
    m2, k2, np2 = pad_stencil_pair(mp, kp, n_pad)
    assert np2 == n_pad and m2 is mp and k2 is kp


def test_assemble_mass_stiffness_auto_prefers_stencil():
    from fenicsx_beat_tpu.ops.sparse import ELLMatrix

    # structured slab: direct stencil assembly
    mesh = get_3D_slab_geometry(None, dx=1.0, Lx=8.0, Ly=4.0, Lz=2.0).mesh
    V = fem.functionspace(mesh, ("P", 1))
    mass_a, stiff_a = fem.assemble_mass_stiffness_auto(V, 1.0)
    assert isinstance(mass_a, StencilMatrix) and isinstance(stiff_a, StencilMatrix)
    mass_e, stiff_e = fem.assemble_mass_stiffness(V, 1.0)
    x = jnp.asarray(np.random.default_rng(3).standard_normal(V.ndofs))
    np.testing.assert_allclose(np.asarray(mass_a @ x), np.asarray(mass_e @ x), atol=1e-12)
    np.testing.assert_allclose(np.asarray(stiff_a @ x), np.asarray(stiff_e @ x), atol=1e-12)
    # P2 declines the direct-stencil path but still returns a working pair
    V2 = fem.functionspace(mesh, ("P", 2))
    m2, k2 = fem.assemble_mass_stiffness_auto(V2, 1.0)
    assert isinstance(m2, (StencilMatrix, ELLMatrix))
    x2 = jnp.asarray(np.random.default_rng(4).standard_normal(V2.ndofs))
    m2e, _ = fem.assemble_mass_stiffness(V2, 1.0)
    np.testing.assert_allclose(np.asarray(m2 @ x2), np.asarray(m2e @ x2), atol=1e-12)


def test_pallas_block_geometry_dtype_aware():
    from fenicsx_beat_tpu.ops.pallas_ode import LANE, _block_geometry

    # small problem: whole-array block regardless of dtype
    m, Bm, grid, n_pad, pad = _block_geometry(19, 1000, np.float32, False)
    assert Bm == m and grid == (1,) and n_pad == m * LANE and pad == n_pad - 1000
    # at 19 states x 65536 nodes, f32 fits the 4MB whole-block budget
    # (19*512*128*4 = 4.75MB > 4MB actually splits) — pick sizes either
    # side of the budget to pin the dtype dependence:
    # f32: 19 * 256 * 128 * 4 = 2.4MB <= 4MB -> whole block
    m32, Bm32, *_ = _block_geometry(19, 256 * LANE, np.float32, False)
    assert Bm32 == m32 == 256
    # f64 doubles the bytes: 4.9MB > 4MB -> blocked (Bm < m)
    m64, Bm64, *_ = _block_geometry(19, 256 * LANE, np.float64, False)
    assert Bm64 < m64
    # blocked_io demands kernel alignment
    with pytest.raises(ValueError):
        _block_geometry(19, 1000, np.float32, True)
