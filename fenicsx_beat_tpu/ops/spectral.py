"""DCT-based spectral preconditioning for constant-stencil operators.

The bidomain extracellular block is pure stiffness — unlike the
monodomain theta system it is NOT mass-dominated, and Jacobi-CG
iterations grow like O(1/h) (measured 190/step at a 48² sheet,
docs/DESIGN.md §6b).  On the structured grids this framework's stencil
path already detects, the interior stiffness row is one constant stencil,
and the cosine (DCT-II) basis nearly diagonalizes it under Neumann
boundaries: preconditioning with the exact inverse of that
constant-stencil operator is spectrally equivalent, collapsing the
iteration count to O(1) in mesh size.

TPU-wise this is two `dctn`/`idctn` (XLA FFT) sweeps per CG iteration —
bandwidth-bound like the SpMV it rides next to, with no gather at all.

Eigenvalue model: for symmetric displacement pairs ±(d₁,…,d_D) a
constant-coefficient stencil acts on the DCT-II mode (k₁,…,k_D) as
``c · Π_a cos(π k_a d_a / N_a)`` (the antisymmetric sine cross-terms of
diagonal pairs fall outside the cosine basis and are dropped — this is a
preconditioner, spectral equivalence is enough).
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
import numpy as np

__all__ = ["grid_shape", "stencil_dct_solver"]


def grid_shape(mesh) -> tuple[int, ...] | None:
    """Node dimensions of a lexicographically ordered tensor grid, or
    ``None``.  The framework's structured meshes (create_rectangle /
    create_box / the slab geometries) enumerate nodes as
    ``ix*(Ny*Nz) + iy*Nz + iz`` over a uniform product grid."""
    coords = mesh.coords
    n, gdim = coords.shape
    axes = []
    for a in range(gdim):
        u = np.unique(coords[:, a])
        axes.append(u)
    if int(np.prod([len(u) for u in axes])) != n:
        return None
    dims = tuple(len(u) for u in axes)
    # verify lexicographic order (last axis fastest) and uniform spacing
    grids = np.meshgrid(*axes, indexing="ij")
    expect = np.stack([g.ravel() for g in grids], axis=1)
    if not np.allclose(expect, coords, atol=1e-12):
        return None
    for u in axes:
        if len(u) > 2 and not np.allclose(np.diff(u), u[1] - u[0], rtol=1e-8):
            return None
    return dims


def _decode_offsets(offsets, dims):
    """Flat stencil offsets -> per-axis displacements, or None."""
    strides = np.ones(len(dims), dtype=np.int64)
    for a in range(len(dims) - 2, -1, -1):
        strides[a] = strides[a + 1] * dims[a + 1]
    out = []
    for o in offsets:
        best = None
        # search small displacement vectors (P1 stencils reach +-1/axis)
        rng = range(-2, 3)
        for d in np.ndindex(*([5] * len(dims))):
            disp = tuple(rng[i] for i in d)
            if int(np.dot(disp, strides)) == int(o):
                if best is None or sum(abs(x) for x in disp) < sum(abs(x) for x in best):
                    best = disp
        if best is None:
            return None
        out.append(best)
    return out


def stencil_dct_solver(stencil, mesh, dtype=None) -> Callable | None:
    """Inverse-by-DCT of the constant interior stencil of ``stencil`` on
    ``mesh``'s structured grid: returns ``apply(r) -> z`` with
    ``z ≈ stencil⁻¹ r`` (exact for the constant-coefficient model
    operator), or ``None`` when the mesh is not a tensor grid or the
    offsets do not decode to grid displacements.  The zero-frequency
    eigenvalue (stiffness nullspace) is replaced by the mean positive
    eigenvalue — callers deflate the constant anyway."""
    from jax.scipy.fft import dctn, idctn

    dims = grid_shape(mesh)
    if dims is None:
        return None
    disps = _decode_offsets(stencil.offsets, dims)
    if disps is None:
        return None
    vals = np.asarray(stencil.vals)
    # interior row: center of the grid
    strides = np.ones(len(dims), dtype=np.int64)
    for a in range(len(dims) - 2, -1, -1):
        strides[a] = strides[a + 1] * dims[a + 1]
    center = int(np.dot([d // 2 for d in dims], strides))
    c = vals[center]

    lam = np.zeros(dims)
    for coef, disp in zip(c, disps):
        term = np.ones(dims)
        for a, (d_a, N_a) in enumerate(zip(disp, dims)):
            k = np.arange(N_a)
            cos = np.cos(np.pi * k * abs(d_a) / N_a)
            shape = [1] * len(dims)
            shape[a] = N_a
            term = term * cos.reshape(shape)
        lam += coef * term
    pos = lam[np.abs(lam) > 1e-12 * np.abs(lam).max()]
    floor = float(np.abs(pos).min()) if pos.size else 1.0
    lam = np.where(np.abs(lam) < 1e-12 * np.abs(lam).max(), np.mean(np.abs(pos)) if pos.size else 1.0, lam)
    lam = np.maximum(lam, 0.25 * floor)  # SPD guard for the dropped cross-terms
    lam_j = jnp.asarray(lam, dtype=dtype or vals.dtype)
    dims_t = tuple(dims)

    def apply(r):
        R = dctn(r.reshape(dims_t), type=2, norm="ortho")
        return idctn(R / lam_j, type=2, norm="ortho").reshape(r.shape)

    return apply
