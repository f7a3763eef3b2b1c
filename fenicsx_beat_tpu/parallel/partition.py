"""Host-side 1-D node partitioning with planar halos.

Replaces DOLFINx/MPI mesh partitioning + ghost index maps (reference
``geometry.py:112-139``; ghost layout visible at reference
``tests/test_odesolver.py:63``).  The structured slab generators order
nodes lexicographically with x slowest (``fenicsx_beat_tpu.mesh``), so a
contiguous equal-size block partition along x gives each device a slab
whose matrix rows only reference columns within a bounded halo of its
block — the halo is exchanged with the two ICI neighbors via
``lax.ppermute``.

``partition_ell`` turns a global ELL matrix into per-device local blocks
with columns remapped into the device's extended index space
``[0, n_loc + 2*halo)``:

    [ left-halo (H) | owned block (n_loc) | right-halo (H) ]
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..ops.sparse import ELLMatrix

__all__ = ["Partition1D", "partition_nodes", "partition_ell", "partition_stencil"]


@dataclass(frozen=True)
class Partition1D:
    n_global: int  # true number of dofs
    n_devices: int
    n_local: int  # padded equal block size (n_pad = n_devices * n_local)
    halo: int  # uniform halo width

    @property
    def n_pad(self) -> int:
        return self.n_devices * self.n_local


def partition_nodes(n: int, n_devices: int) -> tuple[int, int]:
    """Equal padded block size."""
    n_local = -(-n // n_devices)
    return n_local, n_devices * n_local


def pad_global(x: np.ndarray, part: Partition1D, fill: float = 0.0) -> np.ndarray:
    """Pad the trailing (node) axis of a global array to n_pad."""
    pad = part.n_pad - x.shape[-1]
    if pad == 0:
        return x
    widths = [(0, 0)] * (x.ndim - 1) + [(0, pad)]
    return np.pad(x, widths, constant_values=fill)


def partition_ell(A: ELLMatrix, n_devices: int) -> tuple[Partition1D, jnp.ndarray, jnp.ndarray]:
    """Split a global ELL matrix into stacked per-device local blocks.

    Returns (partition, cols_local [ndev, n_local, W], vals [ndev,
    n_local, W]).  Raises if any row reaches beyond its neighbors' blocks
    (i.e. the 1-D partition assumption is violated — reorder nodes first).
    """
    n = A.shape[0]
    if getattr(A, "has_tail", False):
        raise NotImplementedError(
            "1-D partitioning of hybrid ELL+tail matrices is not supported; "
            "use a mesh without extreme-degree rows for sharded runs"
        )
    cols = np.asarray(A.cols)
    vals = np.asarray(A.vals)
    W = cols.shape[1]
    n_local, n_pad = partition_nodes(n, n_devices)

    # pad rows: identity row (diag 1) so padded dofs stay inert under CG
    pad = n_pad - n
    if pad:
        pad_cols = np.tile(np.arange(n, n_pad, dtype=cols.dtype)[:, None], (1, W))
        pad_vals = np.zeros((pad, W), dtype=vals.dtype)
        pad_vals[:, 0] = 1.0
        cols = np.concatenate([cols, pad_cols], axis=0)
        vals = np.concatenate([vals, pad_vals], axis=0)

    # compute required halo: max reach of any row outside its own block
    row_block = np.repeat(np.arange(n_pad) // n_local, W).reshape(n_pad, W)
    block_start = row_block * n_local
    reach_left = np.maximum(0, block_start - cols)
    reach_right = np.maximum(0, cols - (block_start + n_local - 1))
    halo = int(max(reach_left.max(), reach_right.max()))
    if halo > n_local:
        raise ValueError(
            f"halo {halo} exceeds local block {n_local}: too many devices for "
            "this mesh (or node ordering is not partition-friendly)"
        )

    part = Partition1D(n_global=n, n_devices=n_devices, n_local=n_local, halo=halo)

    # remap columns to the extended local index space
    cols_local = cols - block_start + halo
    cols3 = cols_local.reshape(n_devices, n_local, W).astype(np.int32)
    vals3 = vals.reshape(n_devices, n_local, W)
    return part, jnp.asarray(cols3), jnp.asarray(vals3)


def partition_stencil(
    A: "StencilMatrix", n_devices: int, diag_pad: float = 0.0
) -> tuple[Partition1D, jnp.ndarray]:
    """Split a global stencil matrix into per-device local value blocks.

    Returns (partition, vals [ndev, n_local, K]); the halo equals the
    largest |offset| so every shifted read lands inside the extended local
    vector ``[left-halo | owned | right-halo]``.  ``diag_pad`` is written
    at offset 0 for the padded rows (1.0 for the mass keeps the combined
    theta-system diagonal positive, so padded dofs stay inert under
    Jacobi-CG).
    """
    from ..ops.sparse import StencilMatrix  # noqa: F401 (typing)

    n = A.shape[0]
    vals = np.asarray(A.vals)
    K = vals.shape[1]
    n_local, n_pad = partition_nodes(n, n_devices)
    halo = max(abs(int(d)) for d in A.offsets)
    if halo > n_local:
        raise ValueError(
            f"stencil halo {halo} exceeds local block {n_local}: too many "
            "devices for this mesh"
        )
    pad = n_pad - n
    if pad:
        pad_vals = np.zeros((pad, K), dtype=vals.dtype)
        if diag_pad:
            k0 = A.offsets.index(0)
            pad_vals[:, k0] = diag_pad
        vals = np.concatenate([vals, pad_vals], axis=0)
    part = Partition1D(n_global=n, n_devices=n_devices, n_local=n_local, halo=halo)
    return part, jnp.asarray(vals.reshape(n_devices, n_local, K))
