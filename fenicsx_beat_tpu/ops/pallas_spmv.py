"""Pallas stencil SpMV: one HBM pass over the operand vector.

The XLA lowering of the stencil SpMV (``ops.sparse.StencilMatrix``)
re-reads overlapping shifted windows of the operand from HBM (~10x traffic
amplification measured at 442k nodes).  This kernel keeps the whole
operand resident in VMEM (constant-index-map block, fetched once) and
streams only the [K, n] value array.

Node j lives at 2D position (j // 128, j % 128).  A shift by offset ``d``
decomposes into a sublane (row) shift ``dr`` and a lane shift ``dm``;
Mosaic cannot slice at unaligned starts, so each is realized as an ALIGNED
dynamic slice plus static ``pltpu.roll`` rotations and a lane-mask select
for the carry between adjacent rows.  All shift amounts are compile-time
constants (the offset set is fixed per mesh).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "build_pallas_stencil_spmv",
    "build_pallas_stencil_spmv_sym",
    "build_pallas_stencil_spmv_streamed",
]

LANE = 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def build_pallas_stencil_spmv(
    offsets: Sequence[int],
    n: int,
    dtype,
    block_rows: int = 512,
    interpret: bool | None = None,
):
    """Returns ``spmv(vals3, x) -> y`` for a fixed stencil offset set.

    ``vals3``: [K, R_pad, 128] packed values (build once via
    ``spmv.pack_values``); ``x``: [n] operand; ``y``: [n].
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    offsets = tuple(int(d) for d in offsets)
    K = len(offsets)
    R = _round_up(n, LANE) // LANE  # rows of 128 nodes
    Br = min(block_rows, _round_up(R, 8))
    R_pad = _round_up(R, Br)
    grid = (R_pad // Br,)

    # guard rows above/below so every window slice stays in-bounds
    dr_max = max(abs((d - (d % LANE)) // LANE) for d in offsets) + 1
    G = _round_up(dr_max + 8, 8)
    rows_total = G + R_pad + G + 24  # +24: window slack (rem + carry + roll)

    def body(x_ref, v_ref):
        i = pl.program_id(0)
        lane_ids = jax.lax.broadcasted_iota(jnp.int32, (Br, LANE), 1)
        acc = jnp.zeros((Br, LANE), dtype=x_ref.dtype)
        for k, d in enumerate(offsets):
            dm = d % LANE
            dr = (d - dm) // LANE
            c = G + dr
            c8 = (c // 8) * 8
            rem = c - c8
            start = pl.multiple_of(i * Br + c8, 8)
            WR = Br + 16  # window rows (pltpu.roll requires shift >= 0)
            W = x_ref[pl.ds(start, WR), :]
            if rem:
                W = pltpu.roll(W, WR - rem, axis=0)  # row 0 = block row + dr
            if dm == 0:
                shifted = W[:Br, :]
            else:
                A = pltpu.roll(W, LANE - dm, axis=1)
                B = pltpu.roll(pltpu.roll(W, WR - 1, axis=0), LANE - dm, axis=1)
                shifted = jnp.where(lane_ids < LANE - dm, A[:Br, :], B[:Br, :])
            acc = acc + v_ref[k] * shifted
        return acc

    def kernel(x_ref, v_ref, o_ref):
        o_ref[:] = body(x_ref, v_ref)

    def kernel_dot(x_ref, v_ref, o_ref, dot_ref):
        """SpMV plus the inner product <operand, A operand> (the CG pAp
        reduction) accumulated across the sequential grid in SMEM — saves a
        separate full pass over two vectors per CG iteration."""
        i = pl.program_id(0)
        acc = body(x_ref, v_ref)
        o_ref[:] = acc
        gstart = pl.multiple_of(G + i * Br, 8)
        xb = x_ref[pl.ds(gstart, Br), :]
        partial = jnp.sum(xb * acc)

        @pl.when(i == 0)
        def _():
            dot_ref[0] = partial

        @pl.when(i > 0)
        def _():
            dot_ref[0] = dot_ref[0] + partial

    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            # full padded operand, constant index map -> fetched once
            pl.BlockSpec((rows_total, LANE), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, Br, LANE), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Br, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R_pad, LANE), dtype),
        interpret=interpret,
    )

    call_dot = pl.pallas_call(
        kernel_dot,
        grid=grid,
        in_specs=[
            pl.BlockSpec((rows_total, LANE), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, Br, LANE), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((Br, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((R_pad, LANE), dtype),
            jax.ShapeDtypeStruct((1,), dtype),
        ],
        interpret=interpret,
    )

    def _extend(x):
        x_ext = jnp.zeros((rows_total * LANE,), dtype=dtype)
        x_ext = jax.lax.dynamic_update_slice(x_ext, x.astype(dtype), (G * LANE,))
        return x_ext.reshape(rows_total, LANE)

    def spmv(vals3, x):
        y = call(_extend(x), vals3)
        return y.reshape(R_pad * LANE)[:n]

    def spmv_dot(vals3, x):
        """(A @ x, <x, A x>) in one pass (x padded entries are zero, so the
        dot needs no mask)."""
        y, d = call_dot(_extend(x), vals3)
        return y.reshape(R_pad * LANE)[:n], d[0]

    spmv.spmv_dot = spmv_dot

    def pack_values(vals):
        """[n, K] stencil values -> [K, R_pad, 128] device array."""
        v = np.zeros((K, R_pad * LANE), dtype=np.dtype(dtype))
        v[:, :n] = np.asarray(vals).T
        # numpy-backed: callers capture this as a jit-closure constant;
        # host constants embed directly, device constants would be pulled
        # back at lowering (ruinous over a remote-TPU tunnel)
        return v.reshape(K, R_pad, LANE)

    spmv.pack_values = pack_values
    return spmv


def build_pallas_stencil_spmv_sym(
    offsets: Sequence[int],
    n: int,
    dtype,
    block_rows: int = 512,
    interpret: bool | None = None,
):
    """Symmetric-stencil SpMV streaming only the d >= 0 value columns.

    For a symmetric operator the negative-offset column is a shifted copy
    of its positive partner (``A[r, r-d] = A[r-d, r]`` gives
    ``v_{-d}[r] = v_{+d}[r-d]``), so the dominant HBM stream — the value
    array — halves: the sub-diagonal contribution at node r is
    ``(v_d * x)[r-d]``, a row/lane shift of the elementwise product already
    formed for the super-diagonal term.  Cross-block reach (product rows
    below the block start) comes from a small streamed halo of the same
    value array.

    Returns ``spmv(vals3, x)`` with ``vals3`` packed via
    ``spmv.pack_values`` from the FULL [n, K] stencil value table (the
    packer keeps the d >= 0 columns).  The offset set must be symmetric.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    offsets = tuple(int(d) for d in offsets)
    if set(offsets) != {-d for d in offsets}:
        raise ValueError(f"offset set is not symmetric: {offsets}")
    pos = tuple(d for d in offsets if d >= 0)  # streamed columns, incl. 0
    Kp = len(pos)
    R = _round_up(n, LANE) // LANE
    Br = min(block_rows, _round_up(R, 8))
    R_pad = _round_up(R, Br)
    grid = (R_pad // Br,)

    # row reach of any offset (both directions use the same magnitudes)
    dr_max = max(abs((d - (d % LANE)) // LANE) for d in pos) + 1
    # product-halo rows streamed per block: the smallest divisor of Br
    # covering the reach (correctness needs Hs >= dr_max + 1)
    m = Br // 8
    h_min = -(-(dr_max + 1) // 8)
    h = next((hh for hh in range(h_min, m + 1) if m % hh == 0), m)
    Hs = 8 * h
    if Hs < dr_max + 1:
        raise ValueError(
            f"stencil reach {dr_max} rows exceeds the block ({Br} rows); "
            "use the generic kernel"
        )
    G = _round_up(max(dr_max + 8, Hs), 8)
    rows_total = G + R_pad + G + 24
    halo_blocks = Br // Hs

    def body(x_ref, v_ref, vh_ref):
        i = pl.program_id(0)
        lane_ids = jax.lax.broadcasted_iota(jnp.int32, (Br, LANE), 1)
        acc = jnp.zeros((Br, LANE), dtype=x_ref.dtype)
        # operand window for the product z = v * x over rows
        # [block_start - Hs, block_start + Br)
        zx_start = pl.multiple_of(G + i * Br - Hs, 8)
        z_rows = Hs + Br
        Xw = x_ref[pl.ds(zx_start, z_rows), :]
        lane_z = jax.lax.broadcasted_iota(jnp.int32, (Br, LANE), 1)
        for k, d in enumerate(pos):
            dm = d % LANE
            dr = (d - dm) // LANE
            vk = v_ref[k]
            # --- super-diagonal term: acc[r] += v[r] * x[r + d] ---------
            c = G + dr
            c8 = (c // 8) * 8
            rem = c - c8
            start = pl.multiple_of(i * Br + c8, 8)
            WR = Br + 16
            W = x_ref[pl.ds(start, WR), :]
            if rem:
                W = pltpu.roll(W, WR - rem, axis=0)
            if dm == 0:
                shifted = W[:Br, :]
            else:
                A = pltpu.roll(W, LANE - dm, axis=1)
                B = pltpu.roll(pltpu.roll(W, WR - 1, axis=0), LANE - dm, axis=1)
                shifted = jnp.where(lane_ids < LANE - dm, A[:Br, :], B[:Br, :])
            acc = acc + vk * shifted
            if d == 0:
                continue
            # --- sub-diagonal term: acc[r] += (v * x)[r - d] ------------
            zW = jnp.concatenate([vh_ref[k], vk], axis=0) * Xw  # [z_rows, LANE]
            sA = Hs - dr  # z row of (block row r) - dr
            A2 = pltpu.roll(zW, z_rows - sA, axis=0)[:Br, :]
            if dm == 0:
                acc = acc + A2
            else:
                B2 = pltpu.roll(zW, z_rows - (sA - 1), axis=0)[:Br, :]
                A2L = pltpu.roll(A2, dm, axis=1)
                B2L = pltpu.roll(B2, dm, axis=1)
                acc = acc + jnp.where(lane_z >= dm, A2L, B2L)
        return acc

    def kernel(x_ref, v_ref, vh_ref, o_ref):
        o_ref[:] = body(x_ref, v_ref, vh_ref)

    def kernel_dot(x_ref, v_ref, vh_ref, o_ref, dot_ref):
        i = pl.program_id(0)
        acc = body(x_ref, v_ref, vh_ref)
        o_ref[:] = acc
        gstart = pl.multiple_of(G + i * Br, 8)
        xb = x_ref[pl.ds(gstart, Br), :]
        partial = jnp.sum(xb * acc)

        @pl.when(i == 0)
        def _():
            dot_ref[0] = partial

        @pl.when(i > 0)
        def _():
            dot_ref[0] = dot_ref[0] + partial

    def _halo_index(i):
        # rows [block_start - Hs, block_start): block (i*halo_blocks - 1) of
        # height Hs; i = 0 reads block 0 (values irrelevant: x rows there
        # are guard zeros, so the product vanishes)
        return (0, jnp.maximum(i * halo_blocks - 1, 0), 0)

    in_specs = [
        pl.BlockSpec((rows_total, LANE), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((Kp, Br, LANE), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((Kp, Hs, LANE), _halo_index, memory_space=pltpu.VMEM),
    ]

    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((Br, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R_pad, LANE), dtype),
        interpret=interpret,
    )

    call_dot = pl.pallas_call(
        kernel_dot,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((Br, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((R_pad, LANE), dtype),
            jax.ShapeDtypeStruct((1,), dtype),
        ],
        interpret=interpret,
    )

    def _extend(x):
        x_ext = jnp.zeros((rows_total * LANE,), dtype=dtype)
        x_ext = jax.lax.dynamic_update_slice(x_ext, x.astype(dtype), (G * LANE,))
        return x_ext.reshape(rows_total, LANE)

    def spmv(vals3, x):
        y = call(_extend(x), vals3, vals3)
        return y.reshape(R_pad * LANE)[:n]

    def spmv_dot(vals3, x):
        y, dval = call_dot(_extend(x), vals3, vals3)
        return y.reshape(R_pad * LANE)[:n], dval[0]

    spmv.spmv_dot = spmv_dot

    def pack_values(vals):
        """FULL [n, K] stencil values -> [Kp, R_pad, 128] (d >= 0 columns)."""
        vals = np.asarray(vals)
        v = np.zeros((Kp, R_pad * LANE), dtype=np.dtype(dtype))
        for kk, d in enumerate(pos):
            v[kk, :n] = vals[:, offsets.index(d)]
        return v.reshape(Kp, R_pad, LANE)  # numpy-backed, see above

    spmv.pack_values = pack_values
    spmv.positive_offsets = pos
    return spmv


def build_pallas_stencil_spmv_streamed(
    offsets: Sequence[int],
    n: int,
    dtype,
    block_rows: int = 512,
    interpret: bool | None = None,
):
    """Stencil SpMV for operands LARGER than VMEM.

    The base kernel (:func:`build_pallas_stencil_spmv`) pins the whole
    padded operand in VMEM (constant-index-map block), which caps the
    node count at ~3M on a 16 MB-scoped-VMEM v5e.  Here the operand stays
    in HBM (``memory_space=ANY``) and each grid step DMAs its
    ``Br + 2G + 24``-row window into a VMEM scratch buffer — halo
    amplification is only ``2G/Br`` (a few %%), so the HBM traffic stays
    one effective pass over x plus the value stream.  Same shift/roll
    math and bit-identical results; interface matches the base builder
    (``spmv``, ``spmv.spmv_dot``, ``spmv.pack_values``).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    offsets = tuple(int(d) for d in offsets)
    K = len(offsets)
    R = _round_up(n, LANE) // LANE
    Br = min(block_rows, _round_up(R, 8))
    R_pad = _round_up(R, Br)
    grid = (R_pad // Br,)

    dr_max = max(abs((d - (d % LANE)) // LANE) for d in offsets) + 1
    G = _round_up(dr_max + 8, 8)
    WIN = Br + 2 * G + 24  # VMEM window rows per block (local row 0 = i*Br)
    rows_total = R_pad + 2 * G + 24  # extended operand rows in HBM

    def body_local(xw, v_ref):
        lane_ids = jax.lax.broadcasted_iota(jnp.int32, (Br, LANE), 1)
        acc = jnp.zeros((Br, LANE), dtype=xw.dtype)
        for k, d in enumerate(offsets):
            dm = d % LANE
            dr = (d - dm) // LANE
            c = G + dr
            c8 = (c // 8) * 8
            rem = c - c8
            WR = Br + 16
            W = xw[pl.ds(c8, WR), :]
            if rem:
                W = pltpu.roll(W, WR - rem, axis=0)
            if dm == 0:
                shifted = W[:Br, :]
            else:
                A = pltpu.roll(W, LANE - dm, axis=1)
                B = pltpu.roll(pltpu.roll(W, WR - 1, axis=0), LANE - dm, axis=1)
                shifted = jnp.where(lane_ids < LANE - dm, A[:Br, :], B[:Br, :])
            acc = acc + v_ref[k] * shifted
        return acc

    def _fetch(x_hbm, xw, sem):
        i = pl.program_id(0)
        dma = pltpu.make_async_copy(
            x_hbm.at[pl.ds(i * Br, WIN), :], xw, sem
        )
        dma.start()
        dma.wait()

    def kernel(x_hbm, v_ref, o_ref, xw, sem):
        _fetch(x_hbm, xw, sem)
        o_ref[:] = body_local(xw, v_ref)

    def kernel_dot(x_hbm, v_ref, o_ref, dot_ref, xw, sem):
        i = pl.program_id(0)
        _fetch(x_hbm, xw, sem)
        acc = body_local(xw, v_ref)
        o_ref[:] = acc
        xb = xw[pl.ds(G, Br), :]
        partial = jnp.sum(xb * acc)

        @pl.when(i == 0)
        def _():
            dot_ref[0] = partial

        @pl.when(i > 0)
        def _():
            dot_ref[0] = dot_ref[0] + partial

    any_space = pl.ANY  # documented spelling; hard error if ever removed
    scratch = [
        pltpu.VMEM((WIN, LANE), jnp.dtype(dtype)),
        pltpu.SemaphoreType.DMA,
    ]
    in_specs = [
        pl.BlockSpec(memory_space=any_space),
        pl.BlockSpec((K, Br, LANE), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
    ]

    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((Br, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R_pad, LANE), dtype),
        scratch_shapes=scratch,
        interpret=interpret,
    )

    call_dot = pl.pallas_call(
        kernel_dot,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((Br, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((R_pad, LANE), dtype),
            jax.ShapeDtypeStruct((1,), dtype),
        ],
        scratch_shapes=scratch,
        interpret=interpret,
    )

    def _extend(x):
        x_ext = jnp.zeros((rows_total * LANE,), dtype=dtype)
        x_ext = jax.lax.dynamic_update_slice(x_ext, x.astype(dtype), (G * LANE,))
        return x_ext.reshape(rows_total, LANE)

    def spmv(vals3, x):
        y = call(_extend(x), vals3)
        return y.reshape(R_pad * LANE)[:n]

    def spmv_dot(vals3, x):
        y, d = call_dot(_extend(x), vals3)
        return y.reshape(R_pad * LANE)[:n], d[0]

    spmv.spmv_dot = spmv_dot

    def pack_values(vals):
        """[n, K] stencil values -> [K, R_pad, 128] (numpy-backed)."""
        v = np.zeros((K, R_pad * LANE), dtype=np.dtype(dtype))
        v[:, :n] = np.asarray(vals).T
        return v.reshape(K, R_pad, LANE)

    spmv.pack_values = pack_values
    return spmv


def stencil_is_symmetric(offsets: Sequence[int], vals: np.ndarray, tol: float = 1e-9) -> bool:
    """Host check that the stencil matrix is symmetric: for every d > 0,
    ``v_{-d}[r] == v_{+d}[r-d]`` (rows reaching outside [0, n) are zero)."""
    offsets = tuple(int(d) for d in offsets)
    if set(offsets) != {-d for d in offsets}:
        return False
    vals = np.asarray(vals)
    n = vals.shape[0]
    scale = max(np.abs(vals).max(), 1e-30)
    for d in offsets:
        if d <= 0:
            continue
        vneg = vals[:, offsets.index(-d)]
        vpos = vals[:, offsets.index(d)]
        shifted = np.zeros_like(vneg)
        shifted[d:] = vpos[: n - d]
        if np.abs(vneg - shifted).max() > tol * scale:
            return False
    return True
