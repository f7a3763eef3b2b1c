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

__all__ = ["build_pallas_stencil_spmv"]

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
        return jnp.asarray(v.reshape(K, R_pad, LANE))

    spmv.pack_values = pack_values
    return spmv
