"""Pallas-fused CG building blocks.

Each Jacobi-PCG iteration needs, besides the SpMV: 3 axpys, a Jacobi
apply, and 2 inner products.  Under XLA those are separate HBM passes
(~28 MB/iteration at 442k nodes); this module fuses the update phase
(x' = x + a p; r' = r - a Ap; z' = M^-1 r'; <r',z'>; <r',r'>) into ONE
kernel with the reductions accumulated in SMEM across the sequential grid,
and the search-direction update (p' = z + beta p) into another.  Combined
with the dot-fused SpMV (``pallas_spmv.spmv_dot``) a CG iteration runs in
three kernels total.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["build_pallas_cg_update", "build_pallas_axpy"]

LANE = 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _grid_shape(n: int, block_rows: int):
    R = _round_up(n, LANE) // LANE
    Br = min(block_rows, _round_up(R, 8))
    # prefer a block size that divides R exactly (no wrapper copies)
    if R % Br:
        for cand in range(Br, 7, -8):
            if R % cand == 0:
                Br = cand
                break
    R_pad = _round_up(R, Br)
    return R, Br, R_pad


def build_pallas_cg_update(n: int, dtype, block_rows: int = 512, interpret: bool | None = None):
    """Returns ``update(x, r, p, ap, minv, alpha) -> (x', r', z', rz, rr)``.

    All vectors are length ``n``; padded tails are zero-filled so the SMEM
    reductions need no masking (``minv`` tails are zeroed by the wrapper).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    R, Br, R_pad = _grid_shape(n, block_rows)
    grid = (R_pad // Br,)
    n_flat = R_pad * LANE

    def kernel(alpha_ref, x_ref, r_ref, p_ref, ap_ref, minv_ref, xo, ro, zo, rz_ref, rr_ref):
        i = pl.program_id(0)
        a = alpha_ref[0]
        xo[:] = x_ref[:] + a * p_ref[:]
        rn = r_ref[:] - a * ap_ref[:]
        ro[:] = rn
        zn = rn * minv_ref[:]
        zo[:] = zn
        rz = jnp.sum(rn * zn)
        rr = jnp.sum(rn * rn)

        @pl.when(i == 0)
        def _():
            rz_ref[0] = rz
            rr_ref[0] = rr

        @pl.when(i > 0)
        def _():
            rz_ref[0] = rz_ref[0] + rz
            rr_ref[0] = rr_ref[0] + rr

    vec = pl.BlockSpec((Br, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), vec, vec, vec, vec, vec],
        out_specs=[
            vec,
            vec,
            vec,
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((R_pad, LANE), dtype),
            jax.ShapeDtypeStruct((R_pad, LANE), dtype),
            jax.ShapeDtypeStruct((R_pad, LANE), dtype),
            jax.ShapeDtypeStruct((1,), dtype),
            jax.ShapeDtypeStruct((1,), dtype),
        ],
        interpret=interpret,
    )

    def _pad2d(v):
        if n == n_flat:
            return v.reshape(R_pad, LANE)
        out = jnp.zeros((n_flat,), dtype=dtype)
        out = jax.lax.dynamic_update_slice(out, v.astype(dtype), (0,))
        return out.reshape(R_pad, LANE)

    def update(x, r, p, ap, minv, alpha):
        xo, ro, zo, rz, rr = call(
            jnp.reshape(alpha, (1,)).astype(dtype),
            _pad2d(x),
            _pad2d(r),
            _pad2d(p),
            _pad2d(ap),
            _pad2d(minv),
        )
        flat = (lambda a: a.reshape(n_flat)) if n == n_flat else (
            lambda a: a.reshape(n_flat)[:n]
        )
        return flat(xo), flat(ro), flat(zo), rz[0], rr[0]

    return update


def build_pallas_axpy(n: int, dtype, block_rows: int = 512, interpret: bool | None = None):
    """Returns ``axpy(z, p, beta) -> z + beta * p`` (search-direction update)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    R, Br, R_pad = _grid_shape(n, block_rows)
    grid = (R_pad // Br,)
    n_flat = R_pad * LANE

    def kernel(beta_ref, z_ref, p_ref, out):
        out[:] = z_ref[:] + beta_ref[0] * p_ref[:]

    vec = pl.BlockSpec((Br, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), vec, vec],
        out_specs=vec,
        out_shape=jax.ShapeDtypeStruct((R_pad, LANE), dtype),
        interpret=interpret,
    )

    def _pad2d(v):
        if n == n_flat:
            return v.reshape(R_pad, LANE)
        out = jnp.zeros((n_flat,), dtype=dtype)
        out = jax.lax.dynamic_update_slice(out, v.astype(dtype), (0,))
        return out.reshape(R_pad, LANE)

    def axpy(z, p, beta):
        out = call(jnp.reshape(beta, (1,)).astype(dtype), _pad2d(z), _pad2d(p))
        out = out.reshape(n_flat)
        return out if n == n_flat else out[:n]

    return axpy
