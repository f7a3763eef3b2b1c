"""Pallas-fused ionic ODE stepping.

The in-repo ionic models are pure elementwise jnp functions over a
``(num_states, n)`` array.  Under plain XLA each Rush-Larsen step lowers to
~10^2 small VPU fusions whose fixed launch overhead dominates at moderate
node counts (measured 0.32 ms/step for TP06 at 4.3k nodes on v5e, vs
~0.02 ms of actual memory traffic).  This wrapper runs the WHOLE model
step as ONE ``pallas_call``: states live in VMEM as ``(S, Bm, 128)``
blocks (full 8x128 VPU tiles per state row), the model function is traced
directly into the kernel, and model parameters are baked in as immediates
(they are fixed per solver instance).

Padding nodes replicate column 0 of the initial state so the model's
logs/divisions stay finite; the wrapper slices the result back to ``n``.

Falls back to interpret mode off-TPU (tests); :class:`.fused.
FusedMonodomainSolver` additionally lowers the kernel eagerly at build
time and degrades to the plain jnp ODE path if Mosaic rejects it.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["build_pallas_ode_step", "build_pallas_multi_ode_step"]


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


LANE = 128
SUB = 8  # f32 sublane requirement: middle block dim must be 8k or full


def _block_geometry(num_states: int, n_nodes: int, dtype, blocked_io: bool):
    """Shared (m, Bm, grid, n_pad, pad) kernel-block sizing.

    Whole-array block when the states tensor fits VMEM comfortably, else
    8-row blocks doubled while they still fit half the budget.  Enforces
    the blocked_io alignment contract (callers hand pre-blocked
    ``(S, m, LANE)`` buffers, so n_nodes must already be padded)."""
    S = num_states
    itemsize = np.dtype(dtype).itemsize
    m = _round_up(n_nodes, LANE) // LANE  # columns of 128 nodes
    if S * m * LANE * itemsize <= 4 * 1024 * 1024:
        Bm = m
    else:
        m = _round_up(m, SUB)
        Bm = SUB
        while m % (2 * Bm) == 0 and S * 2 * Bm * LANE * itemsize <= 2 * 1024 * 1024:
            Bm *= 2
    grid = (m // Bm,)
    n_pad = m * LANE
    pad = n_pad - n_nodes
    if blocked_io and pad:
        raise ValueError(
            f"blocked_io requires n_nodes aligned to the kernel block "
            f"({m}x{LANE} = {n_pad}), got {n_nodes}"
        )
    return m, Bm, grid, n_pad, pad


def _block_rows(arr2d, rows, m, pad):
    """Pad ``(rows, n)`` with replicated column 0, reshape ``(rows, m, LANE)``."""
    if pad:
        fill = jnp.broadcast_to(arr2d[:, :1], (rows, pad))
        arr2d = jnp.concatenate([arr2d, fill], axis=1)
    return arr2d.reshape(rows, m, LANE)


def _block_vec(v, m, pad):
    """Pad ``(n,)`` with replicated element 0, reshape ``(m, LANE)``."""
    if pad:
        v = jnp.concatenate([v, jnp.broadcast_to(v[:1], (pad,))])
    return v.reshape(m, LANE)


def _unblock_rows(out, rows, n_nodes, pad):
    """Invert :func:`_block_rows`: ``(rows, m, LANE)`` back to ``(rows, n)``."""
    out = out.reshape(rows, -1)
    return out[:, :n_nodes] if pad else out


def build_pallas_ode_step(
    fun: Callable,
    num_states: int,
    n_nodes: int,
    parameters: np.ndarray | None,
    dtype,
    block_rows: int = 8,
    interpret: bool | None = None,
    v_index: int | None = None,
    node_params: int | None = None,
    blocked_io: bool = False,
):
    """Returns ``step(states, t, dt) -> new_states`` with states ``(S, n)``.

    With ``blocked_io=True`` the step takes and returns states ALREADY in
    the kernel's ``(S, m, LANE)`` block layout (``v`` stays a flat
    ``(n,)`` vector — its 1-D tiling equals the ``(m, LANE)`` 2-D tiling,
    so that reshape is free).  The ``(S, n) <-> (S, m, LANE)`` conversion
    is a physical TPU relayout that XLA materializes on both sides of the
    opaque call (profiled ~84 us/step at 442k nodes); callers that loop
    the step (the fused solver's scan) should carry blocked states and
    convert once per chunk.  Requires ``n_nodes`` divisible by the kernel
    block (1024 nodes); ``node_params`` must then be passed pre-blocked as
    ``(NP, m, LANE)``.

    ``fun`` is the model's ``generalized_rush_larsen``-style callable; it is
    traced into a single pallas kernel.  ``parameters`` are captured as
    host constants (numpy), so the kernel specializes on them.

    With ``v_index`` given, the signature becomes ``step(states, v, t, dt)``
    and the kernel substitutes row ``v_index`` with the separate ``v``
    input before evaluating the model — this lets the splitting solver skip
    the full-state ``states.at[v_index].set(v_pde)`` copy between the PDE
    solve and the next ionic step (a ~35 MB round trip per step at 442k
    nodes).

    With ``node_params`` given (requires ``v_index``), ``parameters`` is
    instead a node-aligned ``[node_params, n]`` array streamed per block
    and passed to the model as its ``parameters`` argument — this is how
    multi-marker masks (:func:`~fenicsx_beat_tpu.odesolver.make_multi_ode`)
    and per-node parameter fields reach the kernel.  Signature:
    ``step(states, v, params_node, t, dt)``.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    S = num_states
    m, Bm, grid, n_pad, pad = _block_geometry(S, n_nodes, dtype, blocked_io)

    params_np = None if parameters is None else np.asarray(parameters, dtype=np.float64)

    # table-driven models (e.g. tp06.tabulated_rush_larsen) carry their
    # lookup tables as one packed (rows, 128) tensor; Pallas rejects
    # captured array constants, so it rides in as an extra VMEM operand
    # broadcast to every grid block
    tables_np = getattr(fun, "tables_packed", None)
    if tables_np is not None:
        tables_np = np.asarray(tables_np)
        tab_spec = pl.BlockSpec(
            tables_np.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
        )

    def _call_fun(s, t, dt, params, tab=None):
        kw = {} if tab is None else {"tables": tab}
        return fun(states=s, t=t, parameters=params, dt=dt, **kw).astype(s.dtype)

    if v_index is None:

        if tables_np is None:

            def kernel(t_ref, dt_ref, s_ref, o_ref):
                o_ref[:] = _call_fun(s_ref[:], t_ref[0], dt_ref[0], params_np)

            extra_specs = []
        else:

            def kernel(t_ref, dt_ref, s_ref, tab_ref, o_ref):
                o_ref[:] = _call_fun(
                    s_ref[:], t_ref[0], dt_ref[0], params_np, tab_ref[:]
                )

            extra_specs = [tab_spec]

        call = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((S, Bm, LANE), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            ]
            + extra_specs,
            out_specs=pl.BlockSpec((S, Bm, LANE), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((S, m, LANE), dtype),
            # states in/out share a buffer: without this XLA double-buffers
            # the scan carry around the opaque call (measured ~84 us/step of
            # pure copies at 442k nodes)
            input_output_aliases={2: 0},
            interpret=interpret,
        )

        @jax.jit
        def step(states, t, dt):
            if blocked_io:
                blocks = states
            elif pad:
                # replicate node 0 into the padding so model math stays finite
                fill = jnp.broadcast_to(states[:, :1], (S, pad))
                blocks = jnp.concatenate([states, fill], axis=1).reshape(S, m, LANE)
            else:
                blocks = states.reshape(S, m, LANE)
            t_arr = jnp.reshape(t, (1,)).astype(dtype)
            dt_arr = jnp.reshape(dt, (1,)).astype(dtype)
            args = (t_arr, dt_arr, blocks)
            if tables_np is not None:
                args = args + (jnp.asarray(tables_np),)
            out = call(*args)
            if blocked_io:
                return out
            out = out.reshape(S, n_pad)
            return out[:, :n_nodes] if pad else out

        return step

    vi = int(v_index)
    NP = node_params

    def _inject_v(s, v):
        # Mosaic rejects zero-size slices: only emit non-empty parts
        parts = []
        if vi > 0:
            parts.append(s[:vi])
        parts.append(v[None])
        if vi + 1 < S:
            parts.append(s[vi + 1 :])
        return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)

    if NP is None:

        if tables_np is None:

            def kernel_v(t_ref, dt_ref, s_ref, v_ref, o_ref):
                s = _inject_v(s_ref[:], v_ref[:])
                o_ref[:] = _call_fun(s, t_ref[0], dt_ref[0], params_np)

            extra_specs = []
        else:

            def kernel_v(t_ref, dt_ref, s_ref, v_ref, tab_ref, o_ref):
                s = _inject_v(s_ref[:], v_ref[:])
                o_ref[:] = _call_fun(s, t_ref[0], dt_ref[0], params_np, tab_ref[:])

            extra_specs = [tab_spec]

        in_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((S, Bm, LANE), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Bm, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ] + extra_specs
    else:

        if tables_np is None:

            def kernel_v(t_ref, dt_ref, s_ref, v_ref, p_ref, o_ref):
                s = _inject_v(s_ref[:], v_ref[:])
                o_ref[:] = _call_fun(s, t_ref[0], dt_ref[0], p_ref[:])

            extra_specs = []
        else:

            def kernel_v(t_ref, dt_ref, s_ref, v_ref, p_ref, tab_ref, o_ref):
                s = _inject_v(s_ref[:], v_ref[:])
                o_ref[:] = _call_fun(s, t_ref[0], dt_ref[0], p_ref[:], tab_ref[:])

            extra_specs = [tab_spec]

        in_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((S, Bm, LANE), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Bm, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((NP, Bm, LANE), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
        ] + extra_specs

    call_v = pl.pallas_call(
        kernel_v,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((S, Bm, LANE), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, m, LANE), dtype),
        # alias the states operand with the output (see v_index=None note)
        input_output_aliases={2: 0},
        interpret=interpret,
    )

    def _padded(states, v):
        if blocked_io:
            return states, v.reshape(m, LANE)
        return _block_rows(states, S, m, pad), _block_vec(v, m, pad)

    def _unblock(out):
        if blocked_io:
            return out
        return _unblock_rows(out, S, n_nodes, pad)

    tab_tail = () if tables_np is None else (jnp.asarray(tables_np),)

    if NP is None:

        @jax.jit
        def step_v(states, v, t, dt):
            blocks, vblocks = _padded(states, v)
            t_arr = jnp.reshape(t, (1,)).astype(dtype)
            dt_arr = jnp.reshape(dt, (1,)).astype(dtype)
            return _unblock(call_v(t_arr, dt_arr, blocks, vblocks, *tab_tail))

        return step_v

    @jax.jit
    def step_vp(states, v, params_node, t, dt):
        blocks, vblocks = _padded(states, v)
        if blocked_io:
            pblocks = params_node  # pre-blocked (NP, m, LANE) by the caller
        else:
            pblocks = _block_rows(params_node, NP, m, pad)
        t_arr = jnp.reshape(t, (1,)).astype(dtype)
        dt_arr = jnp.reshape(dt, (1,)).astype(dtype)
        return _unblock(call_v(t_arr, dt_arr, blocks, vblocks, pblocks, *tab_tail))

    return step_vp


def build_pallas_multi_ode_step(
    multi: dict,
    masks_np: np.ndarray,
    num_states: int,
    n_nodes: int,
    dtype,
    v_index: int,
    interpret: bool | None = None,
    blocked_io: bool = False,
):
    """Block-skip multi-marker ionic step: one pallas kernel where EACH
    grid block evaluates only the models whose marker is present in it.

    ``blocked_io``: as in :func:`build_pallas_ode_step` — states in/out as
    ``(S, m, LANE)``, masks pre-blocked ``(NM, m, LANE)``, ``v`` flat.

    The masked composition (:func:`~fenicsx_beat_tpu.odesolver.
    make_multi_ode`) is compiler-friendly but pays n_models x the ionic
    FLOPs on every node.  Markers in practice are spatially banded
    (transmural layers, scar regions), so in a lexicographic/RCM node
    order most kernel blocks contain a single marker: a host-precomputed
    ``active[model, block]`` table (SMEM) gates each model's evaluation
    with ``pl.when``, making a block-coherent two-marker mesh cost ~1.0x
    a single-marker one instead of 2x (the reference's per-marker
    ``ODESystemSolver``s step only their own nodes, odesolver.py:228-354
    there — this is the TPU equivalent without breaking the stencil node
    order).

    ``masks_np``: host ``[n_models, n_nodes]`` bool/0-1 masks (already
    padded/aligned with the solver's node axis).  Signature matches the
    ``node_params`` variant: ``step(states, v, params_node, t, dt)`` where
    ``params_node`` carries the same masks device-side.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    S = num_states
    m, Bm, grid, n_pad, pad = _block_geometry(S, n_nodes, dtype, blocked_io)
    vi = int(v_index)

    funs = multi["funs"]
    model_params = [None if p is None else np.asarray(p, dtype=np.float64) for p in multi["params"]]
    sizes = multi["sizes"]
    swaps = multi["swaps"]
    trivial = multi["trivial_swap"]
    NM = len(funs)

    # host active table [NM, n_blocks]: pad columns replicate node 0's
    # marker (same rule the solvers use), so pad blocks stay consistent
    mpad = np.zeros((NM, n_pad), dtype=bool)
    mpad[:, :n_nodes] = np.asarray(masks_np[:, :n_nodes], dtype=bool)
    if pad:
        mpad[:, n_nodes:] = np.asarray(masks_np[:, :1], dtype=bool)
    active_np = (
        mpad.reshape(NM, m // Bm, Bm * LANE).any(axis=-1).astype(np.int32)
    )

    def _row_permute(s, perm):
        # static-slice row permutation (Mosaic-safe; no gathers)
        return jnp.concatenate([s[int(k) : int(k) + 1] for k in perm], axis=0)

    def kernel(t_ref, dt_ref, active_ref, s_ref, v_ref, p_ref, o_ref):
        gid = pl.program_id(0)
        s_full = s_ref[:]  # (S, Bm, LANE)
        # inject the live PDE voltage row
        parts = []
        if vi > 0:
            parts.append(s_full[:vi])
        parts.append(v_ref[:][None])
        if vi + 1 < S:
            parts.append(s_full[vi + 1 :])
        s_full = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
        o_ref[:] = s_full  # models overlay their own nodes below
        t = t_ref[0]
        dt = dt_ref[0]
        for i in range(NM):
            S_m = int(sizes[i])

            def _run(i=i, S_m=S_m):
                s_model = s_full[:S_m]
                if not trivial[i]:
                    s_model = _row_permute(s_model, swaps[i])
                y = funs[i](states=s_model, t=t, parameters=model_params[i], dt=dt)
                if not trivial[i]:
                    y = _row_permute(y, swaps[i])
                keep = p_ref[i] != 0  # (Bm, LANE)
                o_ref[:S_m] = jnp.where(keep[None], y.astype(s_full.dtype), o_ref[:S_m])

            pl.when(active_ref[i, gid] != 0)(_run)

    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # t
            pl.BlockSpec(memory_space=pltpu.SMEM),  # dt
            pl.BlockSpec(memory_space=pltpu.SMEM),  # active [NM, n_blocks]
            pl.BlockSpec((S, Bm, LANE), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Bm, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((NM, Bm, LANE), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((S, Bm, LANE), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, m, LANE), dtype),
        # alias the states operand with the output (see build_pallas_ode_step)
        input_output_aliases={3: 0},
        interpret=interpret,
    )

    @jax.jit
    def step_vp(states, v, params_node, t, dt):
        if blocked_io:
            sblocks = states
            vblocks = v.reshape(m, LANE)
            pblocks = params_node  # pre-blocked (NM, m, LANE)
        else:
            sblocks = _block_rows(states, S, m, pad)
            vblocks = _block_vec(v, m, pad)
            pblocks = _block_rows(params_node, NM, m, pad)
        t_arr = jnp.reshape(t, (1,)).astype(dtype)
        dt_arr = jnp.reshape(dt, (1,)).astype(dtype)
        out = call(
            t_arr,
            dt_arr,
            jnp.asarray(active_np),  # small numpy constant, embeds in the module
            sblocks,
            vblocks,
            pblocks,
        )
        if blocked_io:
            return out
        return _unblock_rows(out, S, n_nodes, pad)

    return step_vp
