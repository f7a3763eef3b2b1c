"""Fused on-device splitting solver — the TPU performance path.

The object-oriented :class:`~fenicsx_beat_tpu.monodomain_solver.
MonodomainSplittingSolver` replicates the reference's per-step host
choreography (``monodomain_solver.py:53-116``): 8+ host->device
transitions per step.  This module compiles the ENTIRE time loop --
ionic Rush-Larsen step, voltage exchange, theta-rule CG solve, activation
tracking -- into one ``jax.lax.scan`` per save interval, so a whole
simulation runs with zero host round-trips except at save points.

Requirements of the fused path (the standard production configuration):
the ODE space equals the PDE space (P1 nodes), and the ionic RHS is
jax-traceable.  Everything else (transfer adapters, multi-space) stays on
the OO path.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from . import fem
from .base_model import Status, _as_expr, _transform_I_s
from .config import default_dtype
from .conductivities import as_cell_tensors
from .mesh import Mesh
from .ops.cg import CGInfo, cg
from .stimulation import dx as dx_measure
from .telemetry import BaseMonitor, NullMonitor

__all__ = ["FusedMonodomainSolver"]

logger = logging.getLogger(__name__)


@dataclass
class FusedMonodomainSolver:
    """Monodomain operator-splitting solver fully fused under jit.

    Parameters
    ----------
    mesh : Mesh
    M : conductivity spec (scalar / tensor / ConductivityTensor)
    ode_fun : jax-traceable ``fun(states, t, parameters, dt) -> states``
        over a (num_states, n_nodes) array (the reference ODE contract,
        ``odesolver.py:67-79``).
    init_states : (num_states,) or (num_states, n_nodes)
    parameters : model parameter vector (or None)
    v_index : voltage row in the state array
    I_s : Stimulus | list[Stimulus] | callable
    theta : 1.0 Godunov / 0.5 Strang (``monodomain_solver.py:94-113``)
    C_m, dt-independent set-up mirrors MonodomainModel.
    """

    mesh: Mesh
    M: Any
    ode_fun: Callable
    init_states: np.ndarray
    parameters: np.ndarray | None
    v_index: int = 0
    I_s: Any = None
    theta: float = 1.0  # splitting scheme (Godunov 1.0 / Strang 0.5)
    pde_theta: float = 0.5  # PDE time discretization (reference default
    # parameters use Crank-Nicolson regardless of the splitting theta,
    # base_model.py:158-168)
    C_m: float = 1.0
    params: dict | None = None
    monitor: BaseMonitor = None  # type: ignore[assignment]
    activation_threshold: float = 0.0
    dtype: Any = None
    probe_points: Any = None  # [np, gdim] physical probe coordinates
    ode_markers: Any = None  # per-node marker array/Function: multi-model
    use_pallas_ode: bool | None = None  # None = auto (TPU backend only)
    pallas_spmv_min_nodes: int = 4096  # below this the XLA stencil SpMV wins
    operator_cache_key: str | None = None  # opt-in disk cache of assembly
    # Strang (theta=0.5) only: regroup adjacent ionic half-steps into one
    # full-dt step per chunk interior — same 2nd-order splitting, ~the
    # ionic cost of Godunov.  Off by default: the reference's unmerged
    # choreography (monodomain_solver.py:99-113 there) is the
    # cross-validation target of tests/test_fused.py.
    merge_strang_halves: bool = False

    def __post_init__(self):
        self.monitor = self.monitor or NullMonitor()
        self.dtype = self.dtype or default_dtype()
        p = {
            "quadrature_degree": 4,
            "ksp_rtol": 1e-8 if self.dtype == jnp.float64 else 1e-6,
            "ksp_atol": 1e-10 if self.dtype == jnp.float64 else 1e-7,
            "ksp_max_it": 1000,
        }
        p.update(self.params or {})
        self._opts = p

        self.V = fem.functionspace(self.mesh, ("P", 1))
        n = self.V.ndofs

        # multi-marker ionic models (DolfinMultiODESolver semantics,
        # reference odesolver.py:228-354): dicts keyed by marker compose
        # into one traceable step whose `parameters` are the node masks
        self._ode_masks = None
        if isinstance(self.ode_fun, dict):
            if self.ode_markers is None:
                raise ValueError("dict-valued ode_fun requires ode_markers")
            from .odesolver import make_multi_ode

            markers = (
                self.ode_markers.x.array
                if hasattr(self.ode_markers, "x")
                else self.ode_markers
            )
            markers = np.asarray(markers).astype(np.int64)
            if markers.shape[0] != n:
                raise ValueError(
                    f"ode_markers has {markers.shape[0]} entries, expected {n}"
                )
            (
                self.ode_fun,
                self.init_states,
                self._ode_masks,
                self.v_index,
            ) = make_multi_ode(
                markers,
                self.ode_fun,
                self.init_states,
                self.parameters,
                self.v_index,
                dtype=self.dtype,
            )
            self.parameters = None  # masks travel as the traced parameters

        M_cells = as_cell_tensors(self.M, self.mesh)
        # shared stencil-first assembly (fem.assemble_mass_stiffness_auto):
        # direct stencil on structured meshes — no COO sort, no [nc,4,4]
        # element tensor (the generic pipeline needs >30 min of host time
        # at the 20M-cell dx=0.05 resolution) — generic ELL otherwise
        self._mass, self._stiff = fem.assemble_mass_stiffness_auto(
            self.V, M_cells, dtype=self.dtype, cache_key=self.operator_cache_key
        )

        from .stimulation import TimeWindow

        stimuli = _transform_I_s(self.I_s, dZ=dx_measure(self.mesh))
        self._stim_quads = []
        for s in stimuli:
            ents = s.dz.entities()
            if len(ents) == 0:
                continue
            if s.dz.integral_type() == "cell":
                quad = fem.cell_quadrature(self.V, ents, degree=p["quadrature_degree"], dtype=self.dtype)
            else:
                quad = fem.facet_quadrature(self.V, ents, degree=p["quadrature_degree"], dtype=self.dtype)
            # TimeWindow amplitudes become traced per-chunk arguments so
            # Stimulus.assign takes effect at the next chunk
            if isinstance(s.expr, TimeWindow):
                self._stim_quads.append((quad, s.expr.indicator, s))
            else:
                self._stim_quads.append((quad, _as_expr(s.expr), None))

        # Padded fast path: with the Pallas kernels active on a stencil
        # operator, the whole node axis is padded to a kernel-friendly
        # multiple of 1024 so NO per-step pad/reshape/slice wrappers are
        # needed (measured ~0.3 ms/step of pure data movement at 442k
        # nodes otherwise).  Padding rows are inert: operator rows are
        # zero (mass diag 1 keeps Jacobi-CG finite), states replicate
        # node 0 so the ionic math stays finite.
        from .ops.sparse import StencilMatrix

        use_pallas = self.use_pallas_ode
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        self._use_pallas = use_pallas
        self._lane_gather = False  # set when the paged unstructured SpMV engages
        self._n = n
        if use_pallas and isinstance(self._mass, StencilMatrix):
            # shared pad_stencil_pair rule: large meshes round to 512-row
            # kernel blocks so the CG kernels' grids divide exactly and no
            # wrapper copies are needed
            from .ops.sparse import pad_stencil_pair

            self._mass, self._stiff, self._n_pad = pad_stencil_pair(
                self._mass, self._stiff, n
            )
        else:
            self._n_pad = n
        pad = self._n_pad - n

        init = np.asarray(self.init_states, dtype=np.float64)
        if init.ndim == 1:
            states = np.tile(init[:, None], (1, self._n_pad))
        else:
            states = init.copy()
            if pad:
                states = np.concatenate(
                    [states, np.tile(states[:, :1], (1, pad))], axis=1
                )
        self.states = jnp.asarray(states, dtype=self.dtype)
        self.activation_time = jnp.full((self._n_pad,), -1.0, dtype=self.dtype)
        # numpy-backed closures throughout (device-array jit constants are
        # pulled back to host at lowering; ruinous over a remote-TPU tunnel)
        npdt = np.dtype(jnp.dtype(self.dtype).name)
        if self._ode_masks is not None:
            masks = self._ode_masks
            if pad:
                masks = np.concatenate([masks, np.tile(masks[:, :1], (1, pad))], axis=1)
            self._params_j = np.asarray(masks)
        elif self.parameters is not None and np.ndim(self.parameters) == 2:
            pvals = np.asarray(self.parameters, dtype=np.float64)
            if pad:
                pvals = np.concatenate([pvals, np.tile(pvals[:, :1], (1, pad))], axis=1)
            self._params_j = pvals.astype(npdt)
        else:
            self._params_j = (
                None if self.parameters is None else np.asarray(self.parameters, dtype=npdt)
            )
        if self.probe_points is not None:
            pdofs, pw = fem.point_evaluation_tables(self.V, np.asarray(self.probe_points))
            self._probe_tables = (np.asarray(pdofs), np.asarray(pw, dtype=npdt))
        else:
            self._probe_tables = None
        self._build_kernels()

    # ------------------------------------------------------------------
    def _build_kernels(self):
        mass, stiff = self._mass, self._stiff
        theta = float(self.theta)
        pde_theta = float(self.pde_theta)
        merged = bool(self.merge_strang_halves) and np.isclose(theta, 0.5)
        if self.merge_strang_halves and not merged:
            logger.warning(
                "merge_strang_halves requires theta=0.5 (got %g); ignored",
                theta,
            )
        C_m = float(self.C_m)
        rtol = float(self._opts["ksp_rtol"])
        atol = float(self._opts["ksp_atol"])
        maxiter = int(self._opts["ksp_max_it"])
        stim_quads = self._stim_quads
        v_index = self.v_index
        thr = float(self.activation_threshold)

        # single-kernel VMEM-resident ionic step: ~2.3x less HBM traffic
        # than the multi-fusion XLA lowering at production node counts
        use_pallas = self._use_pallas
        params_closure = self._params_j
        jnp_ode_fun = self.ode_fun

        # Device-resident operands, threaded through the jitted chunk as an
        # ARGUMENT pytree.  Closure constants are wrong for both directions
        # on a remote-TPU (axon) backend: device-array constants are pulled
        # back to host at lowering (measured 0.1 MB/s), and large numpy
        # constants embedded in the module are re-shipped per execution
        # (measured ~22 s/chunk for the 33 MB dx=0.1 operator streams).
        operands = {}

        def ode_apply(op, states, v, t, dt):
            """Ionic step with the live voltage row injected — the jnp
            fallback pays the row update; the pallas kernel absorbs it."""
            states = states.at[v_index].set(v)
            return jnp_ode_fun(states=states, t=t, parameters=params_closure, dt=dt)

        # With the pallas ionic kernel active, the scan carries states in
        # the kernel's (S, m, LANE) block layout: the (S, n) <-> blocked
        # conversion is a physical TPU relayout that XLA materializes on
        # both sides of the opaque call (~84 us/step at 442k nodes), so it
        # runs ONCE per chunk instead of once per ionic sub-step.
        ode_blocked = False
        LANE_ODE = 128
        m_blk = self._n_pad // LANE_ODE

        if use_pallas:
            from .ops.pallas_ode import build_pallas_ode_step

            blocked = self._n_pad % (8 * LANE_ODE) == 0
            # node-aligned parameters (multi-marker masks, per-node fields)
            # are streamed into the kernel per block; plain vectors are
            # baked as immediates
            node_aligned = (
                self._params_j is not None
                and getattr(self._params_j, "ndim", 0) == 2
                and self._params_j.shape[-1] == self._n_pad
            )
            try:
                S = self.states.shape[0]
                s_shape = (
                    (S, m_blk, LANE_ODE) if blocked else (S, self._n_pad)
                )
                if node_aligned:
                    params_dev = self._params_j.astype(self.dtype)
                    NP = params_dev.shape[0]
                    p_shape = (
                        (NP, m_blk, LANE_ODE) if blocked else (NP, self._n_pad)
                    )
                    multi = getattr(self.ode_fun, "multi", None)
                    if multi is not None and NP == len(multi["funs"]):
                        # multi-marker masks: block-skip kernel — each grid
                        # block evaluates only the models present in it
                        from .ops.pallas_ode import build_pallas_multi_ode_step

                        pallas_step = build_pallas_multi_ode_step(
                            multi,
                            masks_np=self._params_j,
                            num_states=S,
                            n_nodes=self._n_pad,
                            dtype=self.dtype,
                            v_index=v_index,
                            blocked_io=blocked,
                        )
                    else:
                        pallas_step = build_pallas_ode_step(
                            self.ode_fun,
                            num_states=S,
                            n_nodes=self._n_pad,
                            parameters=None,
                            dtype=self.dtype,
                            v_index=v_index,
                            node_params=NP,
                            blocked_io=blocked,
                        )
                    # Force Mosaic lowering now so a model the kernel
                    # language cannot express degrades to the plain jnp
                    # path instead of crashing on the first chunk.
                    jax.jit(pallas_step).lower(
                        jax.ShapeDtypeStruct(s_shape, self.dtype),
                        jax.ShapeDtypeStruct((self._n_pad,), self.dtype),
                        jax.ShapeDtypeStruct(p_shape, self.dtype),
                        jax.ShapeDtypeStruct((), self.dtype),
                        jax.ShapeDtypeStruct((), self.dtype),
                    ).compile()

                    pvals = np.asarray(params_dev).reshape(p_shape)
                    operands["node_params"] = jax.device_put(jnp.asarray(pvals))

                    def ode_apply(op, states, v, t, dt):  # noqa: F811
                        return pallas_step(states, v, op["node_params"], t, dt)

                else:
                    pallas_step = build_pallas_ode_step(
                        self.ode_fun,
                        num_states=S,
                        n_nodes=self._n_pad,  # kernel-aligned: no wrappers
                        parameters=self.parameters,
                        dtype=self.dtype,
                        v_index=v_index,
                        blocked_io=blocked,
                    )
                    jax.jit(pallas_step).lower(
                        jax.ShapeDtypeStruct(s_shape, self.dtype),
                        jax.ShapeDtypeStruct((self._n_pad,), self.dtype),
                        jax.ShapeDtypeStruct((), self.dtype),
                        jax.ShapeDtypeStruct((), self.dtype),
                    ).compile()

                    def ode_apply(op, states, v, t, dt):  # noqa: F811
                        return pallas_step(states, v, t, dt)

                ode_blocked = blocked
            except Exception as exc:  # Mosaic/lowering failure: degrade
                logger.warning(
                    "pallas ionic kernel unavailable (%s); falling back to "
                    "the plain jnp ODE path",
                    exc,
                )

        # operator application: pallas single-pass stencil SpMV on TPU
        # (operand resident in VMEM), XLA stencil/ELL otherwise
        from .ops.sparse import StencilMatrix

        use_pallas_spmv = (
            use_pallas
            and isinstance(mass, StencilMatrix)
            and mass.shape[0] >= self.pallas_spmv_min_nodes
        )
        if use_pallas_spmv:
            from .ops.pallas_spmv import (
                LANE,
                build_pallas_stencil_spmv,
                build_pallas_stencil_spmv_streamed,
                build_pallas_stencil_spmv_sym,
                stencil_is_symmetric,
            )

            n_dofs = mass.shape[0]  # padded size; pad rows are inert
            # The VMEM-resident kernels pin the whole padded operand in
            # VMEM; beyond ~2M nodes that exceeds the 16 MB scoped budget,
            # so large meshes use the HBM-streamed window variant (same
            # math, bit-identical, DMA per block).
            operand_bytes = (-(-n_dofs // LANE)) * LANE * jnp.dtype(self.dtype).itemsize
            streamed = operand_bytes > 8 * 1024 * 1024
            _spmv = None
            if not streamed and stencil_is_symmetric(
                mass.offsets, np.asarray(mass.vals)
            ) and stencil_is_symmetric(stiff.offsets, np.asarray(stiff.vals)):
                # FEM mass/stiffness are symmetric: stream only the d >= 0
                # value columns (the dominant HBM traffic of the PCG) and
                # derive sub-diagonal terms from shifted products
                try:
                    _spmv = build_pallas_stencil_spmv_sym(
                        mass.offsets, n_dofs, self.dtype
                    )
                except ValueError:
                    _spmv = None
            if _spmv is None:
                builder = (
                    build_pallas_stencil_spmv_streamed
                    if streamed
                    else build_pallas_stencil_spmv
                )
                _spmv = builder(mass.offsets, n_dofs, self.dtype)
                k0 = mass.offsets.index(0)
            else:
                k0 = _spmv.positive_offsets.index(0)
            # packed value streams ride in the operand pytree (device)
            operands["mT"] = jax.device_put(
                jnp.asarray(_spmv.pack_values(np.asarray(mass.vals)))
            )
            operands["kT"] = jax.device_put(
                jnp.asarray(_spmv.pack_values(np.asarray(stiff.vals)))
            )

            def build_operators(op, dt):
                A_T = C_m * op["mT"] + (pde_theta * dt) * op["kT"]
                B_T = C_m * op["mT"] - ((1.0 - pde_theta) * dt) * op["kT"]
                diag = A_T[k0].reshape(-1)[:n_dofs]
                return (A_T, B_T, diag)

            def apply_A(ops, u):
                return _spmv(ops[0], u)

            def apply_B(ops, u):
                return _spmv(ops[1], u)

        else:
            mass_dev, stiff_dev = mass, stiff
            if (
                use_pallas
                and not isinstance(mass, StencilMatrix)
                and mass.shape[0] >= self.pallas_spmv_min_nodes
            ):
                # unstructured TPU path: repack the ELL pair into the
                # paged lane-gather format (ops/pallas_ell.py) — the XLA
                # gather behind the plain ELL SpMV measures ~1 GB/s
                # effective on the chip (26.8 ms per application at the
                # 243k-node LV vs 0.66 ms for the paged kernel)
                from .ops.pallas_ell import LaneGatherMatrix

                try:
                    mass_dev, stiff_dev = LaneGatherMatrix.from_operator_pair(
                        mass, stiff, dtype=self.dtype
                    )
                    self._lane_gather = True
                except Exception as exc:
                    logger.warning(
                        "lane-gather SpMV unavailable (%s); using the XLA "
                        "ELL matvec", exc,
                    )
            operands["mass"] = mass_dev.to_device()
            operands["stiff"] = stiff_dev.to_device()

            def build_operators(op, dt):
                A = op["mass"].combine(C_m, op["stiff"], pde_theta * dt)
                B = op["mass"].combine(C_m, op["stiff"], -(1.0 - pde_theta) * dt)
                return (A, B, A.diagonal())

            def apply_A(ops, u):
                return ops[0] @ u

            def apply_B(ops, u):
                return ops[1] @ u

        n_pad_load = self._n_pad - self._n
        if n_pad_load:
            # padding rows are inert (residual 0 by construction) but must
            # not inflate ||b|| and loosen the relative CG tolerance; the
            # mask is generated on device inside the trace (no constant)
            def cg_dot(a, b):
                _mask = (jnp.arange(a.shape[0]) < self._n).astype(a.dtype)
                return jnp.vdot(a * _mask, b)

        else:
            cg_dot = None

        # TimeWindow stimuli are separable (purely temporal window x fixed
        # spatial load): precompute the unit load vector once — the
        # per-step quadrature scatter-add it replaces measured ~570 us/step
        # at 442k nodes (scatters serialize on the VPU)
        from .stimulation import separable_stimulus_terms

        stim_terms, b_units_np = separable_stimulus_terms(stim_quads)
        if b_units_np:
            npdt = np.dtype(jnp.dtype(self.dtype).name)
            stack = np.stack(b_units_np).astype(npdt)
            if n_pad_load:
                stack = np.pad(stack, ((0, 0), (0, n_pad_load)))
            # unit loads ride in the operand pytree as one device array
            operands["b_units"] = jax.device_put(jnp.asarray(stack))

        def _assemble_rhs(op, ops, v_prev, t, dt, amps):
            b = apply_B(ops, v_prev)
            for i, quad, expr, b_idx, window in stim_terms:
                if b_idx is not None:
                    start, dur = window
                    on = jnp.where((t >= start) & (t <= start + dur), 1.0, 0.0)
                    b = b + (dt * amps[i] * on) * op["b_units"][b_idx]
                else:
                    load = quad.assemble_load(expr, t)
                    if n_pad_load:
                        load = jnp.concatenate(
                            [load, jnp.zeros((n_pad_load,), dtype=load.dtype)]
                        )
                    b = b + (dt * amps[i]) * load
            return b

        if use_pallas_spmv:
            # fully-fused PCG: spmv+pAp, update(x,r,z)+<r,z>+<r,r>, and the
            # search-direction axpy each run as single pallas kernels
            # (~3 HBM passes/iteration instead of ~7 under XLA)
            from .ops.pallas_cg import build_pallas_axpy, build_pallas_cg_update

            _update = build_pallas_cg_update(n_dofs, self.dtype)
            _axpy = build_pallas_axpy(n_dofs, self.dtype)
            _dot = cg_dot or (lambda a, b: jnp.vdot(a, b))

            def pde_solve(op, ops, v_prev, x0, t, dt, amps):
                A_T = ops[0]
                minv = 1.0 / ops[2]
                b = _assemble_rhs(op, ops, v_prev, t, dt, amps)
                r0 = b - _spmv(A_T, x0)
                z0 = r0 * minv
                rz0 = _dot(r0, z0)
                rr0 = _dot(r0, r0)
                bnorm2 = _dot(b, b)
                tol2 = jnp.maximum(rtol * jnp.sqrt(bnorm2), atol) ** 2

                def cond(s):
                    _, _, _, _, rr, k = s
                    return jnp.logical_and(k < maxiter, rr > tol2)

                def body(s):
                    x, r, p, rz, rr, k = s
                    Ap, pAp = _spmv.spmv_dot(A_T, p)
                    alpha = rz / pAp
                    x, r, z, rz_new, rr = _update(x, r, p, Ap, minv, alpha)
                    beta = rz_new / rz
                    p = _axpy(z, p, beta)
                    return (x, r, p, rz_new, rr, k + 1)

                init = (x0, r0, z0, rz0, rr0, jnp.asarray(0, dtype=jnp.int32))
                x, r, p, rz, rr, k = jax.lax.while_loop(cond, body, init)
                return x, k, jnp.sqrt(rr), rr <= tol2

        else:

            def pde_solve(op, ops, v_prev, x0, t, dt, amps):
                b = _assemble_rhs(op, ops, v_prev, t, dt, amps)
                x, info = cg(
                    lambda u: apply_A(ops, u),
                    b,
                    x0,
                    precond_diag=ops[2],
                    rtol=rtol,
                    atol=atol,
                    maxiter=maxiter,
                    dot=cg_dot,
                )
                return x, info.iterations, info.residual_norm, info.converged

        n_pad_l = self._n_pad

        if ode_blocked:

            def _blk(s):
                return s.reshape(s.shape[0], m_blk, LANE_ODE)

            def _unblk(s):
                return s.reshape(s.shape[0], n_pad_l)

            def _vrow(s):
                return s[v_index].reshape(n_pad_l)

            def _vset(s, v):
                return s.at[v_index].set(v.reshape(m_blk, LANE_ODE))

        else:

            def _blk(s):
                return s

            def _unblk(s):
                return s

            def _vrow(s):
                return s[v_index]

            def _vset(s, v):
                return s.at[v_index].set(v)

        @partial(jax.jit, static_argnames=("n_steps",))
        def run_chunk_ops(op, states, act, t0, dt, amps, n_steps):
            # theta-system operators are dt-invariant within the chunk:
            # build once, outside the scan
            ops = build_operators(op, dt)
            # blocked-ionic carry: one relayout per chunk, not per step
            states = _blk(states)

            def one_step(carry, k):
                # the PDE-updated voltage rides as a separate carry row and
                # is injected inside the ionic kernel, skipping the
                # full-state row update between PDE and ionic stages
                states, act, t, dv, v_cur = carry
                if merged:
                    # Merged Strang: adjacent corrective+tentative ionic
                    # half-steps regroup into ONE full-dt ionic step —
                    # A(dt/2) [B(dt) A(dt)]^{n-1} B(dt) A(dt/2) per chunk —
                    # halving the ionic cost of interior steps while each
                    # chunk remains an exact Strang composition.
                    tent_dt = jnp.where(k == 0, 0.5 * dt, dt)
                else:
                    tent_dt = theta * dt
                # tentative ODE step (monodomain_solver.py:68)
                states = ode_apply(op, states, v_cur, t, tent_dt)
                v = _vrow(states)
                if merged:
                    # Midpoint activation sampling: the previous interior
                    # step's TRUE Strang observation is A(dt/2) applied to
                    # its post-PDE state.  The voltage row advances by
                    # forward Euler (v' = v + dt*f_v with f_v frozen at the
                    # step's start), so that sample's voltage is exactly
                    #   A(dt/2).v = v_cur + (dt/2) f_v = (v_cur + v)/2
                    # — the midpoint of the carried post-PDE voltage and
                    # this step's post-A(dt) voltage, for free.  Without
                    # this, thresholding the post-PDE samples reads the
                    # half-shifted composition A(-dt/2)*Strang_k and the
                    # measured activation error collapses to Godunov's
                    # (docs/DESIGN.md §8).
                    v_mid = 0.5 * (v_cur + v)
                    act = jnp.where(
                        (k > 0) & (v_mid > thr) & (act < 0), t - dt, act
                    )
                # PDE theta-step over dt; stimulus evaluated at the PDE
                # theta point (reference base_model.py:219); CG warm-started
                # with the previous step's solve increment (the trajectory
                # is smooth in time, so v + dv is a better x0 than v)
                v_new, iters, rnorm, conv = pde_solve(
                    op, ops, v, v + dv, t + pde_theta * dt, dt, amps
                )
                dv = v_new - v
                if not merged and not np.isclose(theta, 1.0):
                    # corrective ODE step (Strang, monodomain_solver.py:99-113)
                    states = ode_apply(op, states, v_new, t + theta * dt, (1.0 - theta) * dt)
                    v_new = _vrow(states)
                t_next = t + dt
                if not merged:
                    act = jnp.where((v_new > thr) & (act < 0), t, act)
                # merged: interior steps are observed as midpoints at the
                # NEXT step (above); the trailing A(dt/2) close runs ONCE
                # after the scan (a lax.cond inside the scan would sever the
                # states buffer's aliasing chain and re-introduce a full
                # states copy per step)
                return (states, act, t_next, dv, v_new), (iters, rnorm, conv)

            v0 = _vrow(states)
            dv0 = jnp.zeros_like(v0)
            (states, act, t, _, v_last), (iters, rnorms, convs) = jax.lax.scan(
                one_step,
                (states, act, t0, dv0, v0),
                jnp.arange(n_steps),
            )
            if merged:
                # trailing A(dt/2) closes the chunk's Strang composition;
                # its voltage is the chunk-final step's direct sample
                states = ode_apply(op, states, v_last, t, 0.5 * dt)
                v_last = _vrow(states)
                act = jnp.where((v_last > thr) & (act < 0), t - dt, act)
            # one voltage-row write-back per chunk instead of per step
            states = _unblk(_vset(states, v_last))
            # real per-chunk linear-solver stats (reference records the KSP
            # converged_reason per solve, telemetry.py:67-76 there)
            return (
                states,
                act,
                t,
                jnp.max(iters),
                jnp.sum(iters),
                rnorms[-1],
                jnp.all(convs),
            )

        self._operands = operands

        def run_chunk(states, act, t0, dt, amps, n_steps):
            return run_chunk_ops(self._operands, states, act, t0, dt, amps, n_steps)

        self._run_chunk = run_chunk
        self._run_chunk_ops = run_chunk_ops
        probe_tables = self._probe_tables

        @partial(jax.jit, static_argnames=("n_steps",))
        def run_chunk_probed_ops(op, states, act, t0, dt, amps, n_steps):
            """One invocation returning probe activation values too — keeps
            host round-trips (the tunnel latency) to one per chunk."""
            states, act, t, it_max, it_sum, rnorm, conv = run_chunk_ops(
                op, states, act, t0, dt, amps, n_steps
            )
            pdofs, pw = probe_tables
            probes = jnp.sum(act[pdofs] * pw, axis=1)
            return states, act, t, it_max, it_sum, rnorm, conv, probes

        def run_chunk_probed(states, act, t0, dt, amps, n_steps):
            return run_chunk_probed_ops(
                self._operands, states, act, t0, dt, amps, n_steps
            )

        self._run_chunk_probed = run_chunk_probed if probe_tables is not None else None

    # ------------------------------------------------------------------
    def stimulus_amplitudes(self) -> jnp.ndarray:
        """Live amplitude vector (read each chunk; 1.0 for non-TimeWindow
        exprs whose value is baked into the traced callable)."""
        amps = [
            float(stim.expr.amplitude) if stim is not None else 1.0
            for _, _, stim in self._stim_quads
        ]
        return jnp.asarray(amps or [0.0], dtype=self.dtype)

    @property
    def v(self) -> jnp.ndarray:
        return self.states[self.v_index, : self._n]

    def _check_fixed_dt(self, dt: float) -> None:
        """Table-driven ionic models bake their sub-step dt at build time
        and ignore the runtime value — guard against a silent mismatch.

        The splitting scheme determines which ionic sub-steps occur: Godunov
        takes one ``theta*dt = dt`` step, Strang two ``dt/2`` steps (a single
        baked dt covers both), merged Strang additionally takes full-dt
        interior steps."""
        fixed = getattr(self.ode_fun, "fixed_dt", None)
        if fixed is None:
            return
        theta = float(self.theta)
        if self.merge_strang_halves and np.isclose(theta, 0.5):
            subs = {0.5 * dt, float(dt)}
        elif np.isclose(theta, 1.0):
            subs = {float(dt)}
        else:
            subs = {theta * dt, (1.0 - theta) * dt}
        bad = [s for s in subs if not np.isclose(s, float(fixed), rtol=1e-10)]
        if bad:
            raise ValueError(
                f"ode_fun bakes dt={fixed} but the {theta=} splitting at "
                f"dt={dt} takes ionic sub-steps {sorted(subs)}; rebuild the "
                f"tabulated model with the matching sub-step dt"
            )

    def solve(
        self,
        interval: tuple[float, float],
        dt: float,
        save_freq: int | None = None,
        save_callback: Callable[[float, np.ndarray], None] | None = None,
    ) -> Status:
        """Run the fused time loop on (T0, T].

        ``save_freq`` (in steps) bounds chunk length; ``save_callback(t,
        v_host)`` fires once per chunk with the voltage synced to host —
        the only host round-trip of the loop.

        Returns ``Status.NOT_CONVERGING`` if any step's CG stopped at
        ``ksp_max_it`` without meeting tolerance (mirrors the reference's
        KSP converged_reason plumbing, ``base_model.py:23-25`` there);
        ``Status.OK`` otherwise."""
        T0, T = interval
        self._check_fixed_dt(dt)
        n_total = int(round((T - T0) / dt))
        chunk = save_freq or n_total
        t = jnp.asarray(T0, dtype=self.dtype)
        dtj = jnp.asarray(dt, dtype=self.dtype)
        done = 0
        all_converged = True
        while done < n_total:
            n = min(chunk, n_total - done)
            with self.monitor.track_time("fused_chunk"):
                (
                    self.states,
                    self.activation_time,
                    t,
                    it_max,
                    it_sum,
                    rnorm,
                    conv,
                ) = self._run_chunk(
                    self.states, self.activation_time, t, dtj, self.stimulus_amplitudes(), n
                )
                self.states.block_until_ready()
            done += n
            converged = bool(conv)
            all_converged &= converged
            if not converged:
                logger.warning(
                    "CG did not converge within ksp_max_it during chunk ending "
                    "t=%g (last residual norm %.3e)",
                    float(t),
                    float(rnorm),
                )
            self.monitor.record_ksp(
                CGInfo(
                    iterations=int(it_max),
                    residual_norm=float(rnorm),
                    converged=converged,
                )
            )
            self.monitor.advance_step(float(t) - n * dt, float(t))
            if save_callback is not None:
                save_callback(float(t), np.asarray(self.v))
        self.last_solve_converged = all_converged
        return Status.OK if all_converged else Status.NOT_CONVERGING

    def activation_times(self) -> np.ndarray:
        return np.asarray(self.activation_time[: self._n])

    # ------------------------------------------------------------------
    # full-state checkpoint / resume (reference does this via external
    # ADIOS2 checkpoints, demos/pace_train.py:179-189)
    def save_state(self, path, t: float = 0.0):
        """Write the complete solver state (all ionic states, activation
        times, simulation time) to one npz for exact resume.

        The padded kernel-alignment rows are trimmed so checkpoints are
        portable across solvers and backends (the sharded solver and a
        CPU fused solver use different pad sizes)."""
        from pathlib import Path

        out = Path(path).with_suffix(".npz")
        out.parent.mkdir(parents=True, exist_ok=True)
        np.savez_compressed(
            out,
            states=np.asarray(self.states)[:, : self._n],
            activation_time=np.asarray(self.activation_time)[: self._n],
            t=float(t),
            v_index=self.v_index,
        )
        return out

    def load_state(self, path) -> float:
        """Restore a :meth:`save_state` checkpoint; returns its time."""
        from pathlib import Path

        with np.load(Path(path).with_suffix(".npz")) as f:
            n_file = f["states"].shape[1]
            # Tolerate legacy files that saved kernel-alignment padding, but
            # no more than one pad granule beyond our node count (the same
            # rule __post_init__ pads with) — anything larger is a
            # checkpoint from a genuinely different mesh and must not
            # load silently truncated.
            from .ops.sparse import pad_granule

            gran = pad_granule(self._n)
            if n_file != self._n and not (self._n < n_file <= -(-self._n // gran) * gran):
                raise ValueError(
                    f"checkpoint has {n_file} nodes, solver has {self._n} "
                    "(different mesh?)"
                )
            states = f["states"][:, : self._n]
            act = f["activation_time"][: self._n]
            if states.shape != (self.states.shape[0], self._n):
                raise ValueError(
                    f"checkpoint shape {f['states'].shape} incompatible with "
                    f"solver ({self.states.shape[0]} states, {self._n} nodes)"
                )
            if int(f["v_index"]) != int(self.v_index):
                raise ValueError(
                    f"checkpoint v_index {int(f['v_index'])} != solver "
                    f"{self.v_index} (different ionic model?)"
                )
            pad = self._n_pad - self._n
            if pad:
                states = np.concatenate(
                    [states, np.tile(states[:, :1], (1, pad))], axis=1
                )
                act = np.concatenate([act, np.full(pad, -1.0)])
            self.states = jnp.asarray(states, dtype=self.dtype)
            self.activation_time = jnp.asarray(act, dtype=self.dtype)
            return float(f["t"])
