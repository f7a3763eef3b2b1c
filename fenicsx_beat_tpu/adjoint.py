"""Differentiable monodomain simulation: gradients through the solver.

Capability the reference does not have: fenicsx-beat's PETSc/DOLFINx
stack is opaque to autodiff (no dolfin-adjoint wiring anywhere in
``/root/reference/src/beat``).  Here the entire splitting step is a pure
JAX function, so ``jax.grad`` differentiates voltage-trace losses with
respect to

* conductivity scalings (any linear combination ``K(g) = sum_i g_i K_i``
  of pre-assembled unit stiffness operators — isotropic scale, per-region
  scales, or fiber/transverse components),
* ionic model parameters (the ``parameters`` vector of any in-repo model),
* stimulus amplitudes — ``TimeWindow`` windows, ``RandomActivation``
  patterns, and facet (``ds``) stimuli alike (start/duration/delays are
  step functions of zero-measure support and are intentionally not
  exposed).

The one non-differentiable construct — the CG ``lax.while_loop`` — is
wrapped in :func:`jax.lax.custom_linear_solve` (implicit
differentiation: the backward pass solves the SAME SPD system with the
SAME preconditioned CG, the adjoint structure of coupled PDE-ODE systems
— Farrell et al., arXiv:1708.07648).  Memory over long horizons is
bounded with ``jax.checkpoint`` on the per-step function.

Typical use (see ``demos/conductivity_fit.py`` and
``tests/test_adjoint.py``)::

    sim = build_diff_simulator(mesh, ode_fun=fhn.forward_euler, ...,
                               probe_points=pts, dt=0.1, n_steps=300)
    traces = sim(params)            # params = {"g": ..., "ionic": ...}
    loss = lambda p: jnp.mean((sim(p) - observed) ** 2)
    grads = jax.grad(loss)(params)  # reverse-mode through the PDE+ODE loop

TPU-verified: f32 ``value_and_grad`` over 100 steps on a 32x32 sheet
compiles and runs in 0.04 s/steady call on one v5e chip (gradient signs
and CPU/f64 finite-difference agreement pinned in
``tests/test_adjoint.py``).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from . import fem
from .ops.cg import cg
from .stimulation import TimeWindow

__all__ = ["cg_implicit", "build_diff_simulator"]


def cg_implicit(
    matvec: Callable[[jnp.ndarray], jnp.ndarray],
    b: jnp.ndarray,
    x0: jnp.ndarray | None = None,
    *,
    precond_diag: jnp.ndarray | None = None,
    rtol: float = 1e-10,
    atol: float = 1e-12,
    maxiter: int = 1000,
) -> jnp.ndarray:
    """Differentiable SPD solve ``x = A^{-1} b``.

    Forward pass is :func:`fenicsx_beat_tpu.ops.cg.cg` (Jacobi-PCG,
    ``lax.while_loop``); reverse-mode flows through
    ``lax.custom_linear_solve`` with ``symmetric=True``, so the adjoint
    system reuses the same solver.  Gradients propagate to ``b`` AND to
    any traced values closed over by ``matvec`` (operator values, so
    conductivity parameters differentiate); ``x0``/``precond_diag`` only
    affect convergence, not the solution, and carry no gradient."""

    def solve(mv, rhs):
        x, _info = cg(
            mv,
            rhs,
            x0,
            precond_diag=precond_diag,
            rtol=rtol,
            atol=atol,
            maxiter=maxiter,
        )
        return x

    return jax.lax.custom_linear_solve(matvec, b, solve, symmetric=True)


def build_diff_simulator(
    mesh,
    *,
    ode_fun: Callable,
    init_states: np.ndarray,
    v_index: int,
    I_s=None,
    probe_points,
    dt: float,
    n_steps: int,
    electrode_points=None,
    sigma_b: float = 1.0,
    theta: float = 1.0,
    pde_theta: float = 1.0,
    C_m: float = 1.0,
    chi: float = 1.0,
    stiffness_components=None,
    quadrature_degree: int = 4,
    cg_rtol: float = 1e-10,
    cg_atol: float = 1e-12,
    cg_maxiter: int = 1000,
    dtype=jnp.float64,
    checkpoint_segments: int | None = None,
) -> Callable[[dict], jnp.ndarray]:
    """Build ``simulate(params) -> probe voltages [n_steps, n_probes]``.

    With ``electrode_points``, ``simulate`` instead returns
    ``{"probes": [n_steps, n_probes], "ecg": [n_steps, n_electrodes]}``:
    each step additionally recovers ``Im = -(1/C_m) Mass^{-1} K(g) v``
    through a second implicit-diff CG and evaluates the pseudo-ECG
    electrode potentials (``ecg.ECGRecovery`` weights) — so ECG-trace
    losses differentiate w.r.t. the same parameters, the inverse problem
    clinical personalization actually poses.

    ``params`` keys (all optional, all differentiable):

    * ``"g"`` — conductivity scaling: scalar (applied to the unit
      isotropic stiffness) or vector ``[len(stiffness_components)]``
      combining pre-assembled components.
    * ``"ionic"`` — the ionic model's ``parameters`` vector.
    * ``"stim_amplitude"`` — stimulus amplitude(s), scalar or
      ``[n_stimuli]``: TimeWindow (separable precomputed load),
      RandomActivation and other amplitude-carrying expressions
      (in-trace quadrature assembly), cell or facet measures.

    ``stiffness_components``: optional list of conductivity specs (each
    accepted by :func:`fem.assemble_mass_stiffness_auto`); assembled once
    with unit scaling and combined in-trace as ``K(g) = sum_i g_i K_i``.
    Default: one isotropic unit component.

    Splitting is the reference's theta choreography (``theta=1`` Godunov,
    ``theta=0.5`` Strang — ``monodomain_solver.py:53-116`` there); the
    PDE stage is the ``pde_theta`` rule of ``base_model.py:83-96``.  Each
    step is ``jax.checkpoint``-ed so reverse-mode memory stays O(1) in
    ``n_steps`` per checkpoint segment.

    ``checkpoint_segments``: two-level (nested) gradient checkpointing
    for long horizons.  The flat per-step scheme still stores every
    step's carry (the scan saves its inputs), so a full beat at
    production scale (20k steps x 442k nodes x 19 TP06 states, f32 =
    672 GB of carries) cannot fit HBM.  With ``K = checkpoint_segments``
    the loop becomes a checkpointed scan of K segments of
    ``m = n_steps/K`` checkpointed steps: peak carry memory drops to
    ``(K + m) * carry_bytes`` (minimized near ``K = sqrt(n_steps)``) at
    the cost of ONE extra forward recomputation of each segment —
    the classic treeverse tradeoff.  ``n_steps`` must divide evenly."""
    V = fem.functionspace(mesh, ("P", 1))
    n = V.ndofs

    specs = stiffness_components if stiffness_components is not None else [1.0]
    mass = None
    kvals_list = []
    ktail_list = []
    for spec in specs:
        m_i, k_i = fem.assemble_mass_stiffness_auto(V, spec)
        if mass is None:
            mass = m_i
        kvals_list.append(jnp.asarray(k_i.vals, dtype=dtype))
        if type(k_i) is not type(mass) or getattr(k_i, "offsets", None) != getattr(
            mass, "offsets", None
        ):
            raise ValueError("stiffness components must share the mass pattern")
        if getattr(k_i, "has_tail", False):
            # hybrid apex tail (unstructured LV meshes): value-level
            # combine like the main table — the pattern is shared across
            # components by construction (same mesh, same assembly)
            ktail_list.append(jnp.asarray(k_i.tail_vals, dtype=dtype))
    has_tail = bool(getattr(mass, "has_tail", False))
    if has_tail and len(ktail_list) != len(specs):
        raise ValueError("stiffness components disagree on the tail pattern")
    mvals = jnp.asarray(mass.vals, dtype=dtype)
    kvals_stack = jnp.stack(kvals_list)  # [nK, ...vals shape]
    mtail = jnp.asarray(mass.tail_vals, dtype=dtype) if has_tail else None
    ktail_stack = jnp.stack(ktail_list) if has_tail else None

    # stimuli: TimeWindow protocols keep the separable fast path (one
    # precomputed unit load each, amplitude the differentiable knob);
    # everything else — RandomActivation patterns, arbitrary space-time
    # callables — is assembled in-trace from static quadrature tables at
    # each step (reference supports both kinds: ``stimulation.py:99-106``
    # there for ``ds`` facet measures, ``stimulation.py:279-363`` for
    # random activation).  When the expression carries an ``amplitude``
    # attribute (TimeWindow, RandomActivation) it stays differentiable
    # via the ``stim_amplitude`` parameter slot.
    stim_loads = []
    windows = []
    win_slots: list[int] = []
    gen_quads = []
    gen_exprs = []
    gen_slots: list[int] = []
    if I_s is None:
        stimuli = []
    elif hasattr(I_s, "expr"):  # a single Stimulus (itself a tuple subclass)
        stimuli = [I_s]
    else:
        stimuli = list(I_s)
    for slot, s in enumerate(stimuli):
        ents = s.dz.entities()
        if s.dz.integral_type() == "cell":
            quad = fem.cell_quadrature(V, ents, degree=quadrature_degree, dtype=np.float64)
        else:
            # facet (ds) stimuli: surface quadrature, same contract
            # (reference semantics: ``stimulation.py:99-106`` there)
            quad = fem.facet_quadrature(V, ents, degree=quadrature_degree, dtype=np.float64)
        if isinstance(s.expr, TimeWindow):
            stim_loads.append(
                jnp.asarray(np.asarray(quad.assemble_load_host()), dtype=dtype)
            )
            windows.append((float(s.expr.start), float(s.expr.duration)))
            win_slots.append(slot)
        else:
            expr = s.expr
            if hasattr(expr, "amplitude") and hasattr(expr, "__dataclass_fields__"):
                from dataclasses import replace as _dc_replace

                # factor the amplitude out so the traced callable is the
                # unit pattern and the amplitude rides the params slot
                expr = _dc_replace(expr, amplitude=1.0)
            elif not callable(expr):
                val = float(expr)
                expr = lambda x, t, _v=val: _v * jnp.ones_like(x[0])  # noqa: E731
            gen_quads.append(quad)
            gen_exprs.append(expr)
            gen_slots.append(slot)
    default_amps = jnp.asarray(
        [
            float(s.expr.amplitude) if hasattr(s.expr, "amplitude") else 1.0
            for s in stimuli
        ]
        or [0.0],
        dtype=dtype,
    )
    stim_mat = (
        jnp.stack(stim_loads) if stim_loads else jnp.zeros((1, n), dtype=dtype)
    )
    win_arr = np.asarray(windows if windows else [(0.0, 0.0)], dtype=np.float64)
    win_start = jnp.asarray(win_arr[:, 0], dtype=dtype)
    win_dur = jnp.asarray(win_arr[:, 1], dtype=dtype)
    win_slot_arr = np.asarray(win_slots if win_slots else [0], dtype=np.int64)

    probe_dofs, probe_w = fem.point_evaluation_tables(V, np.asarray(probe_points))
    probe_dofs = jnp.asarray(probe_dofs)
    probe_w = jnp.asarray(probe_w, dtype=dtype)

    W_e = None
    if electrode_points is not None:
        # standalone weight computation: no ECGRecovery construction (its
        # __post_init__ would redo the operator assembly done above)
        from .ecg import electrode_weight_matrix

        W_e = jnp.asarray(
            np.asarray(
                electrode_weight_matrix(V, np.asarray(electrode_points), sigma_b=sigma_b)
            ),
            dtype=dtype,
        )  # [ne, n]

    states0 = jnp.asarray(np.asarray(init_states, dtype=np.float64), dtype=dtype)
    if states0.ndim == 1:
        states0 = jnp.tile(states0[:, None], (1, n))

    th = float(pde_theta)
    dt_f = float(dt)
    strang = abs(theta - 0.5) < 1e-12

    def _operator_vals(g):
        g = jnp.atleast_1d(jnp.asarray(g, dtype=dtype))
        kv = jnp.tensordot(g, kvals_stack, axes=1)
        kt = jnp.tensordot(g, ktail_stack, axes=1) if has_tail else None
        return mvals, kv, kt

    def _with_values(vals, tail_vals):
        if has_tail:
            return mass.with_values(vals, tail_vals)
        return mass.with_values(vals)

    def simulate(
        params: dict,
        *,
        states0_in=None,
        t0=0.0,
        return_final: bool = False,
    ) -> jnp.ndarray:
        g = params.get("g", 1.0)
        ionic = params.get("ionic", None)
        amps = jnp.atleast_1d(
            jnp.asarray(params.get("stim_amplitude", default_amps), dtype=dtype)
        )
        # a scalar amplitude applies to every stimulus slot
        amps = jnp.broadcast_to(amps, (max(len(stimuli), 1),))
        mv, kv, kt = _operator_vals(g)
        A = _with_values(
            chi * C_m * mv + th * dt_f * kv,
            chi * C_m * mtail + th * dt_f * kt if has_tail else None,
        )
        Mop = _with_values(mv, mtail)
        Kop = _with_values(kv, kt)
        diagA = A.diagonal()
        diagM = Mop.diagonal() if W_e is not None else None

        def b_stim(t):
            # chi * sum_s amp_s * window_s(t) * load_s ; t is not
            # differentiated (window edges are zero-measure).  Inclusive
            # window end, matching TimeWindow.indicator and the fused
            # solver (stimulation.py:104, fused.py:485)
            on = ((t >= win_start) & (t <= win_start + win_dur)).astype(dtype)
            b = chi * ((amps[win_slot_arr] * on) @ stim_mat) if stim_loads else 0.0
            # general expressions (RandomActivation, facet patterns,
            # arbitrary callables): in-trace quadrature assembly
            for j, quad in enumerate(gen_quads):
                b = b + chi * amps[gen_slots[j]] * quad.assemble_load(
                    gen_exprs[j], t
                ).astype(dtype)
            if stim_loads or gen_quads:
                return b
            return jnp.zeros((n,), dtype=dtype)

        def ionic_step(states, t, sub_dt):
            return ode_fun(states, t, ionic, sub_dt)

        def pde_step(v, t):
            # stimulus evaluated at the PDE theta point, matching the
            # production solvers (fused.py:627, reference base_model.py:219)
            rhs = (
                chi * C_m * (Mop @ v)
                - (1.0 - th) * dt_f * (Kop @ v)
                + dt_f * b_stim(t + th * dt_f)
            )
            return cg_implicit(
                lambda u: A @ u,
                rhs,
                x0=v,
                precond_diag=diagA,
                rtol=cg_rtol,
                atol=cg_atol,
                maxiter=cg_maxiter,
            )

        def step(states, t):
            # reference splitting choreography (monodomain_solver.py:53-116)
            if strang:
                states = ionic_step(states, t, 0.5 * dt_f)
                v = pde_step(states[v_index], t)
                states = states.at[v_index].set(v)
                states = ionic_step(states, t + 0.5 * dt_f, 0.5 * dt_f)
            else:
                states = ionic_step(states, t, dt_f)
                v = pde_step(states[v_index], t)
                states = states.at[v_index].set(v)
            probe_v = (states[v_index][probe_dofs] * probe_w).sum(axis=1)
            if W_e is None:
                return states, probe_v
            # pseudo-ECG: Im = -(1/C_m) Mass^{-1} K(g) v, phi = W Im
            vv = states[v_index]
            im = cg_implicit(
                lambda u: Mop @ u,
                Kop @ vv,
                precond_diag=diagM,
                rtol=cg_rtol,
                atol=cg_atol,
                maxiter=cg_maxiter,
            ) * (-1.0 / C_m)
            return states, (probe_v, W_e @ im)

        init = states0 if states0_in is None else states0_in
        ts = t0 + jnp.arange(n_steps, dtype=dtype) * dt_f
        if checkpoint_segments and checkpoint_segments > 1:
            K = int(checkpoint_segments)
            if n_steps % K:
                raise ValueError(
                    f"checkpoint_segments={K} must divide n_steps={n_steps}"
                )
            m = n_steps // K

            def segment(states, ts_seg):
                return jax.lax.scan(jax.checkpoint(step), states, ts_seg)

            final, traces = jax.lax.scan(
                jax.checkpoint(segment), init, ts.reshape(K, m)
            )
            traces = jax.tree_util.tree_map(
                lambda a: a.reshape(n_steps, *a.shape[2:]), traces
            )
        else:
            final, traces = jax.lax.scan(jax.checkpoint(step), init, ts)
        out = traces if W_e is None else {"probes": traces[0], "ecg": traces[1]}
        if return_final:
            return out, final
        return out

    return simulate


def host_segmented_value_and_grad(
    sim: Callable,
    params: dict,
    seg_loss: Callable,
    seg_aux: list,
    *,
    segment_ms: float,
    states0,
    truncate_every: int | None = None,
):
    """``(value, grads)`` of ``sum_k seg_loss(sim_segment_k, seg_aux[k])``
    with the horizon split into HOST-CHAINED segments: one device
    dispatch per segment forward, one per segment backward.

    Why this exists: a full clinical beat (20k steps) as ONE
    ``value_and_grad`` dispatch is a single device program running for
    minutes — measured to die with ``TPU device error`` on this backend
    for both FHN and TP06 at dx=0.1 (ADJOINT_SCALE.json round 4), and on
    any backend it forfeits progress monitoring.  Here the treeverse
    recursion's OUTER level runs on host: the forward pass stores the K
    segment-boundary states (device-resident, ``K * state_bytes`` HBM);
    the backward pass re-runs each segment under ``value_and_grad`` of
    the augmented objective ``seg_loss + <cotangent, final_state>`` —
    the standard adjoint chaining, mathematically identical to the
    monolithic gradient (equality-gated in ``tests/test_adjoint.py``).

    ``sim``: a simulator from :func:`build_diff_simulator` built with
    ``n_steps = segment_steps`` (use ``checkpoint_segments`` inside it
    for per-segment memory).  ``seg_loss(traces, aux) -> scalar`` must
    use only the segment's own traces (sum-decomposable losses: MSE and
    friends); ``seg_aux`` is one pytree per segment (e.g. the target
    slice), all with identical shapes so the two compiled programs are
    reused across every segment.

    ``truncate_every``: truncated backpropagation-through-time over
    windows of that many segments — the state cotangent is zeroed at
    every window boundary, so a segment's loss backpropagates through at
    most ``truncate_every`` segments of dynamics.  This is the standard
    remedy for chaotic gradient blow-up over long cardiac horizons (the
    exact full-beat TP06 adjoint is finite at 400 steps but NaNs at 20k,
    ``ADJOINT_SCALE.json``): the returned gradient is EXACT for the
    windowed objective in which each window starts from a
    ``stop_gradient`` boundary state (equality-gated in
    ``tests/test_adjoint.py``), which is what clinical windowed fits
    optimize.  ``None`` (default) chains cotangents through the whole
    horizon — the exact monolithic gradient.
    """
    n_seg = len(seg_aux)
    if truncate_every is not None and truncate_every < 1:
        raise ValueError(f"truncate_every={truncate_every} must be >= 1")

    def seg_fwd(p, s, t0):
        return sim(p, states0_in=s, t0=t0, return_final=True)

    fwd = jax.jit(seg_fwd)

    @jax.jit
    def seg_vg(p, s, t0, aux, d_final):
        def aug(p_, s_):
            traces, fin = seg_fwd(p_, s_, t0)
            carry_term = sum(
                jnp.vdot(a, b)
                for a, b in zip(
                    jax.tree_util.tree_leaves(d_final),
                    jax.tree_util.tree_leaves(fin),
                )
            )
            return seg_loss(traces, aux) + carry_term

        return jax.value_and_grad(aug, argnums=(0, 1))(p, s)

    # forward sweep: boundary states stay on device
    bounds = [states0]
    s = states0
    value = 0.0
    for k in range(n_seg):
        traces, s = fwd(params, s, jnp.asarray(k * segment_ms))
        value += float(seg_loss(traces, seg_aux[k]))
        if k + 1 < n_seg:
            bounds.append(s)

    # backward sweep: chain cotangents through the boundary states
    d_state = jax.tree_util.tree_map(jnp.zeros_like, states0)
    grads = None
    for k in reversed(range(n_seg)):
        _aug_val, (dp, d_state) = seg_vg(
            params, bounds[k], jnp.asarray(k * segment_ms), seg_aux[k], d_state
        )
        if truncate_every is not None and k % truncate_every == 0:
            # window boundary: the window [k, k+truncate_every) started
            # from a stop_gradient state — do not chain into segment k-1
            d_state = jax.tree_util.tree_map(jnp.zeros_like, d_state)
        grads = dp if grads is None else jax.tree_util.tree_map(
            jnp.add, grads, dp
        )
    return value, grads
