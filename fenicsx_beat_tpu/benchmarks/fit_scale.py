"""Production-scale inverse problem: recover anisotropic conductivities
from synthetic probe traces by gradient descent through the solver.

This is the artifact VERDICT r4 #2 asks for: the repo's clinical pitch
(``demos/conductivity_fit.py``) exercised where it claims to work — a
full-beat TP06 horizon at production resolution, with the windowed-BPTT
host-segmented adjoint (``adjoint.host_segmented_value_and_grad``)
actually *driving a fit*:

* ``slab``: Niederer slab at dx>=0.2 (58k nodes at 0.2), fibers along x,
  fit ``(g_l, g_t)`` of ``K(g) = g_l K_f + g_t K_t`` from 12 probe
  traces over a full beat.
* ``lv``: the unstructured LV ellipsoid at >=50k nodes, fit the same
  two components built from the rule-based fiber field.
* ``fdcheck``: mid-scale validation that the WINDOWED gradient points
  the way of the TRUE objective: cosine(windowed grad, central-FD grad
  of the total loss) per VERDICT r4 #2.

Objective normalization: the raw full-beat TP06 adjoint produces
gradients at 1e17-1e31 (ADJOINT_SCALE.json) — unusable raw.  Here the
loss is ``mean((v - v_target)^2) / (100 mV)^2`` per segment (O(1)
numbers), parameters are OPTIMIZED IN LOG SPACE (conduction physics is
multiplicative; log-grads are ``g * dL/dg``, scale-free), and Adam's
per-parameter RMS normalization absorbs the remaining magnitude — what
matters is the gradient's DIRECTION, which fdcheck pins.

The reference has no adjoint at all (forward-only demos); this benchmark
is beyond-parity surface.  Reference frame for the forward physics:
``/root/reference/demos/niederer_benchmark.py``.

Run:
    python -m fenicsx_beat_tpu.benchmarks.fit_scale slab --dx 0.2
    python -m fenicsx_beat_tpu.benchmarks.fit_scale lv --psize 0.15
    python -m fenicsx_beat_tpu.benchmarks.fit_scale fdcheck --dx 0.5
Each prints one JSON row (append to FIT_SCALE.json via --out).
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import numpy as np

DEFAULT_WINDOW_MS = 20.0  # 2 x 10 ms segments: measured finite (r4)


def _slab_problem(dx: float, dtype):
    """Niederer slab, corner S1 stimulus, fiber/transverse stiffness
    components, 12 probes spread over the tissue."""
    from ..geometry import get_3D_slab_geometry
    from ..mesh import locate_entities, meshtags
    from ..stimulation import Stimulus, TimeWindow
    from ..stimulation import dx as dx_measure

    geo = get_3D_slab_geometry(None, dx=dx, Lx=20.0, Ly=7.0, Lz=3.0)
    mesh = geo.mesh
    cells = locate_entities(
        mesh, 3, lambda x: (x[0] <= 1.5) & (x[1] <= 1.5) & (x[2] <= 1.5)
    )
    tags = meshtags(mesh, 3, cells, 1)
    I_s = Stimulus(
        expr=TimeWindow(amplitude=50.0, start=0.0, duration=2.0),
        dZ=dx_measure(mesh, subdomain_data=tags),
        marker=1,
    )
    f0 = np.array([1.0, 0.0, 0.0])
    K_f = np.outer(f0, f0)
    K_t = np.eye(3) - K_f
    probes = np.array(
        [
            [x, y, z]
            for x in (2.0, 8.0, 14.0, 19.0)
            for (y, z) in ((1.0, 1.0), (3.5, 1.5), (6.0, 2.5))
        ]
    )
    return mesh, I_s, [K_f, K_t], probes


def _lv_problem(psize: float, dtype):
    """Unstructured LV ellipsoid with the rule-based fiber field;
    apex stimulus region; probes along the free wall."""
    from ..conductivities import as_cell_tensors
    from ..geometry import get_lv_ellipsoid_geometry
    from ..mesh import locate_entities, meshtags
    from ..stimulation import Stimulus, TimeWindow
    from ..stimulation import dx as dx_measure

    geo = get_lv_ellipsoid_geometry(psize_ref=psize)
    mesh = geo.mesh
    coords = mesh.coords
    # the LV long axis is x with the apex at x = -r_long (geometry.py):
    # stimulate an apical cap
    apex_x = coords[:, 0].min()
    cells = locate_entities(mesh, 3, lambda x: x[0] <= apex_x + 2.0)
    tags = meshtags(mesh, 3, cells, 1)
    I_s = Stimulus(
        expr=TimeWindow(amplitude=30.0, start=0.0, duration=2.0),
        dZ=dx_measure(mesh, subdomain_data=tags),
        marker=1,
    )
    # per-cell fiber/transverse component tensors from the LDRB-lite
    # fiber field: K(g) = g_l f f^T + g_t (I - f f^T).  geo.f0 is a
    # per-NODE field (geometry.py) — average to cells first
    f = np.asarray(geo.f0)
    if f.shape[0] == mesh.num_vertices:
        f = f[mesh.cells].mean(axis=1)
        f /= np.maximum(np.linalg.norm(f, axis=1, keepdims=True), 1e-12)
    K_f = np.einsum("ci,cj->cij", f, f)
    K_t = np.eye(3)[None] - K_f
    K_f = as_cell_tensors(K_f, mesh)
    K_t = as_cell_tensors(K_t, mesh)
    # probes along the long (x) axis at regular quantiles: the apex
    # stimulus wavefront crosses them in sequence, so every probe trace
    # carries conduction-velocity (hence conductivity) information
    order = np.argsort(coords[:, 0])
    qs = np.linspace(0.04, 0.96, 12)
    probes = coords[order[(qs * (coords.shape[0] - 1)).astype(int)]]
    return mesh, I_s, [K_f, K_t], probes


def _build(case, dx, psize, T, dt, segment_ms, dtype, cg_rtol, cg_atol):
    import jax.numpy as jnp

    from ..adjoint import build_diff_simulator
    from ..models import tentusscher_panfilov_2006 as tp06

    if case == "lv":
        mesh, I_s, comps, probes = _lv_problem(psize, dtype)
    else:
        mesh, I_s, comps, probes = _slab_problem(dx, dtype)
    seg_steps = int(round(segment_ms / dt))
    n_seg = int(round(T / segment_ms))
    sim = build_diff_simulator(
        mesh,
        ode_fun=tp06.generalized_rush_larsen,
        init_states=tp06.init_state_values(),
        v_index=tp06.state_index("V"),
        I_s=I_s,
        probe_points=probes,
        dt=dt,
        n_steps=seg_steps,
        dtype=dtype,
        cg_rtol=cg_rtol,
        cg_atol=cg_atol,
        stiffness_components=comps,
    )
    ionic = jnp.asarray(tp06.init_parameter_values(stim_amplitude=0.0), dtype)
    states0 = jnp.tile(
        jnp.asarray(tp06.init_state_values(), dtype)[:, None],
        (1, mesh.num_vertices),
    )
    return mesh, sim, ionic, states0, n_seg, seg_steps


def _targets(sim, params, states0, n_seg, segment_ms):
    """Forward sweep at the true parameters: per-segment target traces."""
    import jax
    import jax.numpy as jnp

    fwd = jax.jit(lambda p, s, t0: sim(p, states0_in=s, t0=t0, return_final=True))
    targets, s = [], states0
    for k in range(n_seg):
        tr, s = fwd(params, s, jnp.asarray(k * segment_ms))
        targets.append(jax.block_until_ready(tr))
    return targets, s


def _norm_seg_loss(traces, target):
    """Per-segment objective: trace MSE in units of (100 mV)^2 -> O(1)."""
    import jax.numpy as jnp

    return jnp.mean((traces - target) ** 2) / jnp.asarray(1e4, traces.dtype)


def run_fit(
    case: str = "slab",
    dx: float = 0.2,
    psize: float = 0.15,
    T: float = 400.0,
    dt: float = 0.05,
    segment_ms: float = 10.0,
    window_ms: float = DEFAULT_WINDOW_MS,
    n_iters: int = 12,
    lr: float = 0.15,
    g_true=(0.002, 0.0006),  # ~Niederer-like 3.3x anisotropy, cm^2-ish units
    g0_scale=(0.5, 1.8),  # start well off the truth, asymmetrically
    n_polish: int = 6,
    carry_clip: float | None = 1e3,
    cotangent_scale: float = 2.0**-64,
    window_outlier: float | None = 20.0,
    seed_noise_mv: float = 0.0,
) -> dict:
    import jax
    import jax.numpy as jnp
    import optax

    from ..adjoint import host_segmented_value_and_grad

    dtype = jnp.float32
    mesh, sim, ionic, states0, n_seg, seg_steps = _build(
        case, dx, psize, T, dt, segment_ms, dtype, 1e-6, 1e-8
    )
    truncate_every = max(1, int(round(window_ms / segment_ms)))

    g_true_j = jnp.asarray(np.asarray(g_true), dtype)
    t0 = time.perf_counter()
    targets, _ = _targets(
        sim, {"g": g_true_j, "ionic": ionic}, states0, n_seg, segment_ms
    )
    target_s = time.perf_counter() - t0
    if seed_noise_mv:
        rng = np.random.default_rng(3)
        targets = [
            t + jnp.asarray(rng.normal(0.0, seed_noise_mv, t.shape), dtype)
            for t in targets
        ]

    theta = jnp.log(g_true_j * jnp.asarray(np.asarray(g0_scale), dtype))
    # hold lr for the approach, then decay to 0.2x: a fixed lr=0.15
    # overshoots once the loss basin is reached (measured: slab dx=0.2
    # hit 3%/23% rel err at iter 9, then bounced to 18%/31% by 11),
    # while an immediate 0.1x exponential decay starves the approach
    # (g_l stalled at 45% err — both runs in FIT_SCALE history)
    hold = max(n_iters // 2, 1)
    opt = optax.adam(
        optax.join_schedules(
            [optax.constant_schedule(lr),
             optax.exponential_decay(lr, transition_steps=max(n_iters - hold, 1),
                                     decay_rate=0.2)],
            [hold],
        )
    )
    opt_state = opt.init(theta)
    history = []
    best = {"loss": np.inf, "theta": theta}
    t_fit = time.perf_counter()

    def fit_step(theta, opt, opt_state, it, phase):
        g = jnp.exp(theta)
        value, grads = host_segmented_value_and_grad(
            sim,
            {"g": g, "ionic": ionic},
            _norm_seg_loss,
            targets,
            segment_ms=segment_ms,
            states0=states0,
            truncate_every=truncate_every,
            carry_clip=carry_clip,
            cotangent_scale=cotangent_scale,
            window_outlier=window_outlier,
        )
        # d loss / d theta = g * d loss / d g  (log-space chain rule)
        g_theta = g * grads["g"]
        finite = bool(np.isfinite(np.asarray(g_theta)).all())
        if not finite:
            g_theta = jnp.zeros_like(g_theta)
        if float(value) < best["loss"]:
            best["loss"] = float(value)
            best["theta"] = theta
        updates, opt_state = opt.update(g_theta, opt_state, theta)
        theta = optax.apply_updates(theta, updates)
        row = {
            "iter": it,
            "phase": phase,
            "loss": float(value),
            "g": [float(x) for x in np.asarray(g)],
            "grad_logg": [float(x) for x in np.asarray(g_theta)],
            "grad_finite": finite,
        }
        history.append(row)
        print(json.dumps(row), flush=True)
        return theta, opt_state

    for it in range(n_iters):
        theta, opt_state = fit_step(theta, opt, opt_state, it, "main")
    if n_polish:
        # polish from the BEST iterate at a small lr: Adam's momentum
        # bounces around the narrow valley near convergence (measured:
        # rel err 3%/23% at iteration 9, 18-25% two iterations later)
        theta = best["theta"]
        opt2 = optax.adam(0.05 * lr)
        opt_state2 = opt2.init(theta)
        for it in range(n_polish):
            theta, opt_state2 = fit_step(
                theta, opt2, opt_state2, n_iters + it, "polish"
            )
    theta = best["theta"]
    fit_s = time.perf_counter() - t_fit

    g_fin = np.exp(np.asarray(theta))
    rel_err = np.abs(g_fin - np.asarray(g_true)) / np.asarray(g_true)
    losses = [h["loss"] for h in history]
    return {
        "mode": "fit",
        "case": case,
        "resolution": dx if case == "slab" else psize,
        "n_nodes": int(mesh.num_vertices),
        "model": "tp06",
        "T_ms": T,
        "dt": dt,
        "n_steps": n_seg * seg_steps,
        "segment_ms": segment_ms,
        "window_ms": truncate_every * segment_ms,
        "carry_clip": carry_clip,
        "window_outlier": window_outlier,
        "cotangent_scale_log2": float(np.log2(cotangent_scale)),
        "n_iters": n_iters,
        "n_polish": n_polish,
        "lr": lr,
        "loss_best": best["loss"],
        "g_true": [float(x) for x in np.asarray(g_true)],
        "g0": [float(x) for x in history[0]["g"]],
        "g_recovered": [float(x) for x in g_fin],
        "rel_err": [float(x) for x in rel_err],
        "loss_first": losses[0],
        "loss_last": losses[-1],
        "loss_decrease_x": round(losses[0] / max(losses[-1], 1e-30), 1),
        "loss_monotone_frac": round(
            float(np.mean(np.diff(losses) < 0.0)), 2
        ),
        "all_grads_finite": all(h["grad_finite"] for h in history),
        "target_sweep_s": round(target_s, 1),
        "fit_wall_s": round(fit_s, 1),
        "history": history,
    }


def run_fdcheck(
    dx: float = 0.5,
    T: float = 100.0,
    dt: float = 0.05,
    segment_ms: float = 10.0,
    window_ms: float = DEFAULT_WINDOW_MS,
    rel_eps: float = 0.02,
    g_true=(0.002, 0.0006),
    g_at=(0.0014, 0.0009),
    carry_clip: float | None = 1e3,
    cotangent_scale: float = 2.0**-64,
    window_outlier: float | None = 20.0,
) -> dict:
    """Windowed-gradient DIRECTION vs central finite differences of the
    TRUE total loss, at a mid scale (VERDICT r4 #2).  The windowed
    gradient is exact for a different (windowed) objective; what the fit
    needs is that it descends the true one — pinned here as a positive
    cosine against the FD gradient."""
    import jax
    import jax.numpy as jnp

    from ..adjoint import host_segmented_value_and_grad

    dtype = jnp.float32
    mesh, sim, ionic, states0, n_seg, seg_steps = _build(
        "slab", dx, None, T, dt, segment_ms, dtype, 1e-7, 1e-9
    )
    truncate_every = max(1, int(round(window_ms / segment_ms)))
    targets, _ = _targets(
        sim, {"g": jnp.asarray(np.asarray(g_true), dtype), "ionic": ionic},
        states0, n_seg, segment_ms,
    )

    def total_loss(g_np) -> float:
        fwd = jax.jit(
            lambda p, s, t0: sim(p, states0_in=s, t0=t0, return_final=True)
        )
        s, tot = states0, 0.0
        p = {"g": jnp.asarray(g_np, dtype), "ionic": ionic}
        for k in range(n_seg):
            tr, s = fwd(p, s, jnp.asarray(k * segment_ms))
            tot += float(_norm_seg_loss(tr, targets[k]))
        return tot

    g_at_np = np.asarray(g_at, np.float64)
    value, grads = host_segmented_value_and_grad(
        sim,
        {"g": jnp.asarray(g_at_np, dtype), "ionic": ionic},
        _norm_seg_loss,
        targets,
        segment_ms=segment_ms,
        states0=states0,
        truncate_every=truncate_every,
        carry_clip=carry_clip,
        cotangent_scale=cotangent_scale,
        window_outlier=window_outlier,
    )
    g_win = np.asarray(grads["g"], np.float64)

    fd = np.zeros(2)
    for i in range(2):
        e = np.zeros(2)
        e[i] = rel_eps * g_at_np[i]
        fd[i] = (total_loss(g_at_np + e) - total_loss(g_at_np - e)) / (2 * e[i])

    # compare in LOG space (the fit's optimization variables)
    win_log = g_win * g_at_np
    fd_log = fd * g_at_np
    cos = float(
        np.dot(win_log, fd_log)
        / max(np.linalg.norm(win_log) * np.linalg.norm(fd_log), 1e-300)
    )
    return {
        "mode": "fdcheck",
        "dx": dx,
        "n_nodes": int(mesh.num_vertices),
        "T_ms": T,
        "window_ms": truncate_every * segment_ms,
        "window_outlier": window_outlier,
        "g_true": list(map(float, g_true)),
        "g_at": list(map(float, g_at)),
        "loss_at": float(value),
        "grad_windowed_logg": [float(x) for x in win_log],
        "grad_fd_logg": [float(x) for x in fd_log],
        "cosine_log_space": round(cos, 4),
        "signs_match": bool((np.sign(win_log) == np.sign(fd_log)).all()),
    }


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="mode", required=True)
    for name in ("slab", "lv"):
        p = sub.add_parser(name)
        p.add_argument("--dx", type=float, default=0.2)
        p.add_argument("--psize", type=float, default=0.15)
        p.add_argument("-T", type=float, default=400.0)
        p.add_argument("--dt", type=float, default=0.05)
        p.add_argument("--segment-ms", type=float, default=10.0)
        p.add_argument("--window-ms", type=float, default=DEFAULT_WINDOW_MS)
        p.add_argument("--iters", type=int, default=12)
        p.add_argument("--lr", type=float, default=0.15)
        p.add_argument("--out", type=Path, default=None)
    pf = sub.add_parser("fdcheck")
    pf.add_argument("--dx", type=float, default=0.5)
    pf.add_argument("-T", type=float, default=100.0)
    pf.add_argument("--window-ms", type=float, default=DEFAULT_WINDOW_MS)
    pf.add_argument("--out", type=Path, default=None)
    args = ap.parse_args(argv)

    if args.mode == "fdcheck":
        row = run_fdcheck(dx=args.dx, T=args.T, window_ms=args.window_ms)
    else:
        row = run_fit(
            case=args.mode,
            dx=args.dx,
            psize=args.psize,
            T=args.T,
            dt=args.dt,
            segment_ms=args.segment_ms,
            window_ms=args.window_ms,
            n_iters=args.iters,
            lr=args.lr,
        )
    print(json.dumps(row))
    if args.out:
        rows = []
        if args.out.exists():
            rows = json.loads(args.out.read_text())
        rows.append(row)
        args.out.write_text(json.dumps(rows, indent=1) + "\n")


if __name__ == "__main__":
    main()
