"""Per-component timing + crash probe for the unstructured bidomain
preconditioner on the real TPU chip.

Round-4 left two open wounds (VERDICT r4 #1): the SA-AMG V-cycle cuts
iterations 5.8x on the LV extracellular block but LOSES ~10x on
wall-clock against lane-gather Jacobi at 9.8k nodes, and the composed
``scan x CG-while x unrolled-V-cycle`` program reproducibly crashes the
TPU runtime at >= 33k nodes.  This probe localizes both:

* ``components``: time ONE lane-gather SpMV, ONE V-cycle (per hierarchy
  shape), and per-level pieces (level SpMVs, transfers, dense bottom) in
  amortized jitted ``fori_loop`` batches — per-application microseconds,
  free of the tunnel's 25 ms dispatch.
* ``solver``: run the full ``BidomainSolver`` for a few chunks with a
  given ``u_precond`` / ``u_amg_opts`` / CG loop flavor.  Run THIS mode
  in a subprocess: the known failure kills the TPU worker process.

Usage (each invocation is one experiment; drive sweeps from the shell):

    python -m fenicsx_beat_tpu.benchmarks.amg_probe components --psize 0.3
    python -m fenicsx_beat_tpu.benchmarks.amg_probe solver --psize 0.2 \
        --precond amg --max-levels 3 --coarse-n 2000

Results print as one JSON line per section (append to a log).
"""

from __future__ import annotations

import argparse
import json
import time as _time

import jax
import jax.numpy as jnp
import numpy as np


def _timed_loop(fn, x0, n_iter: int, n_rep: int = 3) -> float:
    """Per-application seconds of ``x -> fn(x)``, amortized inside ONE
    jitted fori_loop (the tunnel's per-invocation dispatch is ~25 ms;
    a naive loop would measure only that).  The dispatch itself is
    measured with a null body at the same iteration count and
    subtracted, so cheap ops aren't swamped by it."""

    @jax.jit
    def run(x):
        return jax.lax.fori_loop(0, n_iter, lambda i, v: fn(v), x)

    @jax.jit
    def null(x):
        return jax.lax.fori_loop(0, n_iter, lambda i, v: v * 1.0000001, x)

    run(x0).block_until_ready()  # compile + link drain
    null(x0).block_until_ready()
    best = float("inf")
    base = float("inf")
    for _ in range(n_rep):
        t0 = _time.perf_counter()
        run(x0).block_until_ready()
        best = min(best, (_time.perf_counter() - t0) / n_iter)
        t0 = _time.perf_counter()
        null(x0).block_until_ready()
        base = min(base, (_time.perf_counter() - t0) / n_iter)
    return max(best - base, 1e-9)


def _levelspec(s):
    """Parse a per-level option: "1.333" -> float, "0,1.333" -> tuple."""
    parts = [float(p) for p in str(s).split(",")]
    parts = [int(p) if p == int(p) else p for p in parts]
    return tuple(parts) if len(parts) > 1 else parts[0]


def _lv_kie(psize):
    from .. import fem
    from ..conductivities import as_cell_tensors
    from ..geometry import get_lv_ellipsoid_geometry
    from .bidomain_scale import _bidomain_tensors

    geo = get_lv_ellipsoid_geometry(psize_ref=psize)
    mesh = geo.mesh
    M_i, M_e = _bidomain_tensors(geo.f0)
    V = fem.functionspace(mesh, ("P", 1))
    dt = jnp.float32
    _, k_i = fem.assemble_mass_stiffness_auto(V, as_cell_tensors(M_i, mesh), dtype=dt)
    _, k_e = fem.assemble_mass_stiffness_auto(V, as_cell_tensors(M_e, mesh), dtype=dt)
    return mesh, k_i.combine(1.0, k_e, 1.0)


def run_components(args):
    from ..ops.amg import amg_apply, build_amg
    from ..ops.pallas_ell import LaneGatherMatrix

    mesh, k_ie = _lv_kie(args.psize)
    n = k_ie.shape[0]
    out = {"mode": "components", "psize": args.psize, "n_nodes": int(n)}

    lane = LaneGatherMatrix.from_operator(k_ie, dtype=jnp.float32).to_device()
    x0 = jnp.ones((n,), jnp.float32)
    out["spmv_us"] = round(_timed_loop(lambda x: lane @ x, x0, 1000) * 1e6, 1)
    out["spmv_planes"] = int(lane.n_planes)
    out["spmv_tail_nnz"] = 0 if lane.tail_rows is None else int(lane.tail_rows.size)

    for levels in args.levels:
        t0 = _time.perf_counter()
        hier = build_amg(
            k_ie, dtype=jnp.float32, semidefinite=True,
            max_levels=levels, coarse_n=args.coarse_n, degree=args.degree,
            strength_theta=_levelspec(args.theta),
            omega=_levelspec(args.omega),
            agg_passes=_levelspec(args.agg_passes),
            cache_key=f"amg_probe_lv{args.psize}",
        )
        setup_s = _time.perf_counter() - t0
        hd = hier.to_device(level0_A=lane, lane_gather=True)
        key = f"vcycle_L{levels}"
        out[key + "_us"] = round(
            _timed_loop(lambda r: amg_apply(hd, r), x0, 300) * 1e6, 1
        )
        out[key + "_sizes"] = [int(lv.A.shape[0]) for lv in hd.levels] + [
            int(hd.coarse_inv.shape[0])
        ]
        out[key + "_planes"] = [
            int(getattr(lv.A, "n_planes", -1)) for lv in hd.levels
        ]
        out[key + "_P_planes"] = [
            int(getattr(lv.P, "n_planes", -1)) for lv in hd.levels
        ]
        out[key + "_setup_s"] = round(setup_s, 2)
        # per-level pieces: transfers and operator applications
        for li, lv in enumerate(hd.levels):
            nl = lv.A.shape[0]
            xl = jnp.ones((nl,), jnp.float32)
            out[key + f"_A{li}_us"] = round(
                _timed_loop(lambda r, _A=lv.A: _A @ r, xl, 600) * 1e6, 1,
            )
            out[key + f"_PR{li}_us"] = round(
                _timed_loop(
                    lambda r, _lv=lv, _nl=nl: (_lv.P @ (_lv.R @ r))[:_nl],
                    xl, 600,
                ) * 1e6, 1,
            )
            out[key + f"_A{li}_type"] = type(lv.A).__name__
            out[key + f"_P{li}_type"] = type(lv.P).__name__
        nc = hd.coarse_inv.shape[0]
        out[key + "_dense_us"] = round(
            _timed_loop(
                lambda r: hd.coarse_inv @ r, jnp.ones((nc,), jnp.float32), 1000
            ) * 1e6, 1,
        )
    print(json.dumps(out))


def run_pcg(args):
    """Standalone deflated PCG on the semidefinite u-block ``K_ie``:
    iterations + amortized wall per preconditioner configuration, on the
    device, without the full bidomain composition."""
    from ..ops.amg import amg_apply, build_amg
    from ..ops.cg import cg
    from ..ops.pallas_ell import LaneGatherMatrix

    mesh, k_ie = _lv_kie(args.psize)
    n = k_ie.shape[0]
    lane = LaneGatherMatrix.from_operator(k_ie, dtype=jnp.float32).to_device()
    rng = np.random.default_rng(7)
    x_true = jnp.asarray(rng.standard_normal(n), jnp.float32)
    b = lane @ x_true  # consistent RHS (in range(K))
    b = b - jnp.mean(b)

    def matvec(x):
        y = lane @ (x - jnp.mean(x))
        return y - jnp.mean(y)

    out = {"mode": "pcg", "psize": args.psize, "n_nodes": int(n),
           "rtol": args.rtol}

    def solve_with(tag, hd=None, diag=None):
        # the preconditioner operand (the AMG hierarchy pytree or the
        # Jacobi diagonal) MUST ride the jit arguments: a closure-held
        # device pytree is re-shipped per execution over the remote-TPU
        # tunnel (fused.py:252-258 measured ~22 s/chunk; here an ~80 MB
        # hierarchy read as a 2.2 s "solve")
        @jax.jit
        def run(bb, prec_arg):
            kw = (
                dict(precond=lambda r: amg_apply(prec_arg, r))
                if hd is not None
                else dict(precond_diag=prec_arg)
            )
            x, info = cg(matvec, bb, rtol=args.rtol, atol=0.0,
                         maxiter=2000, **kw)
            return x, info

        prec_arg = hd if hd is not None else diag
        x, info = run(b, prec_arg)
        x.block_until_ready()
        t0 = _time.perf_counter()
        for _ in range(args.reps):
            x, info = run(b, prec_arg)
            x.block_until_ready()
        wall = (_time.perf_counter() - t0) / args.reps
        res = matvec(x) - b
        out[tag + "_iters"] = int(info.iterations)
        out[tag + "_wall_ms"] = round(wall * 1e3, 2)
        out[tag + "_relres"] = float(
            jnp.linalg.norm(res) / jnp.linalg.norm(b)
        )

    solve_with("jacobi", diag=lane.diagonal())
    for levels in args.levels:
        for omega in args.omegas:
            t0 = _time.perf_counter()
            hier = build_amg(
                k_ie, dtype=jnp.float32, semidefinite=True,
                max_levels=levels, coarse_n=args.coarse_n,
                degree=args.degree, omega=_levelspec(omega),
                agg_passes=_levelspec(args.agg_passes),
                strength_theta=_levelspec(args.theta),
                cache_key=f"amg_probe_lv{args.psize}",
            )
            setup = _time.perf_counter() - t0
            hd = hier.to_device(level0_A=lane, lane_gather=True)
            tag = f"amg_L{levels}_w{omega}_p{args.agg_passes}"
            solve_with(tag, hd=hd)
            out[tag + "_setup_s"] = round(setup, 2)
            out[tag + "_sizes"] = [int(lv.A.shape[0]) for lv in hd.levels] + [
                int(hd.coarse_inv.shape[0])
            ]
            out[tag + "_P_planes"] = [
                int(getattr(lv.P, "n_planes", -1)) for lv in hd.levels
            ]
            out[tag + "_A_planes"] = [
                int(getattr(lv.A, "n_planes", -1)) for lv in hd.levels
            ]
    print(json.dumps(out))


def run_solver(args):
    from ..bidomain import BidomainSolver
    from ..telemetry import PerformanceMonitor
    from .bidomain_scale import _bidomain_tensors, _lv_problem, _tp06_kwargs

    class _IterMon(PerformanceMonitor):
        def __init__(self):
            super().__init__()
            self.iters = []

        def record_ksp(self, info):
            self.iters.append(int(info.iterations))

    geo, mesh, I_s, C_m = _lv_problem(args.psize)
    M_i, M_e = _bidomain_tensors(geo.f0)
    mon = _IterMon()
    amg_opts = {}
    if args.max_levels:
        amg_opts["max_levels"] = args.max_levels
    if args.coarse_n:
        amg_opts["coarse_n"] = args.coarse_n
    if args.degree:
        amg_opts["degree"] = args.degree
    if args.omega is not None:
        amg_opts["omega"] = _levelspec(args.omega)
    if args.agg_passes:
        amg_opts["agg_passes"] = _levelspec(args.agg_passes)
    if args.theta:
        amg_opts["strength_theta"] = _levelspec(args.theta)
    t0 = _time.perf_counter()
    bi = BidomainSolver(
        mesh=mesh, M_i=M_i, M_e=M_e, I_s=I_s, C_m=C_m, monitor=mon,
        u_precond=args.precond, u_amg_opts=amg_opts or None,
        scheme=args.scheme,
        gs_u_rtol=args.gs_u_rtol or None,
        cache_key=f"amg_probe_lv{args.psize}",
        **_tp06_kwargs(),
    )
    setup_s = _time.perf_counter() - t0
    dt = 0.05
    # warm chunk (compile) then timed chunks
    bi.solve((0.0, args.warm_ms), dt=dt, save_freq=args.chunk)
    t0 = _time.perf_counter()
    bi.solve((args.warm_ms, args.warm_ms + args.timed_ms), dt=dt,
             save_freq=args.chunk)
    wall = _time.perf_counter() - t0
    v = np.asarray(bi.v)
    print(json.dumps({
        "mode": "solver", "psize": args.psize,
        "n_nodes": int(mesh.num_vertices),
        "precond": args.precond, "amg_opts": amg_opts,
        "u_amg": bool(bi._u_amg), "lane_gather": bool(bi._lane_gather),
        "setup_s": round(setup_s, 2),
        "timed_ms": args.timed_ms, "wall_s": round(wall, 3),
        "ms_per_s": round(args.timed_ms / wall, 2),
        "cg_iters_mean": round(float(np.mean(mon.iters)), 1),
        "cg_iters_max": int(max(mon.iters)),
        "v_max": round(float(v.max()), 2),
        "finite": bool(np.isfinite(v).all()),
    }))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="mode", required=True)
    pc = sub.add_parser("components")
    pc.add_argument("--psize", type=float, default=0.3)
    pc.add_argument("--levels", type=int, nargs="*", default=[12, 3, 2])
    pc.add_argument("--coarse-n", type=int, default=500)
    pc.add_argument("--degree", type=int, default=2)
    pc.add_argument("--theta", type=str, default="0.05")
    pc.add_argument("--omega", type=str, default="1.33333")
    pc.add_argument("--agg-passes", type=str, default="1")
    pp = sub.add_parser("pcg")
    pp.add_argument("--psize", type=float, default=0.3)
    pp.add_argument("--levels", type=int, nargs="*", default=[12, 3])
    pp.add_argument("--omegas", type=str, nargs="*",
                    default=["0", "1.33333"],
                    help="per-level spec, comma = tuple (e.g. 0,1.33333)")
    pp.add_argument("--agg-passes", type=str, default="1",
                    help="per-level spec, comma = tuple (e.g. 2,1)")
    pp.add_argument("--coarse-n", type=int, default=500)
    pp.add_argument("--degree", type=int, default=2)
    pp.add_argument("--theta", type=str, default="0.05",
                    help="strength threshold, per-level spec (comma = "
                         "tuple; 0.10 semicoarsens along fibers)")
    pp.add_argument("--rtol", type=float, default=1e-5)
    pp.add_argument("--reps", type=int, default=3)
    ps = sub.add_parser("solver")
    ps.add_argument("--psize", type=float, default=0.3)
    ps.add_argument("--precond", default="amg")
    ps.add_argument("--max-levels", type=int, default=0)
    ps.add_argument("--coarse-n", type=int, default=0)
    ps.add_argument("--degree", type=int, default=0)
    ps.add_argument("--omega", type=str, default=None,
                    help="per-level spec, comma = tuple")
    ps.add_argument("--theta", type=str, default="",
                    help="strength threshold, per-level spec "
                         "(empty = build_amg default)")
    ps.add_argument("--scheme", default="monolithic",
                    help="bidomain time-coupling scheme (monolithic | gs)")
    ps.add_argument("--gs-u-rtol", type=float, default=0.0,
                    help="gs elliptic-solve relative tolerance (0 = cg_rtol)")
    ps.add_argument("--agg-passes", type=str, default="",
                    help="per-level spec, comma = tuple")
    ps.add_argument("--warm-ms", type=float, default=2.0)
    ps.add_argument("--timed-ms", type=float, default=5.0)
    ps.add_argument("--chunk", type=int, default=40)
    args = ap.parse_args(argv)
    if args.mode == "components":
        run_components(args)
    elif args.mode == "pcg":
        run_pcg(args)
    else:
        run_solver(args)


if __name__ == "__main__":
    main()
