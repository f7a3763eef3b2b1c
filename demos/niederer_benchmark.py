"""Niederer 2011 benchmark: activation times on the 20x7x3 mm TP06 slab.

Mirror of reference ``demos/niederer_benchmark.py``: S1 stimulus in a
1.5 mm corner cube, Niederer conductivities, activation times at the 8
slab corners P1-P8 and the center P9; compared against the activation-time
table committed in the reference (``demos/niederer_benchmark.py:301-311``).
Runs on the fused on-device solver (one ``lax.scan`` per check interval).
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
from pathlib import Path

from fenicsx_beat_tpu.benchmarks.niederer import (
    PUBLISHED_ACTIVATION_TIMES,
    run_niederer_benchmark,
)
from fenicsx_beat_tpu.telemetry import PerformanceMonitor


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--dx", type=float, default=0.5, help="mesh resolution (mm)")
    parser.add_argument("--dt", type=float, default=0.05, help="time step (ms)")
    parser.add_argument("-T", type=float, default=100.0, help="max simulated time (ms)")
    parser.add_argument("--theta", type=float, default=1.0)
    parser.add_argument(
        "--all",
        action="store_true",
        help="run the full 9-row (dx, dt) sweep of the published table "
        "(reference demos/niederer_benchmark.py:301-311) and print it",
    )
    parser.add_argument("-o", "--outdir", type=Path, default=Path("results-niederer"))
    parser.add_argument("--quick", action="store_true", help="CI smoke: dx=0.5, short horizon")
    args = parser.parse_args(argv)
    if args.quick:
        args.dx, args.T = 0.5, 5.0

    if args.all:
        rows = []
        for dx in (0.5, 0.2, 0.1):
            for dt in (0.05, 0.01, 0.005):
                r = run_niederer_benchmark(dx=dx, dt=dt, T=args.T, theta=args.theta)
                err = r.error_vs_published()
                rows.append((dx, dt, r))
                print(r.summary())
        print("\n| dx | dt | " + " | ".join(r.activation_times.keys()) + " | max err | ms/s |")
        print("|" + "---|" * 13)
        table_lines = []
        for dx, dt, r in rows:
            err = r.error_vs_published()
            line = (
                f"| {dx} | {dt} | "
                + " | ".join(f"{v:.2f}" for v in r.activation_times.values())
                + f" | {err:.2%} | {r.ms_per_second:.1f} |"
            )
            print(line)
            table_lines.append(line)
        args.outdir.mkdir(parents=True, exist_ok=True)
        (args.outdir / "table.md").write_text("\n".join(table_lines))
        payload = [
            {
                "dx": dx,
                "dt": dt,
                "theta": args.theta,
                "activation_times": r.activation_times,
                "published": PUBLISHED_ACTIVATION_TIMES.get((dx, dt)),
                "max_rel_err": r.error_vs_published(),
                "ms_per_second": round(r.ms_per_second, 2),
                "n_nodes": r.n_nodes,
            }
            for dx, dt, r in rows
        ]
        (args.outdir / "table.json").write_text(json.dumps(payload, indent=2) + "\n")
        return rows

    monitor = PerformanceMonitor(log_frequency=0)
    result = run_niederer_benchmark(
        dx=args.dx, dt=args.dt, T=args.T, theta=args.theta, outdir=args.outdir, monitor=monitor
    )
    print(result.summary())

    key = (args.dx, args.dt)
    if key in PUBLISHED_ACTIVATION_TIMES:
        print("\npoint   ours    published")
        for name, ref in zip(result.activation_times, PUBLISHED_ACTIVATION_TIMES[key]):
            print(f"{name:5s} {result.activation_times[name]:7.2f} {ref:9.2f}")

    (args.outdir / "performance.json").parent.mkdir(parents=True, exist_ok=True)
    monitor.save_summary(args.outdir / "performance.json")
    summary = {
        "dx": args.dx,
        "dt": args.dt,
        "ms_per_second": result.ms_per_second,
        "wall_time_s": result.wall_time_s,
        "n_nodes": result.n_nodes,
        "activation_times": result.activation_times,
    }
    (args.outdir / "summary.json").write_text(json.dumps(summary, indent=2))
    return result


if __name__ == "__main__":
    main()
