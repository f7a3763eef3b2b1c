"""Driver benchmark: Niederer slab on the fused TPU solver.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Metric: simulated milliseconds per wall-clock second on the Niederer
benchmark (dx=0.5 mm, dt=0.05 ms, TP06, to full activation).
``vs_baseline`` reports activation-time fidelity: 1.0 means all nine probe
points match the reference's committed table
(``demos/niederer_benchmark.py:301-311``) within 5%; scaled down by the
excess error otherwise.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dx", type=float, default=0.5)
    parser.add_argument("--dt", type=float, default=0.05)
    parser.add_argument("-T", type=float, default=100.0)
    parser.add_argument("--quick", action="store_true", help="short run for smoke testing")
    parser.add_argument("--x64", action="store_true", help="force float64 (CPU validation)")
    args = parser.parse_args()

    import jax

    if args.x64 or jax.default_backend() == "cpu":
        jax.config.update("jax_enable_x64", True)

    from fenicsx_beat_tpu.benchmarks.niederer import run_niederer_benchmark

    T = 20.0 if args.quick else args.T
    res = run_niederer_benchmark(dx=args.dx, dt=args.dt, T=T)

    err = res.error_vs_published()
    if err is None or err == float("inf"):
        vs_baseline = 0.0
    else:
        # 1.0 when within the 5% activation-time target; degrade smoothly
        vs_baseline = round(min(1.0, 0.05 / max(err, 0.05)), 4)

    print(res.summary(), file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "niederer_ms_simulated_per_sec",
                "value": round(res.ms_per_second, 2),
                "unit": "ms/s",
                "vs_baseline": vs_baseline,
            }
        )
    )


if __name__ == "__main__":
    main()
