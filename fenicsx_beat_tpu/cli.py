"""Command-line interface.

TPU-native counterpart of reference ``src/beat/cli.py``: argparse with
``version`` / ``run`` / ``ecg`` / ``post`` subcommands.  Unlike the
reference (where run/ecg/post are NotImplemented stubs,
``cli.py:124-129``), ``run`` executes a monodomain slab simulation via the
fused TPU solver, and ``version`` reports the JAX device inventory.
"""

from __future__ import annotations

import argparse
import logging
from typing import Optional, Sequence

logger = logging.getLogger(__name__)


def setup_logging(level: int = logging.INFO) -> None:
    """Process-index-aware log format (replaces the reference's MPI-rank
    formatter + rank-0 filter, ``cli.py:8-48``)."""

    class ProcessFilter(logging.Filter):
        def filter(self, record):
            try:
                import jax

                return jax.process_index() == 0
            except Exception:
                return True

    handler = logging.StreamHandler()
    handler.setFormatter(logging.Formatter("[%(levelname)s %(name)s] %(message)s"))
    handler.addFilter(ProcessFilter())
    root = logging.getLogger()
    root.setLevel(level)
    root.handlers = [handler]
    for noisy in ("matplotlib", "jax._src"):
        logging.getLogger(noisy).setLevel(logging.WARNING)


def setup_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="beat-tpu", description="TPU-native cardiac electrophysiology solver"
    )
    parser.add_argument("--verbose", "-v", action="store_true")
    sub = parser.add_subparsers(dest="command")

    sub.add_parser("version", help="Show version and device info")

    run = sub.add_parser("run", help="Run a monodomain slab simulation")
    run.add_argument("--dx", type=float, default=0.5, help="mesh resolution (mm)")
    run.add_argument("--dt", type=float, default=0.05, help="time step (ms)")
    run.add_argument("-T", type=float, default=20.0, help="end time (ms)")
    run.add_argument("--model", default="tentusscher_panfilov_2006", help="ionic model")
    run.add_argument("--outdir", default="results-run", help="output directory")

    ecg = sub.add_parser("ecg", help="Compute pseudo-ECG from saved voltage snapshots")
    ecg.add_argument("checkpoint", help="checkpoint file (.npz) with voltage snapshots")
    ecg.add_argument("--electrode", nargs="+", type=float, action="append", default=None)

    post = sub.add_parser("post", help="Postprocess results (activation times)")
    post.add_argument("checkpoint", help="checkpoint file (.npz)")
    return parser


def display_version_info() -> None:
    import jax

    import fenicsx_beat_tpu

    print(f"fenicsx-beat-tpu: {fenicsx_beat_tpu.__version__}")
    print(f"jax: {jax.__version__}")
    print(f"devices: {jax.devices()}")
    print(f"default backend: {jax.default_backend()}")


def _cmd_run(args) -> int:
    import importlib
    from pathlib import Path

    from .benchmarks.niederer import run_niederer_benchmark

    model = importlib.import_module(f"fenicsx_beat_tpu.models.{args.model}")
    res = run_niederer_benchmark(
        dx=args.dx, dt=args.dt, T=args.T, model=model, outdir=Path(args.outdir)
    )
    print(res.summary())
    return 0


def _cmd_ecg(args) -> int:
    import numpy as np

    from . import fem
    from . import io as io_mod
    from .ecg import ECGRecovery
    from .mesh import CellType, Mesh

    data = io_mod.load_checkpoint(args.checkpoint)
    print(f"Loaded checkpoint with {len(data.times)} snapshots, {data.values.shape[1]} dofs")
    mesh = Mesh(
        coords=np.asarray(data.coords, dtype=np.float64),
        cells=np.asarray(data.cells, dtype=np.int32),
        cell_type=CellType[str(data.cell_type)],
    )
    if args.electrode:
        electrodes = [tuple(p) for p in args.electrode]
    else:
        # default: one electrode one domain-length beyond the max corner
        lo, hi = mesh.coords.min(axis=0), mesh.coords.max(axis=0)
        electrodes = [tuple(hi + (hi - lo))]
    V = fem.functionspace(mesh, ("P", 1))
    v = fem.Function(V)
    ecg = ECGRecovery(v=v)
    forms = [ecg.eval(p) for p in electrodes]
    traces = np.zeros((len(data.times), len(electrodes)))
    for i in range(len(data.times)):
        v.x.array[:] = data.values[i]
        ecg.solve()
        for j, form in enumerate(forms):
            traces[i, j] = float(fem.assemble_scalar(form))
    out = str(args.checkpoint).replace(".npz", "") + "_ecg.npz"
    np.savez(out, times=data.times, traces=traces, electrodes=np.asarray(electrodes))
    for j, p in enumerate(electrodes):
        print(f"electrode {p}: phi_e range [{traces[:, j].min():.4e}, {traces[:, j].max():.4e}]")
    print(f"Saved traces to {out}")
    return 0


def _cmd_post(args) -> int:
    import numpy as np

    from . import io as io_mod

    data = io_mod.load_checkpoint(args.checkpoint)
    v = data.values
    act = np.full(v.shape[1], -1.0)
    for i, t in enumerate(data.times):
        newly = (v[i] > 0.0) & (act < 0)
        act[newly] = t
    print(f"activated nodes: {(act >= 0).sum()}/{act.size}")
    if (act >= 0).any():
        print(f"activation time range: [{act[act >= 0].min():.2f}, {act.max():.2f}] ms")
    return 0


def dispatch(args: argparse.Namespace) -> int:
    setup_logging(logging.DEBUG if args.verbose else logging.INFO)
    if args.command == "version":
        display_version_info()
        return 0
    if args.command == "run":
        return _cmd_run(args)
    if args.command == "ecg":
        return _cmd_ecg(args)
    if args.command == "post":
        return _cmd_post(args)
    setup_parser().print_help()
    return 1


def main(argv: Optional[Sequence[str]] = None) -> int:
    parser = setup_parser()
    args = parser.parse_args(argv)
    return dispatch(args)


if __name__ == "__main__":
    raise SystemExit(main())
