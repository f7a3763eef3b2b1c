"""fenicsx_beat_tpu — TPU-native monodomain cardiac electrophysiology.

A from-scratch JAX/XLA/Pallas re-implementation of the capabilities of
finsberg/fenicsx-beat, designed TPU-first: precompiled ELL operators,
jitted theta-rule stepping with on-device CG, fused ``lax.scan`` time loops
and ``shard_map`` spatial sharding replace the reference's
UFL/FFCx/DOLFINx/PETSc/MPI stack.

Public surface mirrors the reference package
(``src/beat/__init__.py:16-49``).
"""

from . import (
    base_model,
    conductivities,
    config,
    fem,
    mesh,
    stimulation,
    telemetry,
    units,
)
from .base_model import BaseModel, Results, Status
from .monodomain_model import MonodomainModel
from .stimulation import Stimulus
from .telemetry import BaseMonitor, NullMonitor, PerformanceMonitor

__version__ = "0.1.0"
__author__ = "fenicsx-beat-tpu developers"
__program_name__ = "fenicsx-beat-tpu"

from . import (  # noqa: E402
    ecg,
    fused,
    geometry,
    io,
    models,
    monodomain_model,
    monodomain_solver,
    odesolver,
    single_cell,
    utils,
)
from .ecg import ECGRecovery
from .fused import FusedMonodomainSolver
from .monodomain_solver import MonodomainSplittingSolver

__all__ = [
    "monodomain_model",
    "odesolver",
    "base_model",
    "MonodomainModel",
    "monodomain_solver",
    "MonodomainSplittingSolver",
    "utils",
    "conductivities",
    "stimulation",
    "geometry",
    "single_cell",
    "ecg",
    "Stimulus",
    "ECGRecovery",
    "telemetry",
    "BaseMonitor",
    "NullMonitor",
    "PerformanceMonitor",
    "fem",
    "mesh",
    "units",
    "fused",
    "FusedMonodomainSolver",
    "io",
    "models",
]
