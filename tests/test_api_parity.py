"""Symbol-level API parity with the reference package.

Every public symbol the reference defines (``/root/reference/src/beat/*.py``,
module by module) must exist under the same name in the same module here,
so a reference user can port scripts by changing only the import root.
(Behavioral parity is pinned by the per-module suites; this is the
cheap completeness gate.)
"""

import importlib

import pytest

REFERENCE_SURFACE = {
    "base_model": ["Status", "Results", "BaseModel"],
    "cli": ["setup_logging", "setup_parser", "display_version_info", "dispatch", "main"],
    "conductivities": [
        "get_dimension",
        "default_conductivities",
        "Conductivities",
        "get_harmonic_mean_conductivity",
        "conductivity_tensor",
        "define_conductivity_tensor",
    ],
    "ecg": [
        "detect_r_peaks",
        "detect_t_end",
        "QTIntervalResult",
        "qt_interval",
        "ECGRecovery",
        "Leads12",
        "example",
    ],
    "geometry": [
        "Geometry",
        "get_2D_slab_microstructure",
        "get_3D_slab_microstructure",
        "get_2D_slab_mesh",
        "get_3D_slab_mesh",
        "get_3D_slab_geometry",
        "get_2D_slab_geometry",
    ],
    "monodomain_model": ["MonodomainModel"],
    "monodomain_solver": ["ODESolver", "MonodomainSplittingSolver"],
    "odesolver": [
        "ODEResults",
        "solve",
        "ODESystemSolver",
        "BaseDolfinODESolver",
        "DolfinODESolver",
        "DolfinMultiODESolver",
    ],
    "single_cell": ["solve_with_save", "solve_without_save", "compute_hash", "get_steady_state"],
    "stimulation": [
        "Stimulus",
        "compute_effective_dim",
        "get_dZ",
        "convert_amplitude",
        "compute_stimulus_unit",
        "convert_chi",
        "define_stimulus",
        "near",
        "generate_random_activation",
    ],
    "telemetry": ["BaseMonitor", "NullMonitor", "PerformanceMonitor"],
    "units": ["to_quantity"],
    "utils": [
        "interpolation_points",
        "local_project",
        "parse_element",
        "space_from_string",
        "expand_layer",
        "expand_layer_biv",
    ],
}

# reference src/beat/__init__.py:29-49
REFERENCE_ALL = [
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
]


@pytest.mark.parametrize("module", sorted(REFERENCE_SURFACE))
def test_module_symbols_present(module):
    mod = importlib.import_module(f"fenicsx_beat_tpu.{module}")
    missing = [n for n in REFERENCE_SURFACE[module] if not hasattr(mod, n)]
    assert not missing, f"fenicsx_beat_tpu.{module} lacks reference symbols: {missing}"


def test_package_all_superset():
    import fenicsx_beat_tpu as beat

    missing = [n for n in REFERENCE_ALL if n not in beat.__all__]
    assert not missing, f"__all__ lacks reference exports: {missing}"
