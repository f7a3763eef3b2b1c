"""Test configuration: CPU backend, 8 virtual devices, x64 precision.

Mirrors the reference's dual CI strategy (serial + ``mpirun -n 2``,
``.github/workflows/main-mpi.yml``): the same suite runs single-device and,
for the sharding tests, over an 8-device virtual CPU mesh
(``--xla_force_host_platform_device_count=8``).
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The TPU plugin in this environment ignores JAX_PLATFORMS from the env;
# the config update is authoritative. Tests must run on (virtual 8-device)
# CPU with float64.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
