"""In-repo ionic cell models (replaces the reference's gotranx codegen, L9).

Each model module exposes the contract the solvers consume (used at
reference ``demos/niederer_benchmark.py:88-92``):

* ``init_state_values(**overrides) -> np.ndarray``
* ``init_parameter_values(**overrides) -> np.ndarray``
* ``state_index(name) / parameter_index(name)``
* one or more schemes: ``forward_euler`` / ``generalized_rush_larsen``
  with signature ``(states, t, parameters, dt) -> new_states`` operating on
  ``(num_states, num_points)`` arrays — jax-traceable and vectorized.
"""

from . import fitzhughnagumo  # noqa: F401
from . import tentusscher_panfilov_2006  # noqa: F401
from . import torord_dyncl  # noqa: F401
from . import torord_dyncl_land  # noqa: F401

__all__ = [
    "fitzhughnagumo",
    "tentusscher_panfilov_2006",
    "torord_dyncl",
    "torord_dyncl_land",
]
