"""Analysis subsystem: norms, gradient statistics, flatness."""

from .analysis import analyze
from .directions import create_random_direction, perturb2threshold, set_parameter_offset
from .welford import (
    WelfordState,
    welford_finalize,
    welford_init,
    welford_merge,
    welford_update,
)

__all__ = [
    "analyze",
    "create_random_direction",
    "perturb2threshold",
    "set_parameter_offset",
    "WelfordState",
    "welford_init",
    "welford_update",
    "welford_merge",
    "welford_finalize",
]
