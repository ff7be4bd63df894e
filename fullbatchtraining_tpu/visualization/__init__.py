"""Loss-landscape visualization: crunch, results store, plotting."""

from .crunch import crunch
from .database import SurfaceStore, load_surface, surface_path
from .plotting import plot_1d_loss_err_row

__all__ = ["crunch", "SurfaceStore", "load_surface", "surface_path",
           "plot_1d_loss_err_row"]
