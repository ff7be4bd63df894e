"""fullbatchtraining_tpu: TPU-native full-batch training framework.

A ground-up JAX/XLA/shard_map re-architecture with the capabilities of
JonasGeiping/fullbatchtraining (arXiv:2109.14119). See README.md for the
design and PARITY.md for the component-by-component reference map.
"""

__version__ = "0.1.0"

from .config import ConfigNode, from_dict, load_config, to_yaml

__all__ = [
    "ConfigNode",
    "load_config",
    "from_dict",
    "to_yaml",
    "construct_databundle",
    "construct_model",
    "initialize_model",
    "make_mesh",
    "train",
    "job_startup",
    "system_startup",
    "save_summary",
]


def __getattr__(name):
    """Lazy top-level API (keeps `import fullbatchtraining_tpu` jax-free)."""
    if name in ("construct_databundle",):
        from .data import construct_databundle
        return construct_databundle
    if name in ("construct_model", "initialize_model"):
        from . import models
        return getattr(models, name)
    if name == "make_mesh":
        from .parallel import make_mesh
        return make_mesh
    if name == "train":
        from .training import train
        return train
    if name in ("job_startup", "system_startup", "save_summary"):
        from . import utils
        return getattr(utils, name)
    if name == "pretrained":
        from . import pretrained
        return pretrained
    raise AttributeError(name)
