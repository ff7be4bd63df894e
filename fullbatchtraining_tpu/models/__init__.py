"""Model zoo (flax.linen, NHWC, TPU-native)."""

from .models import construct_model, initialize_model, model_rngs
from .modules import (
    GhostBatchNorm,
    Skipper,
    get_loss_fn,
    incorrect_cross_entropy,
    label_smooth_cross_entropy,
    maxup_loss,
)

__all__ = [
    "construct_model",
    "initialize_model",
    "model_rngs",
    "get_loss_fn",
    "Skipper",
    "GhostBatchNorm",
    "label_smooth_cross_entropy",
    "incorrect_cross_entropy",
    "maxup_loss",
]
