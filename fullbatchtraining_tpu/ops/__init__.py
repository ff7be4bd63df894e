"""Custom compute kernels for the hot ops.

``pallas_bn`` is the hand-written fused train-mode BatchNorm (the largest
non-conv cost); it measurably loses to XLA's cross-op-fused BN on chip, so
the model path keeps XLA BN. Kernel strategy rationale and all measured
evidence live in VALIDATION.md under "Kernel strategy".
"""

from . import pallas_bn

__all__ = ["pallas_bn"]
