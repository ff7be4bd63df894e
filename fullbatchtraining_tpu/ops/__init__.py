"""Custom compute kernels for the hot ops.

Kernel strategy rationale (why the hot path is XLA-structured rather than
hand-written Pallas, and the measured evidence) lives in VALIDATION.md
under "Kernel strategy".
"""
