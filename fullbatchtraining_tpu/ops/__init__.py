"""Custom compute kernels and the kernel strategy for this workload.

This package is intentionally small. The workload's hot loop is bf16
convolution fwd+bwd on 32x32 (CIFAR) to 224x224 (ImageNet) images - ops for
which XLA's TPU conv emitters are already near the practical ceiling - so the
performance work in this framework targets the XLA program STRUCTURE rather
than hand-written Mosaic/Pallas kernels:

* Augmentation (was 35% of the full-batch step): rewritten as one-hot
  selection matmuls that ride the MXU (`data/augmentations.py:
  random_crop_flip_mxu`), eliminating per-image gather ops. The augmented
  step now exactly matches the no-augmentation step (VALIDATION.md).
  A Pallas version was evaluated and rejected: NHWC uint8 images with C=3
  cannot tile the (sublane, 128-lane) VREG layout without padding the channel
  dimension 42x, so a hand-written kernel starts 97% idle on the lane axis.
* Gradient accumulation: the streaming mean update (read-modify-write over
  the parameter tree) is bandwidth-bound and perfectly fused by XLA into a
  single pass; measured cost at TPU-sized blocks is <0.5% of the step.
* The gradient-regularizer's perturb -> re-grad -> combine (BASELINE.json's
  "Pallas fused perturb-and-regrad" candidate) is a pure function inside the
  jitted step; XLA already fuses the parameter perturbation into the second
  backward pass, and the measured gradreg step is exactly 2x the plain step -
  the theoretical minimum for a finite-difference penalty (VALIDATION.md).

Device-level profiling through this environment's tunneled TPU returns
host-only traces (PARITY.md), so further kernel work (e.g. a fused conv+BN
Pallas block for the 3-channel stem) is deferred until real XPlane device
traces are available to attribute the remaining ~73% gap to roofline.
Candidates and the measurement methodology live in VALIDATION.md.
"""
