"""Pallas fused train-mode BatchNorm (stats + normalize + full backward).

The reference's hot loop spends its norm-layer time in cuDNN batch-norm
(reference fullbatch/models/resnets.py:41, torch.nn.BatchNorm2d); here the
default path is XLA's fusion of ``_TorchBatchNorm`` (models/layers.py),
measured at ~5 HBM passes over the activations per fwd+bwd
(VALIDATION.md "Norm-layer share"). This module is the hand-written
alternative: four Pallas kernels over the flattened ``[M, C]`` activation
view —

* ``_stats``      one pass over x: per-channel sum and sum-of-squares
* ``_apply``      one pass: ``y = a*x + b`` with folded per-channel affine
* ``_bwd_reduce`` one pass over (dy, x): ``s1 = sum(dy)``, ``s2 = sum(dy*x)``
* ``_bwd_apply``  one pass: ``dx = a*dy + c1 + c2*x`` (full BN backward,
  mean/var treated as functions of x, folded into per-channel c1/c2)

giving the theoretical-minimum 8 passes for an unfused BN, versus XLA's ~5
achieved through cross-op fusion with the neighbouring convolutions (which
a Pallas custom call necessarily breaks). Both implementations are exposed
so the choice is a measurement, not a guess — see ``tools/pallas_bn_bench.py``
and the "Kernel strategy" section of VALIDATION.md for the verdict on chip.

Semantics match ``_TorchBatchNorm``: statistics in float32 regardless of
compute dtype, biased variance for normalization (running-stat updates stay
in the flax module). Falls back to the pure-JAX path whenever the flattened
row count does not tile, for float64 inputs (trajectory-oracle runs), or on
non-TPU backends without interpret mode.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pallas TPU backend is absent on some CPU-only builds
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

# Rows per grid step, scaled so a block is ~1 MiB and double-buffers in VMEM.
_TARGET_BLOCK_BYTES = 1 << 20
_INTERPRET = False  # flipped by tests on CPU


def _row_tile(m: int, c: int, itemsize: int) -> int | None:
    """Largest power-of-two divisor of m with tile_bytes <= target (min 16).

    Sized by the float32 compute footprint at the lane-padded width (C pads
    to a multiple of 128 in VMEM), not the HBM dtype - the kernel bodies
    materialize f32 temporaries per block and VMEM is only ~16 MiB."""
    del itemsize
    tm = 16
    if m % tm:
        return None
    padded_c = -(-c // 128) * 128
    while (m % (tm * 2) == 0
           and (tm * 2) * padded_c * 4 <= _TARGET_BLOCK_BYTES):
        tm *= 2
    return tm


def _grid_call(kernel, n_in, m, c, tm, out_rows, out_dtypes, x_like, *args):
    """Common pallas_call wiring: grid over row tiles, [M,C] inputs blocked
    by rows, small per-channel outputs revisited (and accumulated) by every
    grid step."""
    row_spec = pl.BlockSpec((tm, c), lambda i: (i, 0))
    chan_spec = pl.BlockSpec((out_rows, c), lambda i: (0, 0))
    return pl.pallas_call(
        kernel,
        grid=(m // tm,),
        in_specs=[row_spec] * n_in + [chan_spec] * (len(args) - n_in),
        out_specs=tuple(pl.BlockSpec((out_rows, c), lambda i: (0, 0))
                        if d is None else row_spec for d in out_dtypes),
        out_shape=tuple(
            jax.ShapeDtypeStruct((out_rows, c), jnp.float32) if d is None
            else jax.ShapeDtypeStruct((m, c), x_like.dtype)
            for d in out_dtypes),
        interpret=_INTERPRET,
    )(*args)


def _stats_kernel(x_ref, sums_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        sums_ref[:] = jnp.zeros_like(sums_ref)
    xf = x_ref[:].astype(jnp.float32)
    sums_ref[0:1, :] += jnp.sum(xf, axis=0, keepdims=True)
    sums_ref[1:2, :] += jnp.sum(xf * xf, axis=0, keepdims=True)


def _apply_kernel(x_ref, ab_ref, y_ref):
    xf = x_ref[:].astype(jnp.float32)
    y_ref[:] = (xf * ab_ref[0:1, :] + ab_ref[1:2, :]).astype(y_ref.dtype)


def _bwd_reduce_kernel(dy_ref, x_ref, sums_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        sums_ref[:] = jnp.zeros_like(sums_ref)
    dyf = dy_ref[:].astype(jnp.float32)
    xf = x_ref[:].astype(jnp.float32)
    sums_ref[0:1, :] += jnp.sum(dyf, axis=0, keepdims=True)
    sums_ref[1:2, :] += jnp.sum(dyf * xf, axis=0, keepdims=True)


def _bwd_apply_kernel(dy_ref, x_ref, coef_ref, dx_ref):
    dyf = dy_ref[:].astype(jnp.float32)
    xf = x_ref[:].astype(jnp.float32)
    dx = dyf * coef_ref[0:1, :] + coef_ref[1:2, :] + xf * coef_ref[2:3, :]
    dx_ref[:] = dx.astype(dx_ref.dtype)


def _plan(x):
    """[..., C] -> ([M, W] view, C, pack, row_tile) or None if untileable.

    Channels narrower than the 128-lane VREG are packed pack-per-row
    ([M/pack, pack*C], a pure row-major view) so the VPU lanes are full;
    per-channel vectors fold/tile by pack around the kernels. Falls back to
    the unpacked view when the packed row count does not tile."""
    c = x.shape[-1]
    flat = x.reshape(-1, c)
    if 0 < c < 128 and 128 % c == 0 and flat.shape[0] % (128 // c) == 0:
        pack = 128 // c
        tm = _row_tile(flat.shape[0] // pack, pack * c, x.dtype.itemsize)
        if tm is not None:
            return flat.reshape(-1, pack * c), c, pack, tm
    tm = _row_tile(flat.shape[0], c, x.dtype.itemsize)
    if tm is None:
        return None
    return flat, c, 1, tm


def supported(x) -> bool:
    """True when the pallas path can run this input (shape/dtype/backend)."""
    if not _HAS_PLTPU or x.dtype == jnp.float64 or x.ndim < 2:
        return False
    if _plan(x) is None:
        return False
    if not _INTERPRET and jax.default_backend() != "tpu":
        return False
    return True


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def bn_train(x, scale, bias, eps: float = 1e-5):
    """Fused train-mode batch norm: (y, mean, biased_var) over all axes
    except the trailing channel axis. Gradient-correct in x/scale/bias with
    mean/var treated as functions of x (same graph torch autograd sees)."""
    y, mean, var, _ = _fwd_impl(x, scale, bias, eps)
    return y, mean, var


def _fwd_impl(x, scale, bias, eps):
    xf, c, pack, tm = _plan(x)
    m, w = xf.shape
    n = m * pack  # elements per channel
    sums, = _grid_call(_stats_kernel, 1, m, w, tm, 2, (None,), xf, xf)
    sums = sums.reshape(2, pack, c).sum(axis=1)
    mean = sums[0] / n
    var = sums[1] / n - mean * mean
    invstd = jax.lax.rsqrt(var + eps)
    a = scale.astype(jnp.float32) * invstd
    b = bias.astype(jnp.float32) - mean * a
    ab = jnp.stack([jnp.tile(a, pack), jnp.tile(b, pack)])
    y, = _grid_call(_apply_kernel, 1, m, w, tm, 2, (x.dtype,), xf, xf, ab)
    return y.reshape(x.shape), mean, var, invstd


def _bn_train_fwd(x, scale, bias, eps):
    y, mean, var, invstd = _fwd_impl(x, scale, bias, eps)
    return (y, mean, var), (x, scale, mean, invstd)


def _bn_train_bwd(eps, residuals, cotangents):
    x, scale, mean, invstd = residuals
    dy, dmean, dvar = cotangents
    xf, c, pack, tm = _plan(x)
    dyf = dy.reshape(xf.shape)
    m, w = xf.shape
    n = m * pack  # elements per channel
    sums, = _grid_call(_bwd_reduce_kernel, 2, m, w, tm, 2, (None,),
                       xf, dyf, xf)
    sums = sums.reshape(2, pack, c).sum(axis=1)
    s1 = sums[0]                      # sum(dy)
    s2 = sums[1] - mean * s1          # sum(dy * (x - mean))
    g = scale.astype(jnp.float32)
    a = g * invstd
    # dx = a*dy + c1 + c2*x: the dy-path terms plus the cotangents of the
    # mean/var outputs (zero in training use; kept for vjp correctness).
    c2 = (-a * invstd * invstd * s2 + 2.0 * dvar) / n
    c1 = (-a * s1 + dmean) / n - c2 * mean
    coef = jnp.stack([jnp.tile(a, pack), jnp.tile(c1, pack),
                      jnp.tile(c2, pack)])
    dx, = _grid_call(_bwd_apply_kernel, 2, m, w, tm, 3, (x.dtype,),
                     xf, dyf, xf, coef)
    dscale = (s2 * invstd).astype(scale.dtype)
    dbias = s1.astype(scale.dtype)
    return dx.reshape(x.shape), dscale, dbias


bn_train.defvjp(_bn_train_fwd, _bn_train_bwd)


def bn_train_reference(x, scale, bias, eps: float = 1e-5):
    """Pure-JAX twin of bn_train (the fallback and the test oracle)."""
    xf = x.astype(jnp.float32)
    axes = tuple(range(x.ndim - 1))
    mean = jnp.mean(xf, axes)
    var = jnp.mean(jnp.square(xf), axes) - jnp.square(mean)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = (y * scale.astype(jnp.float32) + bias.astype(jnp.float32))
    return y.astype(x.dtype), mean, var
