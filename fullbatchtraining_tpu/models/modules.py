"""Custom layers and loss functions.

TPU-native re-implementations of the reference's custom modules
(/root/reference/fullbatch/models/modules.py:5-133): SkipInit scalar gain,
ghost batch normalization, and the loss-function family. Losses are pure
jittable functions over logits/labels instead of stateful nn.Modules.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from flax import linen as nn


class Skipper(nn.Module):
    """SkipInit scalar gain: out = x * alpha * gain, alpha trainable from 0.

    Mirrors reference modules.py:5-16 (semi-drop-in replacement for batchnorm).
    The ``channels`` argument is accepted for norm-factory compatibility and
    unused, exactly like the reference.
    """

    channels: int = 0
    initial_scale: float = 0.0
    gain: float = 0.2

    @nn.compact
    def __call__(self, x, train: bool = True):
        alpha = self.param("alpha", lambda key: jnp.full((), self.initial_scale, jnp.float32))
        return x * (alpha * self.gain).astype(x.dtype)


class GhostBatchNorm(nn.Module):
    """Ghost batch normalization over virtual sub-batches.

    TPU-native equivalent of the reference's SequentialGhostNorm /
    ParallelGhostNorm (modules.py:19-83): the batch is reshaped into
    ``num_chunks = batch // virtual_batch_size`` virtual batches and
    normalized per-chunk with *shared* scale/bias (SequentialGhostNorm
    semantics), vectorized instead of looped. Running statistics apply the
    reference's SEQUENTIAL per-chunk EMA exactly — the shared inner
    BatchNorm2d is called once per chunk in order (modules.py:31-35), so
    after k chunks ``ra' = m^k ra + (1-m) sum_i m^(k-1-i) stat_i`` with
    torch's unbiased running-var factor per chunk; the weights are static,
    so the fold stays one vectorized expression (oracle-verified).
    """

    channels: int
    virtual_batch_size: int = 64
    momentum: float = 0.9  # flax convention: running = m*running + (1-m)*new
    epsilon: float = 1e-5
    scale_init: Callable = nn.initializers.ones

    @nn.compact
    def __call__(self, x, train: bool = True):
        scale = self.param("scale", self.scale_init, (self.channels,))
        bias = self.param("bias", nn.initializers.zeros, (self.channels,))
        ra_mean = self.variable("batch_stats", "mean", jnp.zeros, (self.channels,))
        ra_var = self.variable("batch_stats", "var", jnp.ones, (self.channels,))

        batch = x.shape[0]
        num_chunks = max(batch // self.virtual_batch_size, 1)
        # Statistics/normalization in at least float32 (torch BN keeps f32
        # stats under AMP) without truncating float64 oracle runs; the layer
        # output returns in x.dtype so bf16 mixed precision stays bf16
        # downstream (CLAUDE.md compute-dtype invariant).
        sdtype = jnp.promote_types(x.dtype, jnp.float32)
        # torch.chunk semantics (reference modules.py:31-35): chunks of size
        # ceil(batch/num_chunks), the last one possibly smaller.
        csize = -(-batch // num_chunks)
        if train and batch % csize == 0:
            chunks = x.astype(sdtype).reshape(batch // csize, csize, *x.shape[1:])
            # per-chunk statistics over (sub-batch, H, W) for NHWC input
            axes = tuple(range(1, chunks.ndim - 1))
            mean = jnp.mean(chunks, axis=axes, keepdims=True)
            var = jnp.var(chunks, axis=axes, keepdims=True)
            normed = (chunks - mean) * jax.lax.rsqrt(var + self.epsilon)
            out = (normed.reshape(x.shape) * scale + bias).astype(x.dtype)
            if not self.is_initializing():
                k = batch // csize
                # sequential EMA over chunks with static weights
                # (reference calls the shared BatchNorm2d once per chunk)
                w = ((1 - self.momentum)
                     * self.momentum ** jnp.arange(k - 1, -1, -1,
                                                   dtype=ra_mean.value.dtype))
                flat_mean = mean.reshape(k, self.channels)
                flat_var = var.reshape(k, self.channels)
                # torch running-var updates use the unbiased estimate
                n = chunks.size / (k * self.channels)
                ra_mean.value = (self.momentum ** k * ra_mean.value
                                 + w @ flat_mean)
                ra_var.value = (self.momentum ** k * ra_var.value
                                + (w @ flat_var) * (n / max(n - 1, 1)))
            return out
        if train:
            # Uneven virtual batches: normalize each static slice (unrolled;
            # chunk counts are small). Running stats fold sequentially per
            # chunk, as the reference's shared inner BatchNorm2d does.
            axes = tuple(range(0, x.ndim - 1))
            outs = []
            new_mean, new_var = ra_mean.value, ra_var.value
            for start in range(0, batch, csize):
                sl = x[start:start + csize].astype(sdtype)
                m = jnp.mean(sl, axis=axes, keepdims=True)
                v = jnp.var(sl, axis=axes, keepdims=True)
                outs.append((sl - m) * jax.lax.rsqrt(v + self.epsilon))
                n = sl.size / self.channels
                new_mean = (self.momentum * new_mean
                            + (1 - self.momentum) * m.reshape(self.channels))
                new_var = (self.momentum * new_var
                           + (1 - self.momentum) * v.reshape(self.channels)
                           * (n / max(n - 1, 1)))
            out = (jnp.concatenate(outs, axis=0) * scale + bias).astype(x.dtype)
            if not self.is_initializing():
                ra_mean.value = new_mean
                ra_var.value = new_var
            return out
        normed = (x.astype(sdtype) - ra_mean.value) * jax.lax.rsqrt(
            ra_var.value + self.epsilon)
        return (normed * scale + bias).astype(x.dtype)


# ---------------------------------------------------------------------------
# Loss functions (reference modules.py:86-133 + training.py:391-413 dispatch).
# All return (mean_loss, per-example diagnostics-free) and operate on logits.
# ---------------------------------------------------------------------------


def _smoothed_nll(logits: jnp.ndarray, labels: jnp.ndarray, smoothing: float) -> jnp.ndarray:
    """Per-sample label-smoothed cross-entropy (huanglianghua variant,

    reference modules.py:86-101): off-target weight smoothing/(C-1),
    target weight 1 - smoothing."""
    # At least float32 for the softmax (bf16/f16 upcast) without truncating
    # float64 training (trajectory-oracle parity).
    log_prob = jax.nn.log_softmax(
        logits.astype(jnp.promote_types(logits.dtype, jnp.float32)), axis=-1)
    classes = logits.shape[-1]
    off = smoothing / (classes - 1.0)
    weight = jnp.full_like(log_prob, off)
    weight = weight.at[jnp.arange(labels.shape[0]), labels].set(1.0 - smoothing)
    return -(weight * log_prob).sum(axis=-1)


def label_smooth_cross_entropy(logits, labels, smoothing: float = 0.0):
    return _smoothed_nll(logits, labels, smoothing).mean()


def incorrect_cross_entropy(logits, labels, smoothing: float = 0.0):
    """Cross-entropy only on incorrectly classified examples (modules.py:104-119).

    Matches the reference's actual computation: per-sample loss is masked (not
    filtered), and the mean is over the full batch.
    """
    correct = (logits.argmax(axis=-1) == labels).astype(jnp.float32)
    loss = _smoothed_nll(logits, labels, smoothing)
    return (loss * (1.0 - jax.lax.stop_gradient(correct))).mean()


def maxup_loss(logits, labels, ntrials: int = 10):
    """Maxup: per group of ntrials augmented copies, take the max loss.

    Mirrors modules.py:122-133, with the reference's latent bug fixed:
    there ``ntrials`` was accepted but hardcoded to 10 (modules.py:127);
    here the argument is honored.
    """
    batch = logits.shape[0] // ntrials
    loss = _smoothed_nll(logits, labels, 0.0).reshape(batch, ntrials)
    return loss.max(axis=1).mean()


def get_loss_fn(cfg_hyp, batch_size=None) -> Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]:
    """Loss dispatch mirroring reference training.py:391-413 (which receives
    the batch size for the 'batch-maxup' modification).

    Maxup + label smoothing raises, as in the reference ("Loss modification
    not implemented in conjunction with label smoothing",
    training.py:393-400) — but only for smoothing != 0. The reference's
    guard tests ``label_smoothing not in [None, ""]``, so the DEFAULT 0.0
    also trips it, making every maxup run require label_smoothing=null as a
    workaround; treating 0.0 as no-smoothing implements the guard's intent
    (documented fix, PARITY policy)."""
    smoothing = float(cfg_hyp.label_smoothing or 0.0)
    modification = cfg_hyp.loss_modification
    if smoothing and modification is not None and modification != "incorrect-xent":
        raise ValueError(
            "Loss modification not implemented in conjunction with label smoothing.")

    if modification is None:
        def loss_fn(logits, labels):
            return label_smooth_cross_entropy(logits, labels, smoothing)
    elif modification == "incorrect-xent":
        def loss_fn(logits, labels):
            return incorrect_cross_entropy(logits, labels, smoothing)
    elif modification == "batch-maxup":
        # reference training.py:407: MaxupLoss(ntrials=batch_size)
        if batch_size is None:
            raise ValueError("loss_modification=batch-maxup needs the batch size.")
        ntrials = int(batch_size)

        def loss_fn(logits, labels):
            return maxup_loss(logits, labels, ntrials)
    elif "maxup" in str(modification):
        spec = str(modification)
        ntrials = int(spec.split("maxup-")[1]) if "maxup-" in spec else 10

        def loss_fn(logits, labels):
            return maxup_loss(logits, labels, ntrials)
    else:
        raise ValueError(f"Invalid loss modification {modification}.")
    return loss_fn
