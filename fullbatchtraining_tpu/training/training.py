"""Full-batch / stochastic training core, TPU-native.

Re-architecture of the reference training loop
(/root/reference/fullbatch/training/training.py:50-341) as ONE jitted XLA
program per optimizer step (SURVEY.md §7):

    full_gradient(state, epoch) =
        shard_map over Mesh('data'):
            lax.scan over blocks x chunks (device-side augmentation per chunk)
                value_and_grad (+ grad-reg re-grad/HVP fused into the body)
                streaming mean in accumulation dtype
                    (counter = n_devices*(block*chunks+idx+1), the reference's
                     _stable_mean_accumulation, training.py:45-47, :168)
            -> one psum over 'data'   [replaces _allreduce_coalesced + dist.reduce,
                                       training/utils.py:31-41]
    step = gradient modifiers (norm-bias/clip/noise, training.py:187-215)
         + optimizer update + schedule + EMA, all in the same program.

The stochastic sanity-check mode (training.py:241-286) is a second jitted
program scanning optimizer updates over the shuffled blocks of one epoch.

Deviations from the reference, documented:
* BatchNorm running stats are pmean'd across devices every step instead of
  only at eval (training.py:348-357) - EMAs are linear, so the end state is
  identical while keeping the train state replicated.
* The reference's stochastic multi-GPU path all-reduce SUMS raw block
  gradients (no 1/world_size), silently scaling the lr by world size; we
  pmean, which is the intended semantics.
* The extra gradient evaluations of finite-difference grad-reg do not mutate
  BN running stats (a side effect of torch's train-mode forward passes).
* REFERENCE BUG FIXED: the reference's streaming mean uses counter
  num_machines*(chunk_index+1) per machine and then all-reduce-SUMs
  (training.py:168, training/utils.py:31-41). The pre-division by
  num_machines inside the rescaling recurrence does NOT commute with the
  final sum: for num_machines>1 and more than one chunk per machine the
  result overweights early chunks and overscales the total (measured 46%
  max relative gradient error at 2 chunks/device x 8 devices). Exact for
  one machine - which is how the paper's single-GPU results were run. We
  accumulate the exact LOCAL mean (counter = chunk_index+1) and divide by
  n_dev after the single psum; the multi-device gradient now equals the
  true dataset mean (tests: sharding invariance at multiple chunks/device).
* REFERENCE BUG FIXED: any reference run with hyp.batch_clip set crashes -
  its _record_stats reads `clipped_batches` (training.py:118), a local
  variable of the SIBLING closure _accumulate_full_gradient (:143), so
  recording raises NameError unconditionally (and with a global injected,
  the recorded count is never the real one). Here clipped_batches is a
  metrics entry that rides the step's psum; trajectory-oracle recipe
  `batchclip` drives the reference with a minimal crash-fix and matches it
  at rtol 1e-7.
"""

from __future__ import annotations

import dataclasses
import functools
import logging
import os
import time
from collections import defaultdict
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax.sharding import Mesh, PartitionSpec as P

from ..data.augmentations import normalize as normalize_images
from ..data.pipeline import DataBundle, epoch_layout, layout_epoch, stream_plan
from ..models.modules import get_loss_fn
from ..parallel.mesh import (DATA_AXIS, put_global, shard_epoch_arrays,
                             stream_segments)
from .grad_reg import make_grad_regularizer, tree_sqnorm
from .optimizers import optim_interface
from .utils import save_checkpoint, load_checkpoint

log = logging.getLogger(__name__)

_DTYPES = {"float": jnp.float32, "float32": jnp.float32, "float64": jnp.float64,
           "bfloat16": jnp.bfloat16, "float16": jnp.float16, "double": jnp.float64}

# All norm layers update running stats as an affine map of the incoming
# stats, b = A*r + c(batch) (models/layers.py:168, models/modules.py:50; for
# GhostBatchNorm the per-forward decay A is momentum**chunks). The grouped
# accumulation path folds the vmapped per-chunk updates into the exact
# sequential composition using the true per-leaf decay, MEASURED at
# make_train_functions time (models.measure_norm_stat_decay); grouping is
# disabled only if an update turns out not to be affine.
_BN_MOMENTUM = 0.9


def _resolve_block_grouping(spec, total_chunks: int, sub: int,
                            act_bytes_per_sample=None,
                            act_budget=None, double_activations=False) -> int:
    """Chunks per vmapped group in the accumulation scan.

    'auto' targets an effective conv batch of ~512 samples (cap 16 chunks) so
    small-block recipes (e.g. highreg's batch 32) tile onto the MXU instead
    of running hundreds of sequential tiny convolutions — then shrinks the
    group so the group's live activations (``act_bytes_per_sample`` from an
    abstract model trace, doubled under grad_reg's second differentiation
    pass) fit ``impl.activation_budget_bytes``: a 512-wide gradreg group on
    ResNet-152 OOMs a 16 GB chip (measured, VALIDATION.md "ResNet-152 +
    high reg"; auto now degrades it to 1, and an explicit
    ``impl.block_grouping=4`` is the measured sweet spot there), while
    ResNet-18 highreg keeps its measured-optimal 16.
    Explicit integer specs are trusted unchanged. Chunk counts that
    don't divide evenly leave a ragged tail that is accumulated sequentially;
    1 disables grouping; a bare ``true`` means 'auto'."""
    if spec is True:
        spec = "auto"
    if spec is None or spec is False or spec in (0, 1):
        return 1
    cap = max(1, 512 // max(sub, 1)) if spec == "auto" else int(spec)
    if spec == "auto":
        cap = min(cap, 16)
        if act_bytes_per_sample:
            budget = int(act_budget or (9 << 30))
            per_chunk = max(sub, 1) * int(act_bytes_per_sample)
            per_chunk *= 2 if double_activations else 1
            cap = min(cap, max(1, budget // max(per_chunk, 1)))
    return max(1, min(cap, total_chunks))


def _resolve_eval_chunking(spec, batch: int, act_bytes_per_sample=None,
                           act_budget=None, double: bool = False) -> int:
    """Sub-chunks per eval block (``impl.eval_block_chunks``).

    Eval sweeps blocks of ``data.batch_size`` samples; unlike training —
    whose accumulation chunks got an activation-aware auto cap — a block
    used to run as ONE forward, so eval could OOM where training could not
    (measured: ResNet-50 CIFAR-stem @224 eval needs a single 12.25 GB
    stem activation at batch 2048; the reference evaluates wherever its
    training fits, training.py:343-388). 'auto' picks the smallest divisor
    of ``batch`` whose sub-chunk activation estimate fits
    ``impl.activation_budget_bytes``; eval metrics are per-sample sums, so
    the split is semantics-free. ``double`` charges two live forwards
    (hyp.test_time_flips keeps the first softmax alive across the second
    pass). Explicit integer specs are rounded UP to the nearest divisor;
    1 disables chunking."""
    if spec is True:
        spec = "auto"
    if spec is None or spec is False or spec in (0, 1):
        return 1
    if spec == "auto":
        if not act_bytes_per_sample:
            return 1
        budget = int(act_budget or (9 << 30))
        per_sample = int(act_bytes_per_sample) * (2 if double else 1)
        need = -(-(batch * per_sample) // max(budget, 1))
        if need <= 1:
            return 1
    else:
        need = max(1, int(spec))
    for k in range(min(need, batch), batch + 1):
        if batch % k == 0:
            return k
    return batch


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Any = None
    ema_batch_stats: Any = None
    extra: Any = None  # closure-optimizer scratch (momentum resets etc.)


def tree_clip_by_norm(tree, max_norm, norm_type, eps=1e-6):
    """Reference _clip_gradient_list semantics (training/utils.py:5-19).

    Returns (clipped_tree, was_clipped, pre_norm)."""
    if norm_type == float("inf") or norm_type == "inf":
        norm = jnp.max(jnp.asarray([jnp.max(jnp.abs(g)) for g in jax.tree.leaves(tree)]))
    elif norm_type == 2:
        norm = jnp.sqrt(tree_sqnorm(tree))
    else:
        p = float(norm_type)
        norm = sum(jnp.sum(jnp.abs(g) ** p) for g in jax.tree.leaves(tree)) ** (1.0 / p)
    clipped = norm > max_norm
    scale = jnp.where(clipped, max_norm / (norm + eps), 1.0)
    return jax.tree.map(lambda g: g * scale, tree), clipped, norm


@dataclasses.dataclass
class TrainFunctions:
    """Jit-compiled step programs + host-side helpers."""

    full_step: Callable
    stochastic_step: Callable
    eval_step: Callable
    gradient_eval: Callable       # (state, images, labels) -> grads, bn, metrics (closure opt / FP audit)
    init_state: Callable
    schedule: Callable
    layout: tuple                 # (num_blocks, chunks, sub)
    num_devices: int
    info: dict
    opt_update: Callable = None   # raw (grads, opt_state, params, lr) -> (params, opt_state)
    ema_step: Callable = None     # (state) -> state with EMA refreshed (no-op when off)
    block_gradient_eval: Callable = None  # per-block stochastic closure gradient
    group: int = 1                # chunks per vmapped group in the accumulation scan
    streamed: bool = False        # epoch exceeds HBM budget: host-resident, segment-streamed
    mesh: Any = None              # the device mesh (streamed block staging needs it)


def make_train_functions(model, bundle: DataBundle, mesh: Mesh, cfg) -> TrainFunctions:
    hyp, impl = cfg.hyp, cfg.impl
    n_dev = mesh.devices.size
    # Semi-stochastic mode draws ONE bake round per step (reference
    # construct_subset_dataloader, data_preparation.py:89-112), so the epoch
    # layout covers a single round, not the flat N x dataset.
    semi = hyp.train_semi_stochastic and bundle.baked is not None
    effective_size = bundle.size // bundle.baked.rounds if semi else bundle.size
    num_blocks, chunks, sub = epoch_layout(
        effective_size, bundle.batch_size, hyp.sub_batch, n_dev, dryrun=cfg.dryrun)
    act_bytes = None
    _group_spec = impl.get("block_grouping", "auto")
    _eval_spec = impl.get("eval_block_chunks", "auto")
    if (_group_spec == "auto" or _group_spec is True
            or _eval_spec == "auto" or _eval_spec is True):  # NOT `in`: 1 == True
        from ..models.models import estimate_activation_bytes
        _est_dtype = (_DTYPES[impl.compute_dtype] if impl.compute_dtype
                      else (jnp.bfloat16 if impl.mixed_precision
                            else _DTYPES[impl.dtype]))
        act_bytes = estimate_activation_bytes(model, bundle.pixels,
                                              bundle.channels,
                                              compute_dtype=_est_dtype)
    eval_chunks = _resolve_eval_chunking(_eval_spec, bundle.batch_size,
                                         act_bytes,
                                         impl.get("activation_budget_bytes"),
                                         double=bool(hyp.test_time_flips))
    if eval_chunks > 1:
        log.info("Eval blocks of %d samples split into %d sub-chunks of %d "
                 "(activation budget; metrics are sums — exact)",
                 bundle.batch_size, eval_chunks, bundle.batch_size // eval_chunks)
    gradreg_on = bool(hyp.grad_reg.block_strength or hyp.grad_reg.acc_strength)
    group = _resolve_block_grouping(impl.get("block_grouping", "auto"),
                                    num_blocks * chunks, sub,
                                    act_bytes_per_sample=act_bytes,
                                    act_budget=impl.get("activation_budget_bytes"),
                                    double_activations=gradreg_on)
    if group > 1:
        log.info("Accumulation scan groups %d chunks of %d samples per step "
                 "(vmapped; impl.block_grouping=%s)",
                 group, sub, impl.get("block_grouping", "auto"))

    # Streamed mode: keep the epoch in host RAM when the laid-out epoch does
    # not fit the HBM budget; segments are device_put ahead of the compute.
    per_img_bytes = (int(np.prod(bundle.train.images.shape[1:]))
                     * bundle.train.images.dtype.itemsize)
    streamed, stream_seg_blocks, epoch_bytes = stream_plan(
        num_blocks, chunks, sub, n_dev, per_img_bytes, impl)
    if streamed:
        log.info("Epoch (%.1f GB laid out) exceeds impl.hbm_epoch_max_bytes "
                 "(%.1f GB): streamed accumulation in segments of %d blocks.",
                 epoch_bytes / 2**30,
                 int(impl.get("hbm_epoch_max_bytes", 8 << 30)) / 2**30,
                 stream_seg_blocks)

    bn_momentum = float(impl.get("bn_momentum", _BN_MOMENTUM))
    bn_decay = None
    if group > 1:
        # The grouped-scan BN fold composes per-chunk affine stat updates
        # b = A*r + c: measure the true per-leaf decay A concretely (ghost
        # norm's per-forward decay is momentum**chunks; heterogeneous
        # momenta give per-layer values) instead of trusting
        # impl.bn_momentum blindly; disable grouping only when an update is
        # not affine in the incoming stats (then no fold can compose it).
        from ..models.models import detect_norm_momenta, measure_norm_stat_decay
        # Gate the probe on STAT PRESENCE (measure_norm_stat_decay checks for
        # batch_stats abstractly and returns (None, True) for stat-free
        # models), never on whether layers expose a `momentum` attribute — a
        # stats-bearing layer without one must still be probed, else the fold
        # below silently composes with the default bn_momentum.
        bn_decay, affine_ok = measure_norm_stat_decay(
            model, sub, bundle.pixels, bundle.channels)
        if not affine_ok:
            log.warning(
                "A norm layer's running-stat update is not affine in the "
                "incoming stats; the grouped BN fold cannot compose it "
                "— disabling block grouping (impl.block_grouping=1).")
            group = 1
        elif bn_decay is not None:
            detected = detect_norm_momenta(model, bundle.pixels, bundle.channels)
            if len(detected) == 1:
                found = next(iter(detected))
                if abs(found - bn_momentum) > 1e-9:
                    log.warning(
                        "Model norm layers use momentum %g "
                        "(impl.bn_momentum=%g); the grouped BN fold uses the "
                        "measured per-leaf decay.", found, bn_momentum)
    param_dtype = _DTYPES[impl.dtype]
    acc_dtype = _DTYPES[impl.accumulation_dtype]
    compute_dtype = (_DTYPES[impl.compute_dtype] if impl.compute_dtype
                     else (jnp.bfloat16 if impl.mixed_precision else param_dtype))
    # Loss/stat scalars: at least float32 (upcasts bf16/f16 compute), but
    # full float64 when training in double precision (trajectory-oracle
    # parity with the reference, which keeps stats in setup['dtype']).
    stat_dtype = jnp.promote_types(param_dtype, jnp.float32)

    criterion = get_loss_fn(hyp, bundle.batch_size)
    mean, std = jnp.asarray(bundle.mean), jnp.asarray(bundle.std)

    def prepare_inputs(images, key):
        if bundle.augmentations_active:
            images = bundle.augment(images, key)
        if bundle.normalize:
            return normalize_images(images, mean, std, compute_dtype)
        return images.astype(compute_dtype) / 255.0

    def forward(params, batch_stats, x, train, key=None):
        variables = {"params": jax.tree.map(lambda p: p.astype(compute_dtype), params)}
        # stochastic-layer rngs (StochDepth/Dropout) for train-mode passes
        rngs = None
        if train and key is not None:
            rngs = {"stochdepth": jax.random.fold_in(key, 101),
                    "dropout": jax.random.fold_in(key, 102)}
        if batch_stats:
            variables["batch_stats"] = batch_stats
            if train:
                logits, upd = model.apply(variables, x, train=True,
                                          mutable=["batch_stats"], rngs=rngs)
                return logits.astype(stat_dtype), upd["batch_stats"]
            return model.apply(variables, x, train=False).astype(stat_dtype), batch_stats
        logits = model.apply(variables, x, train=train,
                             mutable=["batch_stats"] if train else False, rngs=rngs)
        if train:
            logits = logits[0]
        return logits.astype(stat_dtype), batch_stats

    def chunk_loss(params, batch_stats, images, labels, key):
        x = prepare_inputs(images, key)
        logits, new_bn = forward(params, batch_stats, x, train=True, key=key)
        loss = criterion(logits, labels)
        correct = (logits.argmax(-1) == labels).astype(stat_dtype).sum()
        return loss, (new_bn, correct)

    grad_chunk = jax.value_and_grad(chunk_loss, has_aux=True)

    def regrad(params, batch_stats, images, labels, key):
        """Gradient-only re-evaluation for the regularizer (same BN input,
        no stat threading)."""
        return jax.grad(lambda p: chunk_loss(p, batch_stats, images, labels, key)[0])(params)

    reg_fn = make_grad_regularizer(hyp.grad_reg, regrad)

    weight_decay = float(getattr(hyp.optim, "weight_decay", 0.0) or 0.0)
    batch_clip = hyp.batch_clip
    clip_norm_type = hyp.grad_clip_norm

    use_acc = hyp.grad_reg.acc_strength != 0

    # -------------------------------------------------------------------
    # Local (per-device) full-gradient accumulation, run under shard_map.
    # -------------------------------------------------------------------
    def _make_pre_body(params, batch_stats, key, dev):
        """acc_strength pre-pass scan body: streaming mean of per-BLOCK
        gradients (training.py:128-142), local per device, never reduced.
        The carry holds the ABSOLUTE block index so the pass can be split
        into streamed segments that continue each other exactly."""

        def pre_body(carry, xs):
            pre, bidx = carry
            blk_imgs, blk_lbls = xs
            k = jax.random.fold_in(jax.random.fold_in(key, dev), 7_000_000 + bidx)
            flat_imgs = blk_imgs.reshape(-1, *blk_imgs.shape[2:])
            flat_lbls = blk_lbls.reshape(-1)
            (_, _), grads = grad_chunk(params, batch_stats, flat_imgs, flat_lbls, k)
            grads = jax.tree.map(lambda g: g.astype(acc_dtype), grads)
            if batch_clip is not None:
                grads, _, _ = tree_clip_by_norm(grads, batch_clip, clip_norm_type)
            counter = (bidx + 1).astype(acc_dtype)
            pre = jax.tree.map(lambda a, g: a + (g - a) / counter, pre, grads)
            return (pre, bidx + 1), None

        return pre_body

    def _make_bodies(params, key, lr, pre_grads, dev):
        """Scan bodies for the accumulation sweep. The carry's last element is
        the ABSOLUTE chunk index, so a sweep can be split into segments that
        continue each other's carry exactly (streamed accumulation)."""

        def chunk_body(carry, xs):
            avg, bn, sloss, spreds, cidx = carry
            chunk_imgs, chunk_lbls = xs
            k = jax.random.fold_in(jax.random.fold_in(key, dev), cidx)
            (loss, (bn, correct)), grads = grad_chunk(params, bn, chunk_imgs, chunk_lbls, k)
            sq_norm = tree_sqnorm(grads)
            if reg_fn is not None:
                grads = reg_fn(grads, params, bn, chunk_imgs, chunk_lbls, pre_grads, lr, k)
            grads = jax.tree.map(lambda g: g.astype(acc_dtype), grads)
            was_clipped = jnp.zeros((), jnp.float32)
            if batch_clip is not None:
                grads, clipped, _ = tree_clip_by_norm(grads, batch_clip, clip_norm_type)
                was_clipped = clipped.astype(jnp.float32)
            counter = (cidx + 1).astype(acc_dtype)
            avg = jax.tree.map(lambda a, g: a + (g - a) / counter, avg, grads)
            sloss = sloss + loss / chunks
            spreds = spreds + correct
            return (avg, bn, sloss, spreds, cidx + 1), (sq_norm, was_clipped)

        def group_body(carry, xs):
            """``group`` chunks per scan step, vmapped so their convolutions
            batch onto the MXU (VERDICT round 1, item 2). Per-chunk semantics
            (keys, grad-reg at per-chunk perturbed params, per-chunk clip,
            streaming-mean counter, sequential BN running-stat EMA) are
            preserved exactly; only the reduction order inside each conv
            changes, as with any batch-size change."""
            avg, bn_in, sloss, spreds, cidx0 = carry
            grp_imgs, grp_lbls = xs  # (group, sub, ...)
            cidx = cidx0 + jnp.arange(group, dtype=jnp.int32)
            keys = jax.vmap(lambda c: jax.random.fold_in(jax.random.fold_in(key, dev), c))(cidx)
            (losses, (bns, corrects)), grads = jax.vmap(
                grad_chunk, in_axes=(None, None, 0, 0, 0))(
                    params, bn_in, grp_imgs, grp_lbls, keys)
            sq_norms = jax.vmap(tree_sqnorm)(grads)
            if reg_fn is not None:
                grads = jax.vmap(reg_fn, in_axes=(0, None, 0, 0, 0, None, None, 0))(
                    grads, params, bns, grp_imgs, grp_lbls, pre_grads, lr, keys)
            grads = jax.tree.map(lambda g: g.astype(acc_dtype), grads)
            flags = jnp.zeros((group,), jnp.float32)
            if batch_clip is not None:
                grads, clipped, _ = jax.vmap(
                    lambda g: tree_clip_by_norm(g, batch_clip, clip_norm_type))(grads)
                flags = clipped.astype(jnp.float32)

            # Two-level mean (round 3): the sequential streaming mean over a
            # group equals avg + (sum_g - group*avg)/(cidx0+group) exactly —
            # ONE 11M-param tree update per group instead of `group` carried
            # updates, cutting the accumulator HBM traffic by `group`x (and
            # summing fresh gradients before rescaling is the numerically
            # kinder order in fp32).
            counter = (cidx0 + group).astype(acc_dtype)
            avg = jax.tree.map(
                lambda a, g: a + (g.sum(axis=0) - group * a) / counter,
                avg, grads)

            if jax.tree.leaves(bn_in):
                # Each vmapped update is b_j = A*r_in + c_j (A = the measured
                # per-leaf decay; plain BN: A = momentum, ghost norm:
                # momentum**chunks); the exact sequential composition is
                # r <- A*r + (b_j - A*r_in), scanned over the (small) stats
                # trees only.
                decay = (bn_decay if bn_decay is not None
                         else jax.tree.map(lambda r: bn_momentum, bn_in))

                def bn_fold(r, b):
                    return jax.tree.map(
                        lambda rr, bb, r0, a: a * rr + (bb - a * r0),
                        r, b, bn_in, decay), None

                bn_out, _ = jax.lax.scan(bn_fold, bn_in, bns)
            else:
                bn_out = bn_in
            sloss = sloss + jnp.sum(losses / chunks)
            spreds = spreds + corrects.sum()
            return (avg, bn_out, sloss, spreds, cidx0 + group), (sq_norms, flags)

        return chunk_body, group_body

    def _run_chunks(bodies, init, flat_imgs, flat_lbls):
        """Run the (possibly grouped) accumulation scan over flat chunks,
        continuing ``init``'s absolute chunk index. Returns (carry,
        grad_norms, clipped_flags) with per-chunk leading axes."""
        chunk_body, group_body = bodies
        seg_chunks = flat_imgs.shape[0]
        if group > 1 and seg_chunks >= group:
            n_groups, rem = divmod(seg_chunks, group)
            head = n_groups * group
            gi = flat_imgs[:head].reshape(n_groups, group, *flat_imgs.shape[1:])
            gl = flat_lbls[:head].reshape(n_groups, group, *flat_lbls.shape[1:])
            carry, (grad_norms, clipped_flags) = jax.lax.scan(group_body, init, (gi, gl))
            grad_norms = grad_norms.reshape(-1)
            clipped_flags = clipped_flags.reshape(-1)
            if rem:
                # Ragged tail: continue the same carry sequentially (the carry
                # holds the absolute chunk index, so counters are unchanged).
                carry, (tail_norms, tail_flags) = jax.lax.scan(
                    chunk_body, carry, (flat_imgs[head:], flat_lbls[head:]))
                grad_norms = jnp.concatenate([grad_norms, tail_norms])
                clipped_flags = jnp.concatenate([clipped_flags, tail_flags])
        else:
            carry, (grad_norms, clipped_flags) = jax.lax.scan(
                chunk_body, init, (flat_imgs, flat_lbls))
        return carry, grad_norms, clipped_flags

    def _finalize_stats(params, step_loss, step_preds, full_grad_norm,
                        clip_total, lr, pre_local):
        """full_loss terms + the pre-psum scalar stack, shared by the
        resident and streamed finalize programs (mirrors the reference's
        _record_stats, training.py:86-119) so the formulas cannot drift
        between the two paths. Returns (param_norm, scalars)."""
        param_norm = tree_sqnorm(params)
        full_loss = step_loss / num_blocks + 0.5 * weight_decay * param_norm
        if hyp.grad_reg.block_strength != 0:
            full_loss += lr / 4 * hyp.grad_reg.block_strength * full_grad_norm
        if use_acc:
            full_loss += (lr / 4 * hyp.grad_reg.acc_strength
                          * tree_sqnorm(pre_local))
        return param_norm, jnp.stack([step_loss, step_preds, full_loss,
                                      full_grad_norm, clip_total])

    def _metrics_from_package(package, param_norm):
        """Post-psum metric dict, shared by the same two programs."""
        step_loss, step_preds, full_loss, full_grad_norm, clipped = package
        return {
            "train_loss": step_loss / num_blocks / n_dev,
            "train_acc": step_preds / (num_blocks * chunks * sub * n_dev),
            "param_norm": param_norm,
            "grad_norm": jnp.sqrt(full_grad_norm) / n_dev,
            "full_loss": full_loss / n_dev,
            "clipped_batches": clipped,
        }

    def _local_accumulate(params, batch_stats, images, labels, key, lr):
        """images: (blocks, 1, chunks, sub, H, W, C) local shard."""
        images = images[:, 0]
        labels = labels[:, 0]
        dev = jax.lax.axis_index(DATA_AXIS)

        pre_grads = None
        if use_acc:
            # Pre-pass over whole blocks (training.py:128-142); local, never reduced.
            zeros = jax.tree.map(lambda p: jnp.zeros_like(p, acc_dtype), params)
            (pre_grads, _), _ = jax.lax.scan(
                _make_pre_body(params, batch_stats, key, dev),
                (zeros, jnp.zeros((), jnp.int32)), (images, labels))

        bodies = _make_bodies(params, key, lr, pre_grads, dev)
        flat_imgs = images.reshape(num_blocks * chunks, sub, *images.shape[3:])
        flat_lbls = labels.reshape(num_blocks * chunks, sub)
        zeros = jax.tree.map(lambda p: jnp.zeros_like(p, acc_dtype), params)
        init = (zeros, batch_stats, jnp.zeros((), stat_dtype), jnp.zeros((), stat_dtype),
                jnp.zeros((), jnp.int32))
        (avg, bn, step_loss, step_preds, _), grad_norms, clipped_flags = _run_chunks(
            bodies, init, flat_imgs, flat_lbls)

        # ---- stats (shared _finalize_stats, mirroring _record_stats) ----
        param_norm, scalars = _finalize_stats(
            params, step_loss, step_preds,
            grad_norms.mean(),  # mean of squared chunk norms
            clipped_flags.sum(), lr, pre_grads)

        # The single coalesced collective of the step (grads + BN stats +
        # scalar stats + per-chunk norms in ONE psum over a pytree;
        # training/utils.py:31-41). The norms ride the psum as zero-padded
        # per-device slots so the output is fully replicated — a sharded
        # stats array would not be fetchable under process_count > 1.
        norm_slots = jnp.zeros((n_dev, grad_norms.shape[0]),
                               grad_norms.dtype).at[dev].set(grad_norms)
        avg, bn_sum, package, norms_all = jax.lax.psum(
            (avg, bn, scalars, norm_slots), DATA_AXIS)
        avg = jax.tree.map(lambda a: a / n_dev, avg)
        bn = jax.tree.map(lambda b: b / n_dev, bn_sum) if bn else bn

        metrics = _metrics_from_package(package, param_norm)
        return avg, bn, metrics, norms_all  # (n_dev, chunks), replicated

    data_spec = P(None, DATA_AXIS)
    sharded_accumulate = jax.shard_map(
        _local_accumulate, mesh=mesh,
        in_specs=(P(), P(), data_spec, data_spec, P(), P()),
        out_specs=(P(), P(), P(), P()),
        check_vma=False)

    # -------------------------------------------------------------------
    # Streamed accumulation: epochs larger than HBM. The reference streams
    # ImageNet-scale data through DataLoader workers (data_preparation.py:68);
    # here the epoch stays in host RAM and block segments are device_put
    # ahead of the compute while the accumulation carry (per-device partial
    # mean, BN stats, counters) threads through one jitted program per
    # segment. The optimizer step still performs exactly ONE psum, in the
    # finalize program. Enabled when the laid-out epoch exceeds
    # impl.hbm_epoch_max_bytes. acc_strength grad-reg runs as a SECOND
    # streamed sweep (sharded_pre_segment) whose device-stacked block-mean
    # gradients feed the main sweep and the finalize penalty term.
    # -------------------------------------------------------------------
    carry_spec = P(DATA_AXIS)  # every carry leaf device-stacked on axis 0
    # acc_strength pre-gradients ride along as a device-stacked tree when
    # active, else as a dummy replicated scalar (the spec is fixed at
    # shard_map construction time).
    pre_spec = carry_spec if use_acc else P()

    def _local_segment(params, carry, pre, images, labels, key, lr, cidx0):
        images = images[:, 0]
        labels = labels[:, 0]
        dev = jax.lax.axis_index(DATA_AXIS)
        avg, bn, sloss, spreds, sq_sum, clip_sum = jax.tree.map(lambda x: x[0], carry)
        pre_local = jax.tree.map(lambda x: x[0], pre) if use_acc else None
        bodies = _make_bodies(params, key, lr, pre_local, dev)
        flat_imgs = images.reshape(-1, sub, *images.shape[3:])
        flat_lbls = labels.reshape(-1, sub)
        init = (avg, bn, sloss, spreds, cidx0)
        (avg, bn, sloss, spreds, _), grad_norms, clipped = _run_chunks(
            bodies, init, flat_imgs, flat_lbls)
        out = (avg, bn, sloss, spreds, sq_sum + grad_norms.sum(),
               clip_sum + clipped.sum())
        return jax.tree.map(lambda x: x[None], out), grad_norms[None]

    sharded_segment = jax.shard_map(
        _local_segment, mesh=mesh,
        in_specs=(P(), carry_spec, pre_spec, data_spec, data_spec, P(), P(), P()),
        out_specs=(carry_spec, P(DATA_AXIS)),
        check_vma=False)
    if impl.jit:
        sharded_segment = jax.jit(sharded_segment, donate_argnums=(1,))

    def _local_pre_segment(params, batch_stats, carry, images, labels, key):
        """One streamed segment of the acc_strength pre-pass: continue the
        per-device (pre, absolute block index) carry over this segment's
        blocks. Same body as the resident pre-pass (training.py:128-142)."""
        images = images[:, 0]
        labels = labels[:, 0]
        dev = jax.lax.axis_index(DATA_AXIS)
        pre, bidx = jax.tree.map(lambda x: x[0], carry)
        body = _make_pre_body(params, batch_stats, key, dev)
        (pre, bidx), _ = jax.lax.scan(body, (pre, bidx), (images, labels))
        return jax.tree.map(lambda x: x[None], (pre, bidx))

    sharded_pre_segment = jax.shard_map(
        _local_pre_segment, mesh=mesh,
        in_specs=(P(), P(), carry_spec, data_spec, data_spec, P()),
        out_specs=carry_spec, check_vma=False)
    if impl.jit:
        sharded_pre_segment = jax.jit(sharded_pre_segment, donate_argnums=(2,))

    def _local_stream_finalize(params, carry, pre, lr):
        avg, bn, step_loss, step_preds, sq_sum, clip_sum = jax.tree.map(
            lambda x: x[0], carry)
        pre_local = jax.tree.map(lambda x: x[0], pre) if use_acc else None
        param_norm, scalars = _finalize_stats(
            params, step_loss, step_preds, sq_sum / (num_blocks * chunks),
            clip_sum, lr, pre_local)
        avg, bn_sum, package = jax.lax.psum((avg, bn, scalars), DATA_AXIS)
        avg = jax.tree.map(lambda a: a / n_dev, avg)
        bn = jax.tree.map(lambda b: b / n_dev, bn_sum) if bn else bn
        metrics = _metrics_from_package(package, param_norm)
        return avg, bn, metrics

    sharded_stream_finalize = jax.shard_map(
        _local_stream_finalize, mesh=mesh,
        in_specs=(P(), carry_spec, pre_spec, P()), out_specs=(P(), P(), P()),
        check_vma=False)
    if impl.jit:
        sharded_stream_finalize = jax.jit(sharded_stream_finalize,
                                          donate_argnums=(1,))

    def _init_stream_carry(params, batch_stats):
        def stack(leaf, dtype=None):
            x = jnp.asarray(leaf)
            x = x.astype(dtype) if dtype else x
            return jnp.broadcast_to(x, (n_dev, *x.shape))
        avg = jax.tree.map(lambda p: jnp.zeros((n_dev, *p.shape), acc_dtype), params)
        bn = jax.tree.map(stack, batch_stats)
        z = jnp.zeros((n_dev,), stat_dtype)
        return (avg, bn, z, z, z, z)

    def _init_pre_carry(params):
        pre = jax.tree.map(lambda p: jnp.zeros((n_dev, *p.shape), acc_dtype), params)
        return (pre, jnp.zeros((n_dev,), jnp.int32))

    if impl.jit:
        from jax.sharding import NamedSharding
        _init_stream_carry = jax.jit(
            _init_stream_carry,
            out_shardings=NamedSharding(mesh, carry_spec))
        _init_pre_carry = jax.jit(
            _init_pre_carry,
            out_shardings=NamedSharding(mesh, carry_spec))

    seg_blocks = stream_seg_blocks

    def _stream_segments(host_images, host_labels):
        return stream_segments(mesh, host_images, host_labels, seg_blocks)

    def streamed_gradient(state: TrainState, host_images, host_labels):
        """One full-batch gradient via per-segment programs over host-resident
        layout arrays. Returns (grads, bn, metrics, per-chunk grad norms)."""
        lr = schedule(state.step)
        key = _seed_key(state.step)
        pre = np.zeros((), np.float32)  # dummy when acc_strength is off
        if use_acc:
            # Streamed acc_strength pre-pass: a second full sweep over the
            # data (reference training.py:128-142 at DataLoader scale).
            pre_carry = _init_pre_carry(state.params)
            for dimgs, dlbls, _ in _stream_segments(host_images, host_labels):
                pre_carry = sharded_pre_segment(state.params, state.batch_stats,
                                                pre_carry, dimgs, dlbls, key)
            pre = pre_carry[0]
        carry = _init_stream_carry(state.params, state.batch_stats)
        norm_parts = []
        for dimgs, dlbls, start in _stream_segments(host_images, host_labels):
            carry, gn = sharded_segment(state.params, carry, pre, dimgs, dlbls,
                                        key, lr, np.asarray(start * chunks, np.int32))
            norm_parts.append(gn)
        grads, bn, metrics = sharded_stream_finalize(state.params, carry, pre, lr)
        norms = (norm_parts[0] if len(norm_parts) == 1
                 else jnp.concatenate(norm_parts, axis=1))
        if jax.process_count() > 1:
            # segment outputs are device-sharded; replicate for host stats
            from jax.experimental import multihost_utils
            norms = multihost_utils.process_allgather(norms, tiled=True)
        return grads, bn, metrics, norms

    # -------------------------------------------------------------------
    # Gradient modifiers on the full averaged gradient (training.py:187-215)
    # -------------------------------------------------------------------
    def modify_gradient(grads, params, key, metrics):
        if hyp.norm_bias.strength > 0.0:
            pn = tree_sqnorm(params)
            if hyp.norm_bias.norm_type == 1:
                sign = jnp.sign(pn - hyp.norm_bias.bias ** 2)
                grads = jax.tree.map(lambda g: g + hyp.norm_bias.strength * sign, grads)
            else:
                factor = 2 * (pn - hyp.norm_bias.bias ** 2)
                grads = jax.tree.map(lambda g, p: g + hyp.norm_bias.strength * factor * p,
                                     grads, params)
        if hyp.grad_clip is not None:
            grads, clipped, pre_norm = tree_clip_by_norm(grads, hyp.grad_clip, clip_norm_type)
            metrics["preclip_gradnorm"] = pre_norm
            metrics["clipped_step"] = clipped.astype(jnp.float32)
        if hyp.grad_noise.additive is not None:
            keys = iter(jax.random.split(jax.random.fold_in(key, 1), len(jax.tree.leaves(grads))))
            grads = jax.tree.map(
                lambda g: g + hyp.grad_noise.additive * jax.random.normal(next(keys), g.shape, g.dtype),
                grads)
        if hyp.grad_noise.multiplicative is not None:
            keys = iter(jax.random.split(jax.random.fold_in(key, 2), len(jax.tree.leaves(grads))))
            grads = jax.tree.map(
                lambda g: g * (1 + hyp.grad_noise.multiplicative
                               * jax.random.normal(next(keys), g.shape, g.dtype)),
                grads)
        return grads, metrics

    # -------------------------------------------------------------------
    # Optimizer + EMA + step assembly
    # -------------------------------------------------------------------
    opt_init, opt_update, schedule, info = optim_interface(None, hyp)

    def ema_update(state, params, batch_stats):
        if not hyp.evaluate_ema:
            return state.ema_params, state.ema_batch_stats
        m = hyp.eval_ema_momentum
        ema_p = jax.tree.map(lambda e, p: m * e + (1 - m) * p, state.ema_params, params)
        ema_b = jax.tree.map(lambda e, b: m * e + (1 - m) * b,
                             state.ema_batch_stats, batch_stats)
        return ema_p, ema_b

    def _seed_key(step):
        return jax.random.fold_in(jax.random.key(cfg.seed if cfg.seed is not None else 0),
                                  step)

    def full_step(state: TrainState, images, labels):
        lr = schedule(state.step)
        key = _seed_key(state.step)
        avg_grads, bn, metrics, grad_norms = sharded_accumulate(
            state.params, state.batch_stats, images, labels, key, lr)
        grads, metrics = modify_gradient(avg_grads, state.params, key, metrics)
        params, opt_state = opt_update(grads, state.opt_state, state.params, lr)
        ema_p, ema_b = ema_update(state, params, bn)
        metrics["lr"] = lr
        metrics["grad_norms_per_chunk"] = jnp.sqrt(grad_norms)
        new_state = state.replace(step=state.step + 1, params=params, batch_stats=bn,
                                  opt_state=opt_state, ema_params=ema_p,
                                  ema_batch_stats=ema_b)
        return new_state, metrics

    def _finish_step(state: TrainState, grads, bn, metrics, norms):
        """Post-accumulation half of full_step for the streamed path."""
        lr = schedule(state.step)
        key = _seed_key(state.step)
        grads, metrics = modify_gradient(grads, state.params, key, metrics)
        params, opt_state = opt_update(grads, state.opt_state, state.params, lr)
        ema_p, ema_b = ema_update(state, params, bn)
        metrics["lr"] = lr
        metrics["grad_norms_per_chunk"] = jnp.sqrt(norms)
        new_state = state.replace(step=state.step + 1, params=params, batch_stats=bn,
                                  opt_state=opt_state, ema_params=ema_p,
                                  ema_batch_stats=ema_b)
        return new_state, metrics

    def _apply_modifiers(state: TrainState, grads, metrics):
        key = _seed_key(state.step)
        return modify_gradient(grads, state.params, key, metrics)

    # -------------------------------------------------------------------
    # Stochastic sanity-check mode (training.py:241-286): one jitted epoch.
    # -------------------------------------------------------------------
    sam_rho = (float(hyp.optim_modification.rho)
               if hyp.optim_modification.name == "SAM" else None)

    def _make_stochastic_body(key, lr, dev):
        """Scan body for one SGD update per block (training.py:241-286),
        shared by the resident one-program epoch and the streamed segments."""

        def block_grads(params, bn, flat_imgs, flat_lbls, k):
            """One pmean'd + clipped block gradient (the reference's stochastic
            closure body, training.py:257-276)."""
            (loss, (bn, correct)), grads = grad_chunk(params, bn, flat_imgs, flat_lbls, k)
            sq_norm = tree_sqnorm(grads)
            if reg_fn is not None:
                grads = reg_fn(grads, params, bn, flat_imgs, flat_lbls, None, lr, k)
            grads = jax.lax.pmean(grads, DATA_AXIS)
            if hyp.grad_clip is not None:
                grads, _, _ = tree_clip_by_norm(grads, hyp.grad_clip, 2.0)
            return grads, loss, correct, bn, sq_norm

        def block_body(carry, xs):
            params, bn, opt_state, sloss, spreds = carry
            blk_imgs, blk_lbls, bidx = xs
            k = jax.random.fold_in(jax.random.fold_in(key, dev), bidx)
            flat_imgs = blk_imgs.reshape(-1, *blk_imgs.shape[2:])
            flat_lbls = blk_lbls.reshape(-1)
            grads, loss, correct, bn, sq_norm = block_grads(params, bn, flat_imgs,
                                                            flat_lbls, k)
            if sam_rho is not None:
                # SAM's two closure calls per block (sam.py:85-92), fused here.
                norm = jnp.sqrt(tree_sqnorm(grads))
                perturbed = jax.tree.map(lambda p, g: p + sam_rho / (norm + 1e-12) * g,
                                         params, grads)
                grads, _, _, bn, _ = block_grads(perturbed, bn, flat_imgs, flat_lbls, k)
            params, opt_state = opt_update(grads, opt_state, params, lr)
            return (params, bn, opt_state, sloss + loss, spreds + correct), sq_norm

        return block_body

    def _local_stochastic(params, batch_stats, opt_state, images, labels, key, lr):
        images = images[:, 0]
        labels = labels[:, 0]
        dev = jax.lax.axis_index(DATA_AXIS)
        block_body = _make_stochastic_body(key, lr, dev)
        init = (params, batch_stats, opt_state, jnp.zeros((), stat_dtype),
                jnp.zeros((), stat_dtype))
        idx = jnp.arange(num_blocks)
        (params, bn, opt_state, step_loss, step_preds), grad_norms = jax.lax.scan(
            block_body, init, (images, labels, idx))

        # full_loss mirrors _record_stats for the stochastic mode too
        # (training.py:95-102): wd and block-strength penalty terms included.
        param_norm = tree_sqnorm(params)
        full_grad_norm = grad_norms.mean()
        full_loss = step_loss / num_blocks + 0.5 * weight_decay * param_norm
        if hyp.grad_reg.block_strength != 0:
            full_loss += lr / 4 * hyp.grad_reg.block_strength * full_grad_norm
        norm_slots = jnp.zeros((n_dev, grad_norms.shape[0]),
                               grad_norms.dtype).at[dev].set(grad_norms)
        package, norms_all = jax.lax.psum(
            (jnp.stack([step_loss, step_preds, full_loss, full_grad_norm]),
             norm_slots), DATA_AXIS)
        bn = jax.lax.pmean(bn, DATA_AXIS) if bn else bn
        metrics = {
            "train_loss": package[0] / num_blocks / n_dev,
            "train_acc": package[1] / (num_blocks * chunks * sub * n_dev),
            "param_norm": param_norm,
            "grad_norm": jnp.sqrt(package[3]) / n_dev,
            "full_loss": package[2] / n_dev,
            "clipped_batches": jnp.zeros(()),
        }
        return params, bn, opt_state, metrics, norms_all

    sharded_stochastic = jax.shard_map(
        _local_stochastic, mesh=mesh,
        in_specs=(P(), P(), P(), data_spec, data_spec, P(), P()),
        out_specs=(P(), P(), P(), P(), P()),
        check_vma=False)

    def _local_stoch_segment(params, batch_stats, opt_state, images, labels,
                             key, lr, bidx0):
        """One streamed segment of the stochastic epoch: scan SGD updates over
        this segment's blocks. params/opt_state stay replicated (each block
        gradient is pmean'd before the update); BN stats are pmean'd per
        segment, which composes to the same final EMA as one pmean at epoch
        end because the running-stat recursion is linear in the batch stats."""
        images = images[:, 0]
        labels = labels[:, 0]
        dev = jax.lax.axis_index(DATA_AXIS)
        block_body = _make_stochastic_body(key, lr, dev)
        init = (params, batch_stats, opt_state, jnp.zeros((), stat_dtype),
                jnp.zeros((), stat_dtype))
        idx = bidx0 + jnp.arange(images.shape[0])
        (params, bn, opt_state, sloss, spreds), grad_norms = jax.lax.scan(
            block_body, init, (images, labels, idx))
        norm_slots = jnp.zeros((n_dev, grad_norms.shape[0]),
                               grad_norms.dtype).at[dev].set(grad_norms)
        sums, norms_all = jax.lax.psum(
            (jnp.stack([sloss, spreds]), norm_slots), DATA_AXIS)
        bn = jax.lax.pmean(bn, DATA_AXIS) if bn else bn
        return params, bn, opt_state, sums, norms_all

    sharded_stoch_segment = jax.shard_map(
        _local_stoch_segment, mesh=mesh,
        in_specs=(P(), P(), P(), data_spec, data_spec, P(), P(), P()),
        out_specs=(P(), P(), P(), P(), P()),
        check_vma=False)
    if impl.jit:
        # the caller rebinds params/bn/opt_state every segment, so the input
        # buffers are dead: donate them (gated like the resident paths) -
        # this mode exists precisely for the tight-on-HBM regime
        sharded_stoch_segment = jax.jit(
            sharded_stoch_segment,
            donate_argnums=(0, 1, 2) if impl.donate_state else ())

    _sqnorm_jit = jax.jit(tree_sqnorm)

    def stochastic_step_streamed(state: TrainState, host_images, host_labels):
        """Stochastic SGD over an epoch larger than HBM: the reference trains
        through its DataLoader at any scale (training.py:241-286,
        data_preparation.py:68); here segments stream through per-segment
        programs with the (params, BN, opt_state) carry threading between
        them. One collective per block, as in the resident mode."""
        lr = schedule(state.step)
        key = _seed_key(state.step)
        params, bn, opt_state = state.params, state.batch_stats, state.opt_state
        sums_parts, norm_parts = [], []
        for dimgs, dlbls, start in _stream_segments(host_images, host_labels):
            params, bn, opt_state, sums, norms = sharded_stoch_segment(
                params, bn, opt_state, dimgs, dlbls, key, lr,
                np.asarray(start, np.int32))
            sums_parts.append(sums)
            norm_parts.append(norms)
        totals = np.sum(np.asarray(jax.device_get(sums_parts)), axis=0)
        norms_full = (norm_parts[0] if len(norm_parts) == 1
                      else jnp.concatenate(norm_parts, axis=1))
        norms_np = np.asarray(jax.device_get(norms_full))  # (n_dev, num_blocks)
        param_norm = float(jax.device_get(_sqnorm_jit(params)))
        full_grad_norm = norms_np.mean()
        full_loss = (totals[0] / num_blocks / n_dev
                     + 0.5 * weight_decay * param_norm)
        if hyp.grad_reg.block_strength != 0:
            full_loss += (float(lr) / 4 * hyp.grad_reg.block_strength
                          * full_grad_norm)
        metrics = {
            "train_loss": totals[0] / num_blocks / n_dev,
            "train_acc": totals[1] / (num_blocks * chunks * sub * n_dev),
            "param_norm": param_norm,
            "grad_norm": float(np.sqrt(norms_np.mean(axis=1).sum()) / n_dev),
            "full_loss": full_loss,
            "clipped_batches": 0.0,
            "lr": lr,
            "grad_norms_per_chunk": np.sqrt(norms_np),
        }
        ema_p, ema_b = ema_update(state, params, bn)
        new_state = state.replace(step=state.step + 1, params=params,
                                  batch_stats=bn, opt_state=opt_state,
                                  ema_params=ema_p, ema_batch_stats=ema_b)
        return new_state, metrics

    # Per-block gradient evaluation for stochastic closure optimizers: the
    # reference's stochastic closure body (pmean'd block gradient, grad-reg
    # with pre_grads=None, 2-norm clip only; training.py:257-276).
    def _local_block_grad(params, batch_stats, images, labels, key, lr, bidx):
        images = images[0, 0]  # (chunks, sub, ...) single-block slice
        labels = labels[0, 0]
        dev = jax.lax.axis_index(DATA_AXIS)
        k = jax.random.fold_in(jax.random.fold_in(key, dev), bidx)
        flat_imgs = images.reshape(-1, *images.shape[2:])
        flat_lbls = labels.reshape(-1)
        (loss, (bn, correct)), grads = grad_chunk(params, batch_stats, flat_imgs,
                                                  flat_lbls, k)
        if reg_fn is not None:
            grads = reg_fn(grads, params, bn, flat_imgs, flat_lbls, None, lr, k)
        grads = jax.lax.pmean(grads, DATA_AXIS)
        if hyp.grad_clip is not None:
            grads, _, _ = tree_clip_by_norm(grads, hyp.grad_clip, 2.0)
        package = jax.lax.psum(jnp.stack([loss, correct]), DATA_AXIS)
        bn = jax.lax.pmean(bn, DATA_AXIS) if bn else bn
        return grads, bn, package

    sharded_block_grad = jax.shard_map(
        _local_block_grad, mesh=mesh,
        in_specs=(P(), P(), data_spec, data_spec, P(), P(), P()),
        out_specs=(P(), P(), P()), check_vma=False)

    def block_gradient_eval(state: TrainState, images, labels, bidx):
        """(grads, bn, metrics) for ONE block slice of shape (1, dev, ...)."""
        lr = schedule(state.step)
        key = _seed_key(state.step)
        grads, bn, package = sharded_block_grad(
            state.params, state.batch_stats, images, labels, key, lr,
            jnp.asarray(bidx, jnp.int32))
        metrics = {"train_loss": package[0] / n_dev,
                   "train_acc": package[1] / (chunks * sub * n_dev)}
        return grads, bn, metrics

    def stochastic_step(state: TrainState, images, labels):
        lr = schedule(state.step)
        key = _seed_key(state.step)
        params, bn, opt_state, metrics, grad_norms = sharded_stochastic(
            state.params, state.batch_stats, state.opt_state, images, labels, key, lr)
        ema_p, ema_b = ema_update(state, params, bn)
        metrics["lr"] = lr
        metrics["grad_norms_per_chunk"] = jnp.sqrt(grad_norms)
        new_state = state.replace(step=state.step + 1, params=params, batch_stats=bn,
                                  opt_state=opt_state, ema_params=ema_p,
                                  ema_batch_stats=ema_b)
        return new_state, metrics

    # -------------------------------------------------------------------
    # Evaluation (training.py:343-388)
    # -------------------------------------------------------------------
    def _eval_samples(params, batch_stats, imgs, lbls, w):
        x = bundle.eval_transform(imgs)
        if bundle.normalize:
            x = normalize_images(x, mean, std, compute_dtype)
        else:
            x = x.astype(compute_dtype) / 255.0
        logits, _ = forward(params, batch_stats, x, train=False)
        if hyp.test_time_flips:
            logits_flip, _ = forward(params, batch_stats, x[:, :, ::-1, :], train=False)
            outputs = jax.nn.softmax(logits) + jax.nn.softmax(logits_flip)
        else:
            outputs = logits
        losses = -jax.nn.log_softmax(outputs)[jnp.arange(lbls.shape[0]), lbls]
        loss = (losses * w).sum()
        correct = (((outputs.argmax(-1) == lbls)).astype(jnp.float32) * w).sum()
        return jnp.stack([loss, correct, w.sum()]).astype(stat_dtype)

    def _eval_block(params, batch_stats, imgs, lbls, w):
        """One data.batch_size eval block, sub-chunked when its activations
        exceed the budget (``_resolve_eval_chunking``); per-sample metric
        sums make the split exact up to summation order."""
        if eval_chunks == 1:
            return _eval_samples(params, batch_stats, imgs, lbls, w)

        def sub_body(c, xs):
            return c + _eval_samples(params, batch_stats, *xs), None

        def split(a):
            return a.reshape(eval_chunks, a.shape[0] // eval_chunks,
                             *a.shape[1:])

        c, _ = jax.lax.scan(sub_body, jnp.zeros((3,), stat_dtype),
                            (split(imgs), split(lbls), split(w)))
        return c

    def _eval_scan(params, batch_stats, sums, images, labels, weights):
        """Continue (loss, correct, count) sums over these blocks. The carry
        init is the running sum, so any segmentation of the valid set yields
        bitwise-identical metrics."""
        def block_body(c, xs):
            return c + _eval_block(params, batch_stats, *xs), None

        c, _ = jax.lax.scan(block_body, sums, (images, labels, weights))
        return c

    def _local_eval(params, batch_stats, images, labels, weights):
        c = _eval_scan(params, batch_stats, jnp.zeros((3,), stat_dtype),
                       images[:, 0], labels[:, 0], weights[:, 0])
        return jax.lax.psum(c, DATA_AXIS)

    sharded_eval = jax.shard_map(
        _local_eval, mesh=mesh,
        in_specs=(P(), P(), data_spec, data_spec, data_spec), out_specs=P(),
        check_vma=False)

    def _local_eval_segment(params, batch_stats, carry, images, labels, weights):
        c = _eval_scan(params, batch_stats, carry[0],
                       images[:, 0], labels[:, 0], weights[:, 0])
        return c[None]

    sharded_eval_segment = jax.shard_map(
        _local_eval_segment, mesh=mesh,
        in_specs=(P(), P(), carry_spec, data_spec, data_spec, data_spec),
        out_specs=carry_spec, check_vma=False)

    def _local_eval_finalize(carry):
        return jax.lax.psum(carry[0], DATA_AXIS)

    sharded_eval_finalize = jax.shard_map(
        _local_eval_finalize, mesh=mesh, in_specs=(carry_spec,), out_specs=P(),
        check_vma=False)
    if impl.jit:
        sharded_eval = jax.jit(sharded_eval)
        sharded_eval_segment = jax.jit(sharded_eval_segment, donate_argnums=(2,))
        sharded_eval_finalize = jax.jit(sharded_eval_finalize)

    def eval_step(params, batch_stats, images, labels, weights):
        """Sharded evaluation (training.py:343-388). Accepts either the
        device-resident staging from stage_validation or — when the padded
        valid set exceeded impl.hbm_epoch_max_bytes — its host-resident
        layout, which streams through per-segment programs exactly like the
        training epoch (bitwise-equal metrics either way)."""
        if isinstance(images, np.ndarray):
            from ..parallel.mesh import data_sharding, stream_segments
            per_item = images.dtype.itemsize * int(np.prod(images.shape[3:]))
            _, seg_blocks, _ = stream_plan(images.shape[0], 1, images.shape[2],
                                           n_dev, per_item, impl)
            carry = put_global(
                np.zeros((n_dev, 3), np.dtype(stat_dtype)),
                data_sharding(mesh, 0, 2))
            for dimgs, dlbls, dw, _ in stream_segments(
                    mesh, images, labels, seg_blocks, host_weights=weights):
                carry = sharded_eval_segment(params, batch_stats, carry,
                                             dimgs, dlbls, dw)
            package = sharded_eval_finalize(carry)
        else:
            package = sharded_eval(params, batch_stats, images, labels, weights)
        return {"valid_loss": package[0] / package[2], "valid_acc": package[1] / package[2]}

    # -------------------------------------------------------------------
    # Gradient-only evaluation (closure optimizers, FP audit, analysis)
    # -------------------------------------------------------------------
    def gradient_eval(state: TrainState, images, labels, with_modifiers: bool = True):
        lr = schedule(state.step)
        key = _seed_key(state.step)
        avg_grads, bn, metrics, _ = sharded_accumulate(
            state.params, state.batch_stats, images, labels, key, lr)
        if with_modifiers:
            avg_grads, metrics = modify_gradient(avg_grads, state.params, key, metrics)
        return avg_grads, bn, metrics

    # -------------------------------------------------------------------
    def init_state(variables) -> TrainState:
        params = jax.tree.map(lambda p: p.astype(param_dtype), variables["params"])
        batch_stats = variables.get("batch_stats", {})
        ema_p = jax.tree.map(jnp.copy, params) if hyp.evaluate_ema else None
        ema_b = jax.tree.map(jnp.copy, batch_stats) if hyp.evaluate_ema else None
        state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                           batch_stats=batch_stats, opt_state=opt_init(params),
                           ema_params=ema_p, ema_batch_stats=ema_b)
        if jax.process_count() > 1:
            # Replicate the (identically seeded) state as global arrays so the
            # SPMD step accepts it — the reference broadcast params from rank 0
            # instead (models.py:63-72); deterministic init makes that a no-op.
            from ..parallel.mesh import replicated
            rep = replicated(mesh)
            state = jax.tree.map(lambda x: put_global(np.asarray(x), rep), state)
        return state

    def ema_step(state: TrainState):
        ema_p, ema_b = ema_update(state, state.params, state.batch_stats)
        return state.replace(ema_params=ema_p, ema_batch_stats=ema_b)

    donate = (0,) if impl.donate_state else ()
    jit = (lambda f, **kw: jax.jit(f, **kw)) if impl.jit else (lambda f, **kw: f)

    finish_step = jit(_finish_step, donate_argnums=donate)
    apply_modifiers = jit(_apply_modifiers)

    def full_step_streamed(state: TrainState, host_images, host_labels):
        grads, bn, metrics, norms = streamed_gradient(state, host_images,
                                                      host_labels)
        return finish_step(state, grads, bn, metrics, norms)

    def gradient_eval_streamed(state: TrainState, host_images, host_labels,
                               with_modifiers: bool = True):
        grads, bn, metrics, _ = streamed_gradient(state, host_images, host_labels)
        if with_modifiers:
            grads, metrics = apply_modifiers(state, grads, metrics)
        return grads, bn, metrics

    return TrainFunctions(
        full_step=(full_step_streamed if streamed
                   else jit(full_step, donate_argnums=donate)),
        stochastic_step=(stochastic_step_streamed if streamed
                         else jit(stochastic_step, donate_argnums=donate)),
        eval_step=eval_step,  # inner programs jitted; wrapper branches on staging
        gradient_eval=(gradient_eval_streamed if streamed
                       else jit(gradient_eval, static_argnames=("with_modifiers",))),
        init_state=init_state,
        schedule=schedule,
        layout=(num_blocks, chunks, sub),
        num_devices=n_dev,
        info=info,
        opt_update=opt_update,
        ema_step=jit(ema_step),
        block_gradient_eval=jit(block_gradient_eval, static_argnames=()),
        group=group,
        streamed=streamed,
        mesh=mesh,
    )


# ---------------------------------------------------------------------------
# Host-side epoch staging
# ---------------------------------------------------------------------------


def _epoch_order(cfg, step: int, n: int) -> np.ndarray:
    """Per-step sample order for hyp.shuffle=True (host PRNG, reproducible)."""
    seed = (cfg.seed if cfg.seed is not None else 0) * 1_000_003 + step
    rng = np.random.default_rng(seed)
    if cfg.hyp.get("sample_with_replacement", False) and jax.process_count() == 1:
        # mini-batches drawn WITH replacement; shuffle=True, non-distributed
        # only (reference _default_hyperparams.yaml:3, data_preparation.py)
        return rng.integers(0, n, n)
    return rng.permutation(n)


def _make_device_stager(images: np.ndarray, labels: np.ndarray,
                        fns: TrainFunctions, mesh: Mesh):
    """HBM-resident epoch + jitted permute/layout (VERDICT round 1, item 2).

    The flat epoch is uploaded ONCE; each step only ships an int32 order
    vector (~200 KB for CIFAR vs ~150 MB for the full epoch) and a small
    jitted gather+reshape places the permuted, laid-out epoch directly into
    the sharded layout the step program consumes. This is a data-placement
    program, not part of the optimizer step (which remains one XLA program
    with one psum); closure optimizers reuse its output across closure calls.
    """
    from ..parallel.mesh import data_sharding, replicated

    num_blocks, chunks, sub = fns.layout
    n_dev = fns.num_devices
    total = num_blocks * n_dev * chunks * sub
    img_shape = images.shape[1:]

    # Pad the row count to a multiple of n_dev so the flat arrays shard
    # evenly; padded rows have index >= len(images) and are never selected.
    n = len(images)
    padded = -(-n // n_dev) * n_dev
    if padded != n:
        images = np.concatenate(
            [images, np.zeros((padded - n, *img_shape), images.dtype)])
        labels = np.concatenate([labels, np.zeros(padded - n, labels.dtype)])
    flat_im = put_global(images, data_sharding(mesh, 0, images.ndim))
    flat_lb = put_global(labels, data_sharding(mesh, 0, labels.ndim))

    out_sh = (data_sharding(mesh, 1, 2 + len(img_shape) + 2),
              data_sharding(mesh, 1, 4))

    @functools.partial(jax.jit, out_shardings=out_sh)
    def permute_layout(fi, fl, order):
        idx = order[:total]
        im = jnp.take(fi, idx, axis=0).reshape(
            num_blocks, n_dev, chunks, sub, *img_shape)
        lb = jnp.take(fl, idx, axis=0).reshape(num_blocks, n_dev, chunks, sub)
        return im, lb

    order_sh = replicated(mesh)

    def stage(order: np.ndarray):
        dev_order = put_global(np.asarray(order, np.int32), order_sh)
        return permute_layout(flat_im, flat_lb, dev_order)

    return stage


def stage_epoch(bundle: DataBundle, fns: TrainFunctions, mesh: Mesh, cfg, step: int,
                cache: dict):
    """Return sharded (images, labels) for this optimizer step.

    Static order (shuffle=False, no rounds) is device-put once and reused.
    shuffle=True keeps the epoch HBM-resident and permutes on device per step
    — including under multi-process, where every process computes the same
    host-PRNG order (host-gather fallback only when impl.device_shuffle is
    off, in streamed mode, or above device_shuffle_max_bytes).
    Semi-stochastic picks bake round step % rounds (reference
    construct_subset_dataloader semantics); when the whole rounds store fits
    the device_shuffle_max_bytes budget it is HBM-resident too, and the
    per-step round pick + shuffle is one on-device gather."""
    hyp = cfg.hyp
    num_blocks, chunks, sub = fns.layout
    semi = hyp.train_semi_stochastic and bundle.baked is not None
    shuffled = bool(hyp.shuffle)

    if not semi and not shuffled and "static" in cache:
        return cache["static"]

    if semi:
        # HBM-resident rounds: upload the WHOLE baked store once and turn the
        # per-step round pick + shuffle into an on-device gather (only an
        # int32 order vector crosses the host link per step). The reference
        # re-reads the round from LMDB and re-collates every epoch
        # (data_preparation.py:89-112); on TPU that re-upload dominates the
        # step, so residency is the native design whenever the store fits
        # the device_shuffle_max_bytes budget.
        flat = bundle.baked.flat()
        if (not fns.streamed and bool(cfg.impl.get("device_shuffle", True))
                and flat.images.nbytes <= int(cfg.impl.get(
                    "device_shuffle_max_bytes", 8 << 30))):
            if "semi_stager" not in cache:
                cache["semi_stager"] = _make_device_stager(
                    flat.images, flat.labels, fns, mesh)
            n = int(bundle.baked.meta["size"])  # round size, no memmap read
            order = (_epoch_order(cfg, step, n) if shuffled
                     else np.arange(n, dtype=np.int64))
            return cache["semi_stager"](order + (int(step) % bundle.baked.rounds) * n)
        ds = bundle.baked.round(step)
        images, labels = ds.images, ds.labels
    else:
        images, labels = bundle.train.images, bundle.train.labels

    if shuffled:
        order = _epoch_order(cfg, step, len(images))
        # Multi-process is fine: every process computes the same host-PRNG
        # order and put_global/jit handle non-addressable devices.
        device_ok = (not semi and not fns.streamed
                     and bool(cfg.impl.get("device_shuffle", True))
                     and images.nbytes <= int(cfg.impl.get(
                         "device_shuffle_max_bytes", 8 << 30)))
        if device_ok:
            if "device_stager" not in cache:
                cache["device_stager"] = _make_device_stager(images, labels,
                                                             fns, mesh)
            return cache["device_stager"](order)
        from ..data.native import gather_rows_native

        gathered = gather_rows_native(images, order)
        images = gathered if gathered is not None else images[order]
        labels = labels[order]

    li, ll = layout_epoch(images, labels, num_blocks, chunks, sub, fns.num_devices)
    if fns.streamed:
        # Host-resident layout: the streamed step device_puts segments itself.
        staged = (li, ll)
    else:
        staged = shard_epoch_arrays(mesh, li, ll)
    if not semi and not shuffled:
        cache["static"] = staged
    return staged


def stage_validation(bundle: DataBundle, mesh: Mesh, n_dev: int, batch: int,
                     dryrun: bool = False, split=None, cfg_impl=None):
    """Pad validation data to a devices x blocks grid with per-sample weights.

    ``split`` selects an explicit dataset split (default: bundle.valid) so
    callers like analysis flatness can evaluate the train set without
    mutating the bundle. When ``cfg_impl`` is given and the padded layout
    exceeds ``impl.hbm_epoch_max_bytes``, the arrays stay HOST-resident and
    ``eval_step`` streams them in segments (reference evaluates through a
    DataLoader at any scale, training.py:343-388); otherwise they are
    device-put once and reused every validation.
    """
    split = bundle.valid if split is None else split
    images, labels = split.images, split.labels
    n = len(images)
    per_dev = -(-n // n_dev)
    blocks = -(-per_dev // batch)
    if dryrun:
        blocks = 1
    total = n_dev * blocks * batch
    pad = total - min(n, total)
    weights = np.ones(min(n, total), np.float32)
    if pad:
        images = np.concatenate([images[:total - pad], np.zeros((pad, *images.shape[1:]), images.dtype)])
        labels = np.concatenate([labels[:total - pad], np.zeros(pad, labels.dtype)])
        weights = np.concatenate([weights, np.zeros(pad, np.float32)])
    else:
        images, labels = images[:total], labels[:total]
        weights = weights[:total]
    li = images.reshape(blocks, n_dev, batch, *images.shape[1:])
    ll = labels.reshape(blocks, n_dev, batch)
    lw = weights.reshape(blocks, n_dev, batch)
    if cfg_impl is not None:
        per_item = li.dtype.itemsize * int(np.prod(li.shape[3:]))
        streamed, seg_blocks, val_bytes = stream_plan(
            blocks, 1, batch, n_dev, per_item, cfg_impl)
        if streamed:
            log.info("Validation staging (%.1f GB padded) exceeds "
                     "impl.hbm_epoch_max_bytes: host-resident, streamed in "
                     "%d-block segments per eval.", val_bytes / 2**30, seg_blocks)
            return li, ll, lw
    im, lb = shard_epoch_arrays(mesh, li, ll)
    from ..parallel.mesh import data_sharding
    w = put_global(lw, data_sharding(mesh, 1, lw.ndim))
    return im, lb, w


# ---------------------------------------------------------------------------
# Main loop (training.py:219-341)
# ---------------------------------------------------------------------------


def status_message(stats, step):
    def last(key):
        return stats[key][-1] if stats.get(key) else float("nan")

    return (f"Step: {step:<4}| lr: {last('lr'):.4f} | Time: {last('train_time'):4.2f}s |"
            f"TRAIN loss {last('train_loss'):7.4f} | TRAIN Acc: {last('train_acc'):7.2%} |"
            f"VAL loss {last('valid_loss'):7.4f} | VAL Acc: {last('valid_acc'):7.2%} |")


def train(model, bundle: DataBundle, mesh: Mesh, cfg, stats=None):
    """Train per implementation details (impl) and hyperparameters (hyp)."""
    fns = make_train_functions(model, bundle, mesh, cfg)
    from ..models.models import initialize_model

    key = jax.random.key(cfg.seed if cfg.seed is not None else 0)
    variables = initialize_model(model, key, bundle.pixels, bundle.channels)
    state = fns.init_state(variables)

    step_override, driver = None, None
    if fns.info["closure"] is not None:
        from .opt.closures import make_closure_step
        driver = make_closure_step(fns, cfg, fns.info["closure"])
        step_override = driver.step
    elif fns.info["modification"] == "SAM":
        from .opt.sam import make_sam_step
        step_override = make_sam_step(fns, cfg, fns.opt_update)

    stats = stats if stats is not None else defaultdict(list)
    start_step = 0
    if cfg.impl.checkpoint.name is not None:
        state, start_step = load_checkpoint(state, cfg, max_steps=cfg.hyp.steps,
                                            mesh=mesh)
        if start_step > 0:
            from .utils import load_driver_state
            load_driver_state(driver, cfg)
    state = state.replace(step=np.asarray(start_step, np.int32))

    cache: dict = {}
    val_data = stage_validation(bundle, mesh, fns.num_devices, bundle.batch_size,
                                dryrun=cfg.dryrun, cfg_impl=cfg.impl)
    step = start_step
    train_stochastic = cfg.hyp.train_stochastic
    # Profiling hook (SURVEY.md §5: jax.profiler replaces the reference's
    # absent tracing): capture the first impl.trace_steps steps.
    tracing = bool(cfg.impl.get("trace", False))
    if tracing:
        trace_dir = os.path.join(os.getcwd(), "jax_trace")
        jax.profiler.start_trace(trace_dir)
        log.info("Capturing jax.profiler trace to %s", trace_dir)
    while step < cfg.hyp.steps:
        if tracing and step - start_step >= int(cfg.impl.get("trace_steps", 3)):
            jax.profiler.stop_trace()
            tracing = False
        t0 = time.time()
        # "Switch from stochastic to non-stochastic or vice-versa after this
        # many steps" (_default_hyperparams.yaml:5): run the configured mode
        # until the switch step, the inverted mode afterwards. (The
        # reference's condition `switch >= step` is true from step 0 and its
        # variable latches, inverting the ENTIRE run - training.py:222-223;
        # we implement the documented intent instead.)
        stochastic_now = train_stochastic
        if (cfg.hyp.train_switch_stochastic is not None
                and step >= cfg.hyp.train_switch_stochastic):
            stochastic_now = not cfg.hyp.train_stochastic

        images, labels = stage_epoch(bundle, fns, mesh, cfg, step, cache)
        # Visualization snapshots and gradient-reading analysis consume the
        # gradient THAT PRODUCED the step (the reference reads the leftover
        # p.grad at theta_k, training/utils.py:74, analysis.py:28-41):
        # evaluate it at the PRE-step state now — the step functions donate
        # their input buffers, so theta_k is gone afterwards. Costs one extra
        # full pass per consuming step (the jitted step doesn't return the
        # gradient tree).
        viz_due = cfg.analysis.save_model_every_nth_step is not None and (
            step % cfg.analysis.save_model_every_nth_step == 0
            or step + 1 >= cfg.hyp.steps)
        analysis_grads_due = (
            cfg.analysis.type is not None
            and (cfg.analysis.get("measure_grad_norm", False)
                 or cfg.analysis.get("check_momentum", False))
            and ((step + 1) % cfg.analysis.check_every_nth_step == 0
                 or step + 1 >= cfg.hyp.steps or cfg.dryrun))
        viz_grads = None
        if viz_due or analysis_grads_due:
            viz_grads, _, _ = fns.gradient_eval(state, images, labels)
        if stochastic_now and fns.info["modification"] == "SAM":
            # SAM is fused into the jitted stochastic scan (two grads/block).
            state, metrics = fns.stochastic_step(state, images, labels)
        elif step_override is not None:
            if stochastic_now:
                # per-block closures (reference training.py:241-286)
                if "stochastic_closure" not in cache:
                    from .opt.closures import make_stochastic_closure_step
                    # reuse the run's driver: scratch (loss histories, L-BFGS
                    # pairs) spans blocks, mode switches, and the resume
                    # sidecar, like the reference's one optimizer object
                    cache["stochastic_closure"] = make_stochastic_closure_step(
                        cfg, fns, fns.info["closure"], driver=driver)
                state, metrics = cache["stochastic_closure"](state, images, labels)
            else:
                state, metrics = step_override(state, images, labels)
            if cfg.hyp.evaluate_ema:
                state = fns.ema_step(state)
        else:
            step_fn = fns.stochastic_step if stochastic_now else fns.full_step
            state, metrics = step_fn(state, images, labels)
        metrics = jax.device_get(metrics)
        step += 1

        for k, v in metrics.items():
            if k == "grad_norms_per_chunk":
                for idx, entry in enumerate(np.asarray(v).reshape(-1).tolist()):
                    stats[f"grad_norm_train_{idx}"] += [entry]
            else:
                stats[k] += [float(v)]
        stats["train_time"] += [time.time() - t0]

        eval_params = state.ema_params if cfg.hyp.evaluate_ema else state.params
        eval_bn = state.ema_batch_stats if cfg.hyp.evaluate_ema else state.batch_stats
        if ((step - 1) % cfg.impl.validate_every_nth_step == 0
                or step >= cfg.hyp.steps or cfg.dryrun):
            vm = jax.device_get(fns.eval_step(eval_params, eval_bn, *val_data))
            stats["valid_loss"] += [float(vm["valid_loss"])]
            stats["valid_acc"] += [float(vm["valid_acc"])]

        log.info(status_message(stats, step))

        if cfg.analysis.type is not None and (
                step % cfg.analysis.check_every_nth_step == 0
                or step >= cfg.hyp.steps or cfg.dryrun):
            from ..analysis import analyze
            analyze(model, bundle, mesh, cfg, fns, state, stats,
                    grads=viz_grads)

        if cfg.analysis.save_model_every_nth_step is not None and (
                (step - 1) % cfg.analysis.save_model_every_nth_step == 0
                or step >= cfg.hyp.steps):
            # Weights + grads + momentum/Nesterov update directions for
            # loss-landscape trajectory plots (reference training.py:308-312):
            # grads were captured at the pre-step state above; momentum is
            # read post-step (the reference reads both after optimizer.step).
            from .utils import save_state_for_visualization

            grads = viz_grads
            opt_state = state.opt_state
            momentum_buf = getattr(opt_state, "momentum", None)
            if momentum_buf is not None and cfg.hyp.optim.get("nesterov", False):
                mu = cfg.hyp.optim.momentum
                update_dirs = jax.tree.map(lambda g, m: g + mu * m, grads, momentum_buf)
            else:
                update_dirs = momentum_buf
            path = f"{cfg.name}_{cfg.model.name}_step_{step}.msgpack"
            save_state_for_visualization(state, grads, update_dirs, cfg, path)

        if not np.isfinite(stats["train_loss"][-1]):
            log.info("Terminating iterations due to divergence of loss...")
            break

        if cfg.hyp.stop_at_full_training_accuracy > 0:
            # No length guard, matching the reference (training.py:321-323):
            # min() over however many accs exist, so a run at 100% from its
            # very first step stops immediately.
            last_n = stats["train_acc"][-cfg.hyp.stop_at_full_training_accuracy:]
            if min(last_n) == 1:
                log.info("Terminating training after fitting all datapoints.")
                # final validation/analysis pass (reference training.py:324-328)
                vm = jax.device_get(fns.eval_step(eval_params, eval_bn, *val_data))
                stats["valid_loss"] += [float(vm["valid_loss"])]
                stats["valid_acc"] += [float(vm["valid_acc"])]
                if cfg.analysis.type is not None:
                    from ..analysis import analyze
                    analyze(model, bundle, mesh, cfg, fns, state, stats,
                            grads=viz_grads)
                break

        if cfg.impl.checkpoint.name is not None:
            if ((step - 1) % cfg.impl.checkpoint.save_every_nth_step == 0
                    or step >= cfg.hyp.steps):
                if jax.process_index() == 0:
                    save_checkpoint(state, cfg)
                from .utils import save_driver_state
                # all ranks: the driver gather is collective under
                # impl.shard_opt_vectors (writes happen on rank 0 only)
                save_driver_state(driver, cfg)

        if cfg.dryrun:
            break

    if tracing:  # loop ended before trace_steps (dryrun/early stop): flush
        jax.profiler.stop_trace()

    from .utils import wait_for_async_checkpoints
    wait_for_async_checkpoints()  # the final checkpoint is durable on return
    return state, stats
