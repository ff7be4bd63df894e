"""Model-state analysis: norms, momentum alignment, gradient SNR/noise scale,
empirical flatness.

Counterpart of /root/reference/fullbatch/analysis/analysis.py:9-108. The
per-chunk gradient sweep is a jitted shard_map segment program (lax.scan over
chunks with a Welford carry) plus a finalize program that merges the
per-device accumulations exactly across the mesh (the reference sampled only
the local DDP shard, analysis.py:64). Epochs above impl.hbm_epoch_max_bytes
stay host-resident and stream through the segment program with the Welford
carry threading segment to segment — bitwise equal to the resident sweep and
working at any dataset scale like the reference's DataLoader walk
(analysis.py:44-97).

Reference defects fixed per SURVEY.md §7: the SNR and noise-scale log lines
read stats['grad_SNR']/stats['grad_noise_scale'] right after writing
'analysis_grad_SNR'/'analysis_grad_noise_scale' (analysis.py:85-86, :96-97) -
keys are consistent here.
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np
from jax.flatten_util import ravel_pytree
from jax.sharding import PartitionSpec as P

from ..data.augmentations import normalize as normalize_images
from ..data.pipeline import epoch_layout, layout_epoch, stream_plan
from ..models.modules import get_loss_fn
from ..parallel.mesh import DATA_AXIS, shard_epoch_arrays, stream_segments
from ..training.grad_reg import tree_sqnorm
from ..training.optimizers import SGDState
from .directions import perturb2threshold
from .welford import welford_finalize, welford_init, welford_merge, welford_update

log = logging.getLogger(__name__)


def _grad_stats_programs(model, bundle, mesh, cfg, num_blocks, chunks, sub,
                         n_dev, params):
    """Build (init, segment, finalize) programs for the per-chunk sweep.

    ``segment(params, batch_stats, carry, images, labels)`` continues the
    per-device Welford carry (every leaf device-stacked on axis 0) over one
    segment of the (blocks, devices, chunks, sub, ...) layout and returns the
    segment's per-chunk gradient norms, device-stacked; ``finalize(carry)``
    performs the exact cross-device Welford merge. The resident path is the
    single-segment call, so streamed and resident statistics are BITWISE
    equal — the reference runs this sweep at any scale through its DataLoader
    (analysis.py:44-97)."""
    criterion = get_loss_fn(cfg.hyp, cfg.data.batch_size)
    mean, std = jnp.asarray(bundle.mean), jnp.asarray(bundle.std)
    flat0 = ravel_pytree(params)[0]
    acc_dt = jnp.promote_types(flat0.dtype, jnp.float32)
    dim = flat0.shape[0]

    def chunk_grad_vector(params, batch_stats, images, labels):
        def loss_fn(p):
            # at least float32; float64 params keep full precision (oracle)
            cdt = jnp.promote_types(jax.tree.leaves(p)[0].dtype, jnp.float32)
            x = normalize_images(images, mean, std, cdt) if bundle.normalize \
                else images.astype(cdt) / 255.0
            variables = {"params": p}
            if batch_stats:
                variables["batch_stats"] = batch_stats
            logits = model.apply(variables, x, train=False)
            # reference analysis divides by num_blocks (analysis.py:57)
            return criterion(logits, labels) / num_blocks

        grads = jax.grad(loss_fn)(params)
        return ravel_pytree(grads)[0]

    def _init():
        wf = welford_init(dim, acc_dt)
        return jax.tree.map(lambda x: jnp.broadcast_to(x, (n_dev, *x.shape)), wf)

    from jax.sharding import NamedSharding
    init = jax.jit(_init, out_shardings=NamedSharding(mesh, P(DATA_AXIS)))

    def _local_segment(params, batch_stats, carry, images, labels):
        images = images[:, 0]
        labels = labels[:, 0]
        images = images.reshape(-1, sub, *images.shape[3:])
        labels = labels.reshape(-1, sub)

        def body(wf, xs):
            vec = chunk_grad_vector(params, batch_stats, xs[0], xs[1])
            return (welford_update(wf, vec.astype(acc_dt)),
                    jnp.linalg.norm(vec).astype(acc_dt))

        wf, norms = jax.lax.scan(body, jax.tree.map(lambda x: x[0], carry),
                                 (images, labels))
        return jax.tree.map(lambda x: x[None], wf), norms[None]

    segment = jax.shard_map(
        _local_segment, mesh=mesh,
        in_specs=(P(), P(), P(DATA_AXIS), P(None, DATA_AXIS), P(None, DATA_AXIS)),
        out_specs=(P(DATA_AXIS), P(DATA_AXIS)), check_vma=False)
    segment = jax.jit(segment, donate_argnums=(2,))

    def _local_finalize(carry):
        # exact cross-device merge
        wf = jax.tree.map(lambda x: x[0], carry)
        gathered = jax.lax.all_gather(wf, DATA_AXIS)
        merged = jax.tree.map(lambda x: x[0], gathered)
        for i in range(1, n_dev):
            merged = welford_merge(merged, jax.tree.map(lambda x, i=i: x[i], gathered))
        return merged

    finalize = jax.jit(jax.shard_map(
        _local_finalize, mesh=mesh, in_specs=(P(DATA_AXIS),), out_specs=P(),
        check_vma=False))
    return init, segment, finalize


def analyze(model, bundle, mesh, cfg, fns, state, stats, grads=None):
    """Collect statistics about the current model state (analysis.py:9).

    ``grads`` should be the gradient THAT PRODUCED the step (the reference
    reads the leftover ``p.grad`` at theta_t while params are already
    theta_{t+1}, analysis.py:28-41); the training loop passes it. The
    ``grads=None`` fallback — standalone callers only — re-evaluates at the
    CURRENT params, which is one step later than the reference's value."""
    a = cfg.analysis
    params = state.params

    if a.measure_param_norm:
        stats["analysis_param_norm"] += [float(jnp.sqrt(tree_sqnorm(params)))]

    needs_grads = a.measure_grad_norm or a.check_momentum
    if needs_grads and grads is None:
        cache = {}
        from ..training.training import stage_epoch

        images, labels = stage_epoch(bundle, fns, mesh, cfg, int(state.step), cache)
        grads, _, _ = fns.gradient_eval(state, images, labels)

    if a.measure_grad_norm:
        norm_type = cfg.hyp.grad_clip_norm
        leaves = jax.tree.leaves(grads)
        if norm_type == "inf" or norm_type == float("inf"):
            value = max(float(jnp.max(jnp.abs(g))) for g in leaves)
        else:
            p = float(norm_type)
            norms = jnp.asarray([jnp.linalg.norm(g.reshape(-1), ord=p) for g in leaves])
            value = float(jnp.linalg.norm(norms, ord=p))
        stats["analysis_grad_norm"] += [value]

    if a.check_momentum and cfg.hyp.optim.get("momentum", 0):
        opt_state = state.opt_state
        if isinstance(opt_state, SGDState) and opt_state.momentum is not None:
            g = ravel_pytree(grads)[0]
            m = ravel_pytree(opt_state.momentum)[0]
            stats["analysis_momentum_dist"] += [float(jnp.linalg.norm(g - m))]
            stats["analysis_momentum_sim"] += [
                float(jnp.vdot(g, m) / (jnp.linalg.norm(g) * jnp.linalg.norm(m) + 1e-12))]

    if a.compute_gradient_SNR or a.compute_gradient_noise_scale or a.record_gradient_norm_per_batch:
        n_dev = fns.num_devices
        a_chunks = max(int(a.internal_batch_size_chunks), 1)
        sub = max(bundle.batch_size // a_chunks, 1)
        num_blocks, chunks, sub = epoch_layout(
            len(bundle.train), bundle.batch_size, sub, n_dev, dryrun=cfg.dryrun)
        li, ll = layout_epoch(bundle.train.images, bundle.train.labels,
                              num_blocks, chunks, sub, n_dev)
        per_img_bytes = li.dtype.itemsize * int(np.prod(li.shape[4:]))
        streamed, seg_blocks, epoch_bytes = stream_plan(
            num_blocks, chunks, sub, n_dev, per_img_bytes, cfg.impl)
        init, segment, finalize = _grad_stats_programs(
            model, bundle, mesh, cfg, num_blocks, chunks, sub, n_dev, params)
        carry = init()
        if streamed:
            log.info("Analysis epoch (%.1f GB laid out) exceeds "
                     "impl.hbm_epoch_max_bytes: streaming the per-chunk sweep "
                     "in %d-block segments (reference analysis.py:44-97).",
                     epoch_bytes / 2**30, seg_blocks)
            norm_parts = []
            for dimgs, dlbls, _ in stream_segments(mesh, li, ll, seg_blocks):
                carry, gn = segment(params, state.batch_stats, carry, dimgs, dlbls)
                # keep gn on device: a host fetch here would serialize each
                # segment's compute against the next segment's staging
                norm_parts.append(gn)
            gn = (norm_parts[0] if len(norm_parts) == 1
                  else jnp.concatenate(norm_parts, axis=1))
        else:
            images, labels = shard_epoch_arrays(mesh, li, ll)
            carry, gn = segment(params, state.batch_stats, carry, images, labels)
        if jax.process_count() > 1:
            # segment outputs are device-sharded across hosts; replicate
            # before fetching (same as training.streamed_gradient)
            from jax.experimental import multihost_utils
            gn = multihost_utils.process_allgather(gn, tiled=True)
        # gn is (devices, blocks*chunks) with blocks-major, chunk-minor rows;
        # dataset batch order is (block, device, chunk) per layout_epoch —
        # restore it so analysis_grad_norm_{i} is the i-th dataset batch,
        # matching the reference's in-order DataLoader walk (analysis.py:44-97)
        norms = (np.asarray(jax.device_get(gn))
                 .reshape(n_dev, num_blocks, chunks)
                 .transpose(1, 0, 2).reshape(-1))
        wf = jax.device_get(finalize(carry))
        grad_mean, grad_var, grad_std, grad_norm, squared_norm = welford_finalize(wf)

        if a.record_gradient_norm_per_batch:
            for i, entry in enumerate(np.asarray(norms).tolist()):
                stats[f"analysis_grad_norm_{i}"] += [entry]

        if a.compute_gradient_SNR:
            stats["analysis_grad_mean_mean"] += [float(grad_mean.mean())]
            stats["analysis_grad_mean_norm"] += [float(jnp.linalg.norm(grad_mean))]
            stats["analysis_grad_std_mean"] += [float(grad_std.mean())]
            stats["analysis_grad_std_norm"] += [float(jnp.linalg.norm(grad_std))]
            snr = stats["analysis_grad_mean_norm"][-1] / (
                stats["analysis_grad_std_norm"][-1] + 1e-10)
            stats["analysis_grad_SNR"] += [snr]
            log.info("Gradient SNR is %g", snr)

        if a.compute_gradient_noise_scale:
            # McCandlish et al. simple noise scale (analysis.py:88-97).
            # b_local is the ACTUAL per-chunk sample count: epoch_layout may
            # shrink the requested chunk size to a divisor of batch_size.
            b_local = sub
            b_full = max(len(bundle.train), cfg.data.size)
            g_local = float(squared_norm)
            g_full = float(jnp.sum(grad_mean**2))
            candlish_s = 1 / (1 / b_local - 1 / b_full + 1e-10) * (g_local - g_full)
            candlish_g = 1 / (b_full - b_local + 1e-10) * (b_full * g_full - b_local * g_local)
            scale = candlish_s / (candlish_g if candlish_g != 0 else 1e-10)
            stats["analysis_grad_noise_scale"] += [scale]
            log.info("Gradient Noise Scale is %g", scale)

    if a.compute_flatness:
        value = _flatness(model, bundle, mesh, cfg, fns, state)
        stats["analysis_empirical_flatness"] += [value]
        log.info("Empirical flatness from random directions with threshold %g is %g",
                 a.flatness_threshold, value)

    return stats


def _flatness(model, bundle, mesh, cfg, fns, state):
    """Random-direction walk until the mean training loss crosses the
    threshold (rollouts.py:278-290)."""
    from ..training.training import stage_validation

    # Reuse the sharded eval program as the loss oracle over the train set,
    # passed explicitly (no bundle mutation).
    val = stage_validation(bundle, mesh, fns.num_devices, bundle.batch_size,
                           dryrun=cfg.dryrun, split=bundle.train,
                           cfg_impl=cfg.impl)

    def loss_at(params):
        metrics = fns.eval_step(params, state.batch_stats, *val)
        return metrics["valid_loss"]

    value, counter = perturb2threshold(
        state.params, loss_at, jax.random.key(int(state.step) + 777),
        step_size=cfg.analysis.flatness_step_size,
        threshold=cfg.analysis.flatness_threshold,
        norm=cfg.analysis.flatness_norm)
    return value
