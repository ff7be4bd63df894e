"""Loss-landscape crunching: vmapped full-dataset evaluation over grid positions.

TPU-native re-architecture of /root/reference/fullbatch/visualization/crunch.py.
The reference evaluates one (x, y) grid position per full data pass, with an
LMDB claim-row scheme for work sharing. Here ``viz.vmap_positions`` positions
are evaluated PER PASS: the parameter offsets base + x*dx + y*dy are stacked
into a leading axis and the forward (and optional per-block gradient for the
full-loss penalty term) is vmapped over it inside the sharded scan - the
marquee vmap win of SURVEY.md §2 #34. Resume uses the JSONL results store.

Any-scale datasets: when the laid-out epoch exceeds impl.hbm_epoch_max_bytes
it stays host-resident and streams through per-segment programs whose
per-position sum carry threads segment to segment — the same stream_plan /
stream_segments machinery as the streamed training step, matching the
reference's _accumulate_full_loss walking the DataLoader per grid position
(crunch.py:113-136). The resident path is the single-segment special case of
the same programs, so streamed and resident surfaces are BITWISE equal (the
scan's carry init is the running sum, preserving addition order).

Mirrored semantics: filter-normalized random directions with the 'biasbn'
rule, full_loss = mean loss + 0.5*wd*||p||^2 + (lr/4 * block_strength) *
mean block grad-norm^2 when compute_full_loss and gradreg are active
(crunch.py:92-105), and the acc_strength rejection (crunch.py:105-106).
"""

from __future__ import annotations

import logging
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..analysis.directions import create_random_direction, set_parameter_offset
from ..data.augmentations import normalize as normalize_images
from ..data.pipeline import epoch_layout, layout_epoch, stream_plan
from ..models.modules import get_loss_fn
from ..parallel.mesh import (DATA_AXIS, data_sharding, put_global,
                             shard_epoch_arrays, stream_segments)
from ..training.grad_reg import tree_sqnorm
from ..training.optimizers import make_lr_schedule
from .database import SurfaceStore, surface_path

log = logging.getLogger(__name__)


def make_surface_programs(model, bundle, mesh, cfg, chunks, sub,
                          compute_grads: bool):
    """Build (segment, finalize) programs for the surface sweep.

    ``segment(stacked_params, batch_stats, carry, images, labels)`` continues
    the per-device (n_dev, 3, G) sum carry over one segment of the
    (blocks, devices, chunks, sub, ...) layout; ``finalize(carry)`` performs
    the single psum and returns the replicated (3, G) package. The resident
    path is the single-segment call; the scan's carry init is the incoming
    running sum, so any segmentation yields bitwise-identical sums."""
    criterion = get_loss_fn(cfg.hyp, cfg.data.batch_size)
    mean, std = jnp.asarray(bundle.mean), jnp.asarray(bundle.std)
    # Same compute-dtype rule as the training/eval forwards (training.py
    # make_train_functions; the reference crunch runs under
    # autocast(enabled=cfg.impl.mixed_precision), crunch.py:84): bf16
    # recipes evaluate the surface in bf16 on the MXU, fp32/fp64 states in
    # their own dtype. Loss scalars upcast to at-least-float32.
    from ..training.training import _DTYPES
    _forced = (_DTYPES[cfg.impl.compute_dtype] if cfg.impl.compute_dtype
               else (jnp.bfloat16 if cfg.impl.mixed_precision else None))

    def block_metrics(params, batch_stats, images, labels):
        def loss_fn(p):
            param_dtype = jax.tree.leaves(p)[0].dtype
            cdt = _forced or param_dtype
            stat_dtype = jnp.promote_types(param_dtype, jnp.float32)
            x = normalize_images(images, mean, std, cdt) if bundle.normalize \
                else images.astype(cdt) / 255.0
            variables = {"params": jax.tree.map(lambda w: w.astype(cdt), p)}
            if batch_stats:
                variables["batch_stats"] = batch_stats
            logits = model.apply(variables, x, train=False).astype(stat_dtype)
            loss = criterion(logits, labels)
            correct = (logits.argmax(-1) == labels).astype(jnp.float32).sum()
            return loss, correct

        if compute_grads:
            (loss, correct), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            return loss, correct, tree_sqnorm(grads)
        loss, correct = loss_fn(params)
        return loss, correct, jnp.zeros(())

    def _local_segment(stacked_params, batch_stats, carry, images, labels):
        images = images[:, 0]
        labels = labels[:, 0]
        seg_blocks = images.shape[0]
        flat_imgs = images.reshape(seg_blocks, chunks * sub, *images.shape[3:])
        flat_lbls = labels.reshape(seg_blocks, chunks * sub)
        sums = carry[0]  # local view: (3, G)

        def per_position(params, c0):
            def body(c, xs):
                loss_sum, correct_sum, gn_sum = c
                loss, correct, gn = block_metrics(params, batch_stats, xs[0], xs[1])
                return (loss_sum + loss, correct_sum + correct, gn_sum + gn), None

            (loss_sum, correct_sum, gn_sum), _ = jax.lax.scan(
                body, (c0[0], c0[1], c0[2]), (flat_imgs, flat_lbls))
            return loss_sum, correct_sum, gn_sum

        loss_sums, correct_sums, gn_sums = jax.vmap(
            per_position, in_axes=(0, 1))(stacked_params, sums)
        return jnp.stack([loss_sums, correct_sums, gn_sums])[None]

    segment = jax.shard_map(
        _local_segment, mesh=mesh,
        in_specs=(P(), P(), P(DATA_AXIS), P(None, DATA_AXIS), P(None, DATA_AXIS)),
        out_specs=P(DATA_AXIS), check_vma=False)
    if cfg.impl.jit:
        segment = jax.jit(segment, donate_argnums=(2,))

    def _local_finalize(carry):
        return jax.lax.psum(carry[0], DATA_AXIS)

    finalize = jax.jit(jax.shard_map(
        _local_finalize, mesh=mesh, in_specs=(P(DATA_AXIS),), out_specs=P(),
        check_vma=False))
    return segment, finalize


def crunch(model, bundle, mesh, cfg, fns, state):
    """Evaluate the loss surface around ``state.params`` (crunch.py:18)."""
    viz = cfg.viz
    params = state.params

    compute_grads = bool(viz.compute_full_loss) and cfg.hyp.grad_reg.block_strength != 0
    if viz.compute_full_loss and cfg.hyp.grad_reg.acc_strength != 0:
        raise ValueError("Loss landscape does not contain acc_strength!")

    store = SurfaceStore(surface_path(cfg.impl, viz, cfg.get("original_cwd", ".")))
    multi = jax.process_count() > 1

    def _draw_and_create():
        key = jax.random.key(cfg.seed if cfg.seed is not None else 0)
        kx, ky = jax.random.split(key)
        dx = create_random_direction(params, kx, norm=viz.norm, ignore=viz.ignore_layers)
        dy = create_random_direction(params, ky, norm=viz.norm, ignore=viz.ignore_layers)
        store.create(params, dx, dy)
        log.info("Created new surface database at %s.", store.path)

    if viz.rebuild_existing_database and (not multi or jax.process_index() == 0):
        store.remove()
    if multi:
        # Rank 0 creates the store and draws dx/dy; every other process reads
        # them from the store after the barrier — the file IS the direction
        # broadcast (reference broadcasts dx/dy from rank 0, crunch.py:55-65).
        # Without this, per-process SystemRandom seeds (job_startup) would
        # give each process a DIFFERENT surface feeding one shared psum.
        from jax.experimental import multihost_utils
        if jax.process_index() == 0 and not store.exists():
            _draw_and_create()
        multihost_utils.sync_global_devices("crunch-store:" + store.path.name)
    elif not store.exists():
        _draw_and_create()
    loaded = store.verify_model(params)
    if loaded is None:
        raise ValueError(f"The stored surface at {store.path} belongs to a "
                         "different model state.")
    _, dx, dy = loaded

    xcoords = np.linspace(viz.coordinates.x.min, viz.coordinates.x.max, viz.coordinates.x.num)
    ycoords = np.linspace(viz.coordinates.y.min, viz.coordinates.y.max, viz.coordinates.y.num)
    positions = [(float(x), float(y)) for x in xcoords for y in ycoords]

    claim_ttl = float(viz.get("claim_ttl", 3600.0))
    todo = store.pending(positions, ttl=claim_ttl)
    if multi:
        # The surface program is a collective: every process must run the
        # SAME positions in the same order. The shared-file read above is
        # racy against cooperating jobs appending rows between two ranks'
        # reads, so rank 0's todo view wins (the reference broadcasts the
        # current position each iteration, crunch.py:152-156).
        from jax.experimental import multihost_utils
        todo_set = set(map(tuple, todo))
        mask = multihost_utils.broadcast_one_to_all(
            np.array([tuple(p) in todo_set for p in positions], bool))
        todo = [p for p, m in zip(positions, mask) if m]
    log.info("Crunching %d of %d positions (%d cached/claimed).", len(todo),
             len(positions), len(positions) - len(todo))
    if not todo:
        _report_completion(store, positions)
        return store, positions

    n_dev = fns.num_devices
    num_blocks, chunks, sub = epoch_layout(len(bundle.train), bundle.batch_size,
                                           bundle.batch_size, n_dev, dryrun=cfg.dryrun)
    li, ll = layout_epoch(bundle.train.images, bundle.train.labels,
                          num_blocks, chunks, sub, n_dev)
    per_img_bytes = li.dtype.itemsize * int(np.prod(li.shape[4:]))
    streamed, seg_blocks, epoch_bytes = stream_plan(
        num_blocks, chunks, sub, n_dev, per_img_bytes, cfg.impl)
    if streamed:
        log.info("Surface epoch (%.1f GB laid out) exceeds "
                 "impl.hbm_epoch_max_bytes: streaming %d-block segments per "
                 "position group (reference walks the DataLoader per position,"
                 " crunch.py:113-136).", epoch_bytes / 2**30, seg_blocks)
    else:
        images, labels = shard_epoch_arrays(mesh, li, ll)
    segment, finalize = make_surface_programs(model, bundle, mesh, cfg,
                                              chunks, sub, compute_grads)

    weight_decay = float(cfg.hyp.optim.get("weight_decay", 0.0) or 0.0)
    lr = float(make_lr_schedule(cfg.hyp)(int(state.step)))

    group = max(int(viz.get("vmap_positions", 8)), 1)
    carry_sh = data_sharding(mesh, 0, 3)
    datapoints = num_blocks * chunks * sub * n_dev
    for start in range(0, len(todo), group):
        batch_positions = todo[start:start + group]
        # Re-check the store before claiming: a cooperating job launched
        # after our initial pending() read may have claimed or computed
        # these (the reference re-reads the DB per position, crunch.py:147;
        # with claims written BEFORE compute, the duplicate-work window is
        # one group). Rank 0's view wins under multi-host, as above.
        fresh = set(map(tuple, store.pending(batch_positions, ttl=claim_ttl)))
        if multi:
            from jax.experimental import multihost_utils
            mask = multihost_utils.broadcast_one_to_all(
                np.array([tuple(p) in fresh for p in batch_positions], bool))
            batch_positions = [p for p, m in zip(batch_positions, mask) if m]
        else:
            batch_positions = [p for p in batch_positions if tuple(p) in fresh]
        if not batch_positions:
            continue
        if jax.process_index() == 0:
            store.claim(batch_positions)  # cooperating jobs skip these
        pad = group - len(batch_positions)
        eval_positions = batch_positions + [batch_positions[-1]] * pad
        t0 = time.time()

        stacked = jax.tree.map(
            lambda *leaves: jnp.stack(leaves),
            *[set_parameter_offset(params, dx, x, dy, y) for x, y in eval_positions])
        carry = put_global(np.zeros((n_dev, 3, group), np.float32), carry_sh)
        if streamed:
            for dimgs, dlbls, _ in stream_segments(mesh, li, ll, seg_blocks):
                carry = segment(stacked, state.batch_stats, carry, dimgs, dlbls)
        else:
            carry = segment(stacked, state.batch_stats, carry, images, labels)
        package = jax.device_get(finalize(carry))

        for idx, position in enumerate(batch_positions):
            loss_sum, correct_sum, gn_sum = package[:, idx]
            train_loss = float(loss_sum) / num_blocks / n_dev
            train_acc = float(correct_sum) / datapoints
            # the offset params for this position already exist in `stacked`
            offset = jax.tree.map(lambda leaf: leaf[idx], stacked)
            full_loss = train_loss + 0.5 * weight_decay * float(tree_sqnorm(offset))
            if compute_grads:
                # mean over all blocks of squared block grad norms (crunch.py:96-99)
                full_grad_norm = float(gn_sum) / num_blocks / n_dev
                full_loss += lr / 4 * cfg.hyp.grad_reg.block_strength * full_grad_norm
            if jax.process_index() == 0:
                # rank-0 writes only (reference crunch.py:166-169): other
                # processes computing the same psum'd values must not append
                # duplicate rows or interleave writes on a shared store.
                store.record(position, train_loss=train_loss, train_acc=train_acc,
                             full_loss=full_loss)
            log.info(status_message(train_loss, train_acc, full_loss,
                                    (time.time() - t0) / len(batch_positions), position))
        if cfg.dryrun:
            break
    _report_completion(store, positions)
    return store, positions


def _report_completion(store, positions):
    results = store.results()
    computed = sum(1 for p in positions
                   if (row := results.get(store._key(p))) and not row.get("claim"))
    if computed < len(positions):
        log.warning("Surface has %d/%d computed positions; %d are claimed by "
                    "other jobs or missing (set viz.claim_ttl=0 to retake).",
                    computed, len(positions), len(positions) - computed)
    else:
        log.info("Surface complete: all %d positions computed.", len(positions))


def status_message(train_loss, train_acc, full_loss, time_stamp, position):
    msg = f"Pos: [{position[0]:4.2f}, {position[1]:4.2f}] | Time: {time_stamp:4.2f}s |"
    msg += f"TRAIN loss {train_loss:7.4f} | TRAIN Acc: {train_acc:7.2%} |"
    msg += f"Full loss {full_loss:7.4f} |"
    return msg
