"""Training utilities: checkpoint save/load, visualization snapshots.

Counterpart of /root/reference/fullbatch/training/utils.py. The reference's
5-element torch.save list [optim, model, scheduler, scaler, step]
(training/utils.py:43-51) becomes a single TrainState pytree serialized with
flax msgpack (the scheduler is a pure function of the step; there is no
scaler on TPU - bf16 needs no loss scaling). _update_ema and
_clip_gradient_list live inside the jitted step (training.py).
"""

from __future__ import annotations

import logging
import os
from pathlib import Path

import jax
import numpy as np
from flax import serialization

log = logging.getLogger(__name__)


def _checkpoint_file(cfg) -> Path:
    # Reference semantics: checkpoints live under the ORIGINAL working
    # directory, not the per-run output dir (training.py:332-334), so resumed
    # jobs with the same name find them.
    folder = Path(cfg.get("original_cwd", os.getcwd())) / "checkpoints"
    folder.mkdir(parents=True, exist_ok=True)
    return folder / str(cfg.impl.checkpoint.name)


def _atomic_write(file: Path, payload: bytes) -> None:
    # with_name, NOT with_suffix: with_suffix would REPLACE a dotted name
    # component, colliding 'model.a' and 'model.b' on the same model.tmp
    tmp = file.with_name(f"{file.name}.{os.getpid()}.tmp")
    tmp.write_bytes(payload)
    tmp.replace(file)  # atomic: readers never see partial checkpoints


_ASYNC_POOL = None
_PENDING: list = []


def _async_executor():
    global _ASYNC_POOL
    if _ASYNC_POOL is None:
        import atexit
        from concurrent.futures import ThreadPoolExecutor
        _ASYNC_POOL = ThreadPoolExecutor(max_workers=1,
                                         thread_name_prefix="ckpt-write")
        atexit.register(_drain_at_exit)  # callers outside train()
    return _ASYNC_POOL


def _drain_at_exit():
    """Best-effort flush for callers that exit without train()/an explicit
    wait. A failure here cannot change the process exit code (CPython
    ignores atexit exceptions), so log it loudly before re-raising;
    durability-critical callers must call wait_for_async_checkpoints()
    themselves (train() does)."""
    try:
        wait_for_async_checkpoints()
    except Exception:
        log.critical("Async checkpoint write FAILED at interpreter exit; "
                     "the newest checkpoint on disk is stale.", exc_info=True)
        raise


def wait_for_async_checkpoints() -> None:
    """Block until every queued async checkpoint write has hit disk
    (re-raises a failed write). Called at train() exit and before any
    same-process checkpoint read."""
    while _PENDING:
        _PENDING.pop(0).result()


def save_checkpoint(state, cfg, file: Path | None = None) -> Path:
    """Checkpoint the train state; ``impl.checkpoint.async_save=True`` moves
    the host pull + msgpack serialization + disk write off the training path
    (beyond the reference, which blocks on torch.save every interval,
    training.py:330-335 — at 60M-param scale that is seconds per save).

    Donation safety: full_step donates the state buffers, so the background
    thread must never read them after the next step dispatches. Single
    process: the snapshot is a cheap on-device copy (stream-ordered BEFORE
    any later donating step, so it reads the pre-donation values; the host
    pull then targets the copies). Multi-process: rank 0 cannot run eager
    device ops alone on replicated global arrays (SPMD), so it snapshots via
    the local-read host pull instead — still moving serialize+write off the
    path. One write is in flight at a time (bounded memory, ordered files).
    """
    file = file or _checkpoint_file(cfg)
    # Drain any queued write FIRST, on both paths: a pending older write must
    # not land after (and clobber) this newer one, the two writers must never
    # share the .tmp path, and taking the snapshot only after the drain keeps
    # at most one extra copy of the state alive at a time.
    wait_for_async_checkpoints()
    if not bool(cfg.impl.checkpoint.get("async_save", False)):
        payload = serialization.to_bytes(jax.device_get(state))
        _atomic_write(file, payload)
        return file
    if jax.process_count() == 1:
        import jax.numpy as jnp
        snapshot = jax.tree.map(
            lambda x: jnp.copy(x) if isinstance(x, jax.Array) else x, state)
    else:
        snapshot = jax.device_get(state)

    def _write():
        payload = serialization.to_bytes(jax.device_get(snapshot))
        _atomic_write(file, payload)

    _PENDING.append(_async_executor().submit(_write))
    return file


def load_checkpoint(state, cfg, max_steps: int, file: Path | None = None,
                    mesh=None, require: bool = False):
    """Restore into the given template state. Raises when the checkpoint is
    already at max steps (reference training/utils.py:65-66).

    Under process_count>1 (pass ``mesh``) the restored host arrays are
    re-placed as replicated global arrays so the SPMD step accepts them."""
    wait_for_async_checkpoints()  # never read a file a queued write may replace
    file = file or _checkpoint_file(cfg)
    if not file.exists():
        if require:
            raise FileNotFoundError(
                f"Checkpoint {file} not found - evaluating a random init "
                "would be meaningless. Check impl.checkpoint.name.")
        log.info("No existing checkpoint found. Starting to train from step 0.")
        return state, 0
    restored = serialization.from_bytes(state, file.read_bytes())
    if mesh is not None and jax.process_count() > 1:
        from ..parallel.mesh import put_global, replicated
        rep = replicated(mesh)
        restored = jax.tree.map(lambda x: put_global(np.asarray(x), rep), restored)
    step = int(np.asarray(restored.step))
    if step >= max_steps:
        raise ValueError("Maximum step size reached. Terminating computations.")
    log.info("Existing checkpoint loaded successfully. Continuing from step %d.", step)
    return restored, step


def _driver_file(cfg) -> Path:
    return _checkpoint_file(cfg).with_suffix(".opt.msgpack")


def save_driver_state(driver, cfg) -> None:
    """Persist a closure-optimizer driver's Python-side scratch (L-BFGS
    curvature memory, FISTA lr/t_k/x_prev, line-search loss windows) next to
    the checkpoint — the reference stores optimizer.state_dict() in its
    5-tuple (training/utils.py:43-51)."""
    if driver is None or not hasattr(driver, "get_state"):
        return
    # get_state may gather cross-host-sharded vectors (impl.shard_opt_vectors)
    # — a collective, so EVERY process must reach it; only rank 0 writes.
    payload = jax.tree.map(np.asarray, jax.device_get(driver.get_state()))
    if jax.process_index() != 0:
        return
    # The sidecar must never land on disk BEFORE the main checkpoint it
    # belongs to (a crash in between would pair step-k curvature memory with
    # step-(k-1) params on resume). Async: enqueue behind the main write on
    # the same single worker, preserving the sync flow's on-disk order.
    file = _driver_file(cfg)
    if bool(cfg.impl.checkpoint.get("async_save", False)):
        _PENDING.append(_async_executor().submit(
            lambda: _atomic_write(file, serialization.msgpack_serialize(payload))))
    else:
        wait_for_async_checkpoints()
        _atomic_write(file, serialization.msgpack_serialize(payload))


def load_driver_state(driver, cfg) -> None:
    wait_for_async_checkpoints()  # the sidecar may still be queued
    file = _driver_file(cfg)
    if driver is None or not hasattr(driver, "set_state") or not file.exists():
        return
    driver.set_state(serialization.msgpack_restore(file.read_bytes()))
    log.info("Closure-optimizer driver state restored from %s.", file.name)


def save_state_for_visualization(state, grads, update_directions, cfg, path: str):
    """Weights + gradients + update directions for loss-landscape plots
    (reference training/utils.py:72-85)."""
    arrays = jax.tree.map(np.asarray, jax.device_get({
        "params": state.params,
        "batch_stats": state.batch_stats,
        "grads": grads,
        "update_directions": update_directions,
    }))
    # model_cfg stays native python scalars/strings: np.asarray would turn
    # strings into numpy unicode arrays, which msgpack_serialize writes but
    # msgpack_restore cannot read back (np.dtype('strN') is not a dtype)
    arrays["model_cfg"] = {k: v for k, v in dict(cfg.model).items()}
    data = serialization.msgpack_serialize(arrays)
    Path(path).write_bytes(data)
