"""Device mesh construction and sharding helpers.

TPU-native replacement for the reference's process-per-GPU NCCL setup
(/root/reference/fullbatch/utils.py:20-101): instead of
torch.multiprocessing.spawn + init_process_group, one process owns all local
devices and parallelism is expressed as a jax.sharding.Mesh. The single
'data' axis carries the reference's data parallelism (SURVEY.md §2 P1);
collectives ride ICI within a slice and DCN across slices automatically.

Multi-host: jax.distributed.initialize replaces the TCP-store/SLURM
rendezvous (utils.py:30-35, :88-95).
"""

from __future__ import annotations

import logging

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

log = logging.getLogger(__name__)

DATA_AXIS = "data"


def setup_distributed(cfg_setup) -> None:
    """Join the multi-host job if configured (impl/setup=distributed).

    Must run BEFORE anything touches a JAX backend: jax.process_count() /
    jax.devices() initialize XLA as a side effect, after which
    jax.distributed.initialize raises. The idempotence check therefore uses
    the distributed client state, not a backend query; with no explicit
    coordinator configured, initialize() auto-detects cluster environments
    (TPU pods, SLURM) — the reference's env:// / SLURM rendezvous
    (utils.py:30-35, :88-95)."""
    if not cfg_setup.dist:
        return
    from jax._src.distributed import global_state
    if global_state.client is not None:
        return  # already initialized by the launcher
    kwargs = {}
    if cfg_setup.get("url"):
        kwargs["coordinator_address"] = cfg_setup.url
    if cfg_setup.get("world_size"):
        kwargs["num_processes"] = int(cfg_setup.world_size)
    if cfg_setup.get("rank") is not None:
        kwargs["process_id"] = int(cfg_setup.rank)
    try:
        jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError) as err:
        if int(cfg_setup.get("world_size") or 1) > 1:
            # The user EXPLICITLY configured a multi-host job: continuing
            # single-process would make every host believe it is rank 0 —
            # N independent runs clobbering the same tables/checkpoints.
            # The reference's rendezvous crashes here too (utils.py:30-35).
            raise RuntimeError(
                f"jax.distributed.initialize failed for the configured "
                f"{cfg_setup.world_size}-process job ({err}); refusing to "
                "continue single-process.") from err
        # No cluster environment to auto-detect (single-process run with
        # impl/setup=distributed), or backends already initialized.
        log.warning("jax.distributed.initialize skipped: %s", err)


def make_mesh(cfg_setup=None, devices=None) -> Mesh:
    """1-D data-parallel mesh over all devices (extensible to more axes)."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    axes = tuple(cfg_setup.mesh_axes) if cfg_setup is not None else (DATA_AXIS,)
    if len(axes) != 1:
        raise NotImplementedError(
            "The reference workload is pure data-parallel; multi-axis meshes "
            "arrive with model sharding.")
    return Mesh(devices.reshape(-1), axes)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharding(mesh: Mesh, device_dim: int, ndim: int) -> NamedSharding:
    """Shard dimension ``device_dim`` of an ndim array over the data axis."""
    spec = [None] * ndim
    spec[device_dim] = DATA_AXIS
    return NamedSharding(mesh, P(*spec))


def put_global(array: np.ndarray, sharding: NamedSharding):
    """Place a host array that every process holds in full onto a (possibly
    multi-host) sharding.

    Single-process: plain device_put. Multi-process: device_put would require
    every device to be addressable, so each process instead materializes only
    its addressable shards via make_array_from_callback (the TPU-native
    replacement for the reference's per-rank DistributedSampler slicing,
    data_preparation.py:50-51)."""
    if jax.process_count() == 1:
        return jax.device_put(array, sharding)
    return jax.make_array_from_callback(array.shape, sharding,
                                        lambda idx: array[idx])


def shard_epoch_arrays(mesh: Mesh, images: np.ndarray, labels: np.ndarray):
    """Place (blocks, devices, chunks, sub, ...) arrays with dim 1 sharded."""
    im = put_global(images, data_sharding(mesh, 1, images.ndim))
    lb = put_global(labels, data_sharding(mesh, 1, labels.ndim))
    return im, lb


def stream_segments(mesh: Mesh, host_images: np.ndarray, host_labels: np.ndarray,
                    seg_blocks: int, host_weights: np.ndarray | None = None):
    """Yield (device_images, device_labels[, device_weights], start_block) per
    segment of a host-resident (blocks, devices, chunks, sub, ...) layout,
    with the next segment's device_put prefetched behind the current
    segment's compute. ``host_weights`` rides along for the padded-eval
    layout's per-sample weights.

    Shared by the streamed training step, the streamed gradient-SNR sweep,
    the streamed loss-landscape crunch, and streamed evaluation (the
    reference walks a DataLoader instead: data_preparation.py:68,
    analysis.py:44-97, crunch.py:113-136, training.py:343-388)."""
    num_blocks = host_images.shape[0]

    def stage(lo, hi):
        staged = shard_epoch_arrays(mesh, host_images[lo:hi], host_labels[lo:hi])
        if host_weights is None:
            return staged
        w = host_weights[lo:hi]
        return (*staged, put_global(w, data_sharding(mesh, 1, w.ndim)))

    staged_next = stage(0, seg_blocks)
    for start in range(0, num_blocks, seg_blocks):
        staged = staged_next
        nxt = start + seg_blocks
        if nxt < num_blocks:
            staged_next = stage(nxt, nxt + seg_blocks)
        yield (*staged, start)
