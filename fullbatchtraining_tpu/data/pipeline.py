"""Data pipeline: host arrays -> mesh-sharded device arrays.

TPU-native counterpart of the reference's construct_dataloader
(/root/reference/fullbatch/data/data_preparation.py:22-112). There are no
DataLoader workers or samplers: the full (possibly N x replicated) training
set lives as uint8 arrays, is laid out as (blocks, devices, chunks, sub_batch)
and sharded over the mesh's 'data' axis; augmentation/normalization run
inside the jitted step.

Layout semantics, matching the reference's per-GPU quantities:
* data.batch_size and hyp.sub_batch are PER-DEVICE sizes (the reference's
  per-rank loader batch and accumulation chunk, training.py:66, :150-158);
* an optimizer step consumes num_blocks x (devices * batch_size) samples with
  drop_last truncation (data_preparation.py:68);
* validation is replicated across devices in the reference
  (data_preparation.py:75-84) but sharded here - eval metrics are psum'd,
  which is strictly cheaper and numerically identical.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Callable

import numpy as np

from .augmentations import make_augment_fn, make_eval_transform
from .baked import BakedDataset, bake_dataset
from .datasets import ArrayDataset, construct_datasets

log = logging.getLogger(__name__)


@dataclasses.dataclass
class DataBundle:
    """Everything the training layer needs about the data."""

    train: ArrayDataset
    valid: ArrayDataset
    augment: Callable          # fn(images_u8, key) -> augmented images (device-side)
    eval_transform: Callable   # fn(images) -> images (deterministic)
    mean: np.ndarray
    std: np.ndarray
    normalize: bool
    classes: int
    channels: int
    pixels: int
    batch_size: int            # per-device block size
    name: str
    baked: BakedDataset | None = None
    augmentations_active: bool = True

    @property
    def size(self):
        return len(self.train)


def construct_databundle(cfg_data, cfg_impl=None, cfg_hyp=None, dryrun: bool = False,
                         seed: int = 0) -> DataBundle:
    """Datasets + augmentation fns + layout constants for one data config.

    ``cfg_impl``/``cfg_hyp`` are accepted for call-site symmetry with the
    reference's ``construct_dataloader(cfg_data, cfg_impl, ...)``; every
    impl/hyp-dependent data behavior (device staging, streaming, shuffle,
    semi-stochastic rounds) lives in the training layer, which reads those
    configs directly — except the download gate, which mirrors the
    reference's ``can_download=not cfg_impl.setup.dist``
    (data_preparation.py:24) so N ranks never race one extraction."""
    can_download = cfg_impl is None or not bool(cfg_impl.setup.dist)
    train, valid = construct_datasets(cfg_data, dryrun=dryrun,
                                      can_download=can_download)

    baked = None
    use_db = cfg_data.db.name is not None
    if use_db:
        db_dir = bake_dataset(train, cfg_data, cfg_data.db, seed=seed)
        baked = BakedDataset(db_dir)
        if cfg_data.db.get("temporary_database", False):
            # delete the baked store when the process exits
            # (reference lmdb_datasets.py temporary_database semantics)
            import atexit

            atexit.register(baked.cleanup)
        # Fixed-augmentation mode: the train set becomes the N x baked epochs
        # unless semi-stochastic sampling draws per-step rounds (training layer).
        train = baked.flat()

    augment = make_augment_fn(None if use_db else cfg_data.augmentations_train)
    eval_transform = make_eval_transform(cfg_data.augmentations_val)

    return DataBundle(
        train=train,
        valid=valid,
        augment=augment,
        eval_transform=eval_transform,
        mean=np.asarray(cfg_data.mean, np.float32),
        std=np.asarray(cfg_data.std, np.float32),
        normalize=bool(cfg_data.normalize),
        classes=cfg_data.classes,
        channels=cfg_data.channels,
        pixels=cfg_data.pixels,
        batch_size=int(cfg_data.batch_size),
        name=cfg_data.name,
        baked=baked,
        augmentations_active=bool(cfg_data.augmentations_train) and not use_db,
    )


def epoch_layout(total: int, batch_size: int, sub_batch: int, num_devices: int,
                 dryrun: bool = False):
    """(num_blocks, chunks_per_block, per-device sub_batch) with drop_last.

    The reference clamps the loader batch to the dataset size
    (data_preparation.py:68: batch_size=min(cfg, len(trainset))), so
    data.size-subset runs keep working; here the clamp is per-device so the
    subset still fills at least one block on a multi-device mesh."""
    if total >= num_devices:
        batch_size = min(batch_size, max(total // num_devices, 1))
    sub = min(sub_batch, batch_size)
    if batch_size % sub != 0:
        # mirror reference chunking: ceil division via shrink to divisor
        divisors = [d for d in range(sub, 0, -1) if batch_size % d == 0]
        sub = divisors[0]
    global_block = batch_size * num_devices
    num_blocks = total // global_block
    if num_blocks == 0:
        raise ValueError(
            f"Dataset of {total} samples cannot fill one block of {global_block} "
            f"({num_devices} devices x batch {batch_size}). Reduce data.batch_size.")
    if dryrun:
        num_blocks = 1
    return num_blocks, batch_size // sub, sub


def stream_plan(num_blocks: int, chunks: int, sub: int, num_devices: int,
                per_item_bytes: int, cfg_impl):
    """Decide resident-vs-streamed for a laid-out epoch and size the segments.

    Returns ``(streamed, seg_blocks, epoch_bytes)``. An epoch whose laid-out
    bytes exceed ``impl.hbm_epoch_max_bytes`` stays host-resident and is
    consumed in segments of ``seg_blocks`` blocks (``impl.stream_segment_blocks``
    overrides the auto choice of a quarter of the budget). This is the single
    policy shared by the training step, the gradient-SNR analysis, and the
    loss-landscape crunch — the TPU-native counterpart of the reference
    streaming any-size datasets through DataLoader workers
    (data_preparation.py:68)."""
    epoch_bytes = num_blocks * num_devices * chunks * sub * per_item_bytes
    hbm_budget = int(cfg_impl.get("hbm_epoch_max_bytes", 8 << 30))
    if epoch_bytes <= hbm_budget:
        return False, num_blocks, epoch_bytes
    block_bytes = num_devices * chunks * sub * per_item_bytes
    seg_auto = max(1, (hbm_budget // 4) // max(block_bytes, 1))
    seg_cfg = int(cfg_impl.get("stream_segment_blocks", 0) or 0)
    return True, min(num_blocks, seg_cfg or seg_auto), epoch_bytes


def layout_epoch(images: np.ndarray, labels: np.ndarray, num_blocks: int,
                 chunks: int, sub: int, num_devices: int):
    """Reshape host arrays to (blocks, devices, chunks, sub, ...) order-preserving.

    Samples are assigned round-robin-free: contiguous slices per device, matching
    DistributedSampler's contiguous-with-stride semantics closely enough for
    full-batch training (every sample is consumed exactly once per step).
    """
    total = num_blocks * num_devices * chunks * sub
    images = images[:total].reshape(num_blocks, num_devices, chunks, sub, *images.shape[1:])
    labels = labels[:total].reshape(num_blocks, num_devices, chunks, sub)
    return images, labels
