"""Pre-baked fixed-augmentation dataset store (the N x CIFAR path).

TPU-native replacement for the reference's LMDB database of replayed
augmented epochs (/root/reference/fullbatch/data/lmdb_datasets.py): instead
of an LMDB file of per-sample byte rows written through the C lmdb library,
we bake ``rounds`` augmented epochs with the jitted augmentation pipeline and
store them as a single memory-mapped uint8 .npy tensor of shape
(rounds, size, H, W, C) plus a labels array and a json metadata sidecar.
Memory-mapping gives the same lazy, multi-process-safe reads the reference
got from LMDB, with zero-copy numpy slicing per round.

Semantics mirrored from the reference:
* ``rounds`` replayed augmented epochs (lmdb_datasets.py:238, :256-290),
* ``first_round_clean`` -> round 0 without augmentations, a strict dataset
  extension (lmdb_datasets.py:217-221),
* ``shuffle_while_writing`` -> per-round sample order shuffled at bake time,
* ``rebuild_existing_database`` / ``temporary_database``.
"""

from __future__ import annotations

import json
import logging
import os
import shutil
from pathlib import Path

import jax
import numpy as np

from .augmentations import augmented_hw, crop_spec, make_augment_fn
from .datasets import ArrayDataset

log = logging.getLogger(__name__)

_BAKE_BATCH = 1024


def _db_dir(cfg_db, cfg_data, size: int, aug_cfg, tmp_token=None) -> Path:
    """The store path encodes every CONFIG knob that changes the baked bytes
    (reference encodes the transform repr + first_round_clean in the LMDB
    path, lmdb_datasets.py:171-175), so config changes never silently reuse
    a stale store. Deliberately NOT keyed: the run seed and the bake engine
    (native mt19937 vs JAX threefry draw different streams) — an existing
    store is reused across seeds exactly as the reference's LMDB path is;
    re-bake explicitly with data.db.rebuild_existing_database=True.
    temporary_database bakes get a unique directory that the
    exit cleanup removes without touching persistent stores; under multi-host
    ``tmp_token`` carries rank 0's pid so every host computes the same path."""
    import hashlib

    base = Path(os.path.expanduser(str(cfg_db.path)))
    # aug entries as an ORDERED list: transform order changes the bytes
    # (reference composes in config-dict order, data_preparation.py:175-190);
    # "v" salts the key when the bake RNG stream changes across versions
    spec = {"aug": [[k, v] for k, v in dict(aug_cfg or {}).items()],
            "clean": bool(cfg_db.first_round_clean),
            "shuffle": bool(cfg_db.shuffle_while_writing),
            "v": 3}
    if any(k in _POLICY_KEYS for k in dict(aug_cfg or {})):
        # Policy geometry changes the baked bytes: fill color and
        # translate_const come from the DATA config (_bake_jax below), so a
        # pixels/mean change must not reuse a store baked at other values.
        spec["policy_geom"] = [cfg_data.get("pixels"), cfg_data.get("mean")]
    spec = json.dumps(spec, sort_keys=True, default=str)
    tag = hashlib.sha1(spec.encode()).hexdigest()[:8]
    name = f"{cfg_data.name}_{size}_rounds{cfg_db.rounds}_{tag}"
    if cfg_db.get("temporary_database", False):
        name += f"_tmp{tmp_token if tmp_token is not None else os.getpid()}"
    return base / name


def bake_dataset(train: ArrayDataset, cfg_data, cfg_db, seed: int = 0) -> Path:
    """Write the replicated-augmentation database; returns its directory.

    Multi-host: process 0 bakes the shared store and every process joins a
    global barrier before reading it (assumes the store path is a shared
    filesystem, as the reference's LMDB did). The reference instead simply
    FORBADE store creation under distributed (data_preparation.py:29-30,
    can_create = not dist) — a documented upgrade, since unguarded creation
    would let every process truncate images.npy mid-write."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        tmp_token = None
        if cfg_db.get("temporary_database", False):
            # The tmp suffix must be identical on every host (rank k reads the
            # store rank 0 baked), so broadcast rank 0's pid instead of using
            # each process's own.
            tmp_token = int(multihost_utils.broadcast_one_to_all(
                np.asarray(os.getpid(), np.int64)))
        aug_cfg = cfg_db.augmentations_train
        out_dir = _db_dir(cfg_db, cfg_data, len(train), aug_cfg, tmp_token)
        if jax.process_index() == 0:
            _bake_locked(train, cfg_data, cfg_db, seed, tmp_token)
        multihost_utils.sync_global_devices("bake:" + out_dir.name)
        if not (out_dir / "meta.json").exists():
            raise RuntimeError(f"Baked store {out_dir} missing after the "
                               "rank-0 bake; is data.db.path shared?")
        return out_dir
    return _bake_locked(train, cfg_data, cfg_db, seed)


def _bake_locked(train: ArrayDataset, cfg_data, cfg_db, seed: int,
                 tmp_token=None) -> Path:
    rounds = int(cfg_db.rounds)
    # The db group always defines augmentations_train (reference
    # lmdb_datasets.py:169 reads it unconditionally); an explicit null means
    # a clean replicated store, NOT a fallback to the data group's pipeline.
    aug_cfg = cfg_db.augmentations_train
    out_dir = _db_dir(cfg_db, cfg_data, len(train), aug_cfg, tmp_token)
    meta_file = out_dir / "meta.json"
    if meta_file.exists() and not cfg_db.rebuild_existing_database:
        return out_dir
    out_dir.mkdir(parents=True, exist_ok=True)

    import fcntl

    # Cross-JOB exclusion (the reference serialized writers through LMDB's
    # own file locking): two concurrent same-config jobs must not interleave
    # writes into one images.npy memmap. flock is advisory but both writers
    # are this function.
    with open(out_dir / ".bake.lock", "w") as lock:
        fcntl.flock(lock, fcntl.LOCK_EX)
        try:
            if meta_file.exists() and not cfg_db.rebuild_existing_database:
                return out_dir  # another job completed the bake while we waited
            meta_file.unlink(missing_ok=True)  # no stale marker mid-bake

            n, h, w, c = train.images.shape
            src_h, src_w = h, w
            h, w = augmented_hw(aug_cfg, h, w)  # size-changing bakes store the output shape
            if cfg_db.first_round_clean and (h > src_h or w > src_w):
                raise ValueError(
                    f"first_round_clean cannot be satisfied for a size-"
                    f"INCREASING bake ({src_h}x{src_w} -> {h}x{w}): the clean "
                    "round has no un-augmented pixels for the larger store "
                    "shape. Disable data.db.first_round_clean or drop the "
                    "upscaling transform.")
            images = np.lib.format.open_memmap(
                out_dir / "images.npy", mode="w+", dtype=np.uint8,
                shape=(rounds, n, h, w, c))
            labels = np.empty((rounds, n), np.int32)

            order = _bake_native(train, aug_cfg, cfg_db, rounds, seed, images)
            if order is not None:
                labels[:] = train.labels[order]
                log.info("Baked %d rounds with the native engine.", rounds)
            else:
                _bake_jax(train, aug_cfg, cfg_db, rounds, seed, images, labels,
                          cfg_data)

            images.flush()
            np.save(out_dir / "labels.npy", labels)
            meta = {
                "name": cfg_data.name, "rounds": rounds, "size": n,
                "shape": [h, w, c], "classes": int(train.classes),
                "first_round_clean": bool(cfg_db.first_round_clean),
                "shuffle_while_writing": bool(cfg_db.shuffle_while_writing),
            }
            meta_file.write_text(json.dumps(meta))
            return out_dir
        finally:
            fcntl.flock(lock, fcntl.LOCK_UN)


def _bake_native(train, aug_cfg, cfg_db, rounds, seed, images) -> np.ndarray | None:
    """Native C++ fast path for the crop+flip augmentation family; returns the
    (rounds, n) source-order array or None when not applicable."""
    aug = dict(aug_cfg or {})
    if not set(aug).issubset({"RandomCrop", "RandomHorizontalFlip"}):
        return None
    pad, flip_p = 0, 0.0
    if "RandomCrop" in aug:
        size, pad = crop_spec(aug["RandomCrop"])
        if (size != train.images.shape[1] or size != train.images.shape[2]):
            return None  # size-changing / non-square crops use the JAX path
    if "RandomHorizontalFlip" in aug:
        flip_p = float(aug["RandomHorizontalFlip"])

    from .native import bake_rounds_native

    return bake_rounds_native(
        np.ascontiguousarray(train.images), rounds, int(pad), flip_p,
        bool(cfg_db.first_round_clean), bool(cfg_db.shuffle_while_writing),
        seed, images)


_POLICY_KEYS = ("RandAugment", "AutoAugment", "AugMix")


def _policy_seed(seed: int, r: int, start: int, si: int) -> int:
    """Structured seed for one (round, batch-start, segment) policy call.

    SeedSequence mixing, not addition: ``seed + (r*n + start) + si`` collides
    across (round, batch, segment) triples whenever n % _BAKE_BATCH != 0
    (e.g. round r's last partial batch vs round r+1's first batch), replaying
    byte-identical augmentations where the store promises independent ones."""
    return int(np.random.SeedSequence(
        [seed & 0xFFFFFFFF, r, start, si]).generate_state(1)[0])


def train_mean(train) -> tuple:
    """Cheap per-channel mean in [0, 1] for policy fill colors."""
    sample = train.images[:: max(len(train.images) // 256, 1)]
    return tuple((sample.reshape(-1, sample.shape[-1]).mean(0) / 255.0).tolist())


def _bake_jax(train, aug_cfg, cfg_db, rounds, seed, images, labels, cfg_data):
    """Reference-general baking path: PIL policy augmentations (RandAugment /
    AutoAugment / AugMix, data_preparation.py:157-170) run host-side per
    batch, everything else through the jitted pipeline. Transforms compose
    in CONFIG-DICT ORDER exactly as the reference's _parse_cfg_dict does
    (data_preparation.py:175-190): consecutive non-policy keys collapse into
    one jitted segment, policy keys run host-side between them."""
    aug_cfg = dict(aug_cfg or {})
    segments, pending = [], {}

    def _flush():
        if pending:
            segments.append(("jax", jax.jit(make_augment_fn(dict(pending)))))
            pending.clear()

    for k, v in aug_cfg.items():
        if k in _POLICY_KEYS:
            _flush()
            segments.append(("policy", k, v))
        else:
            pending[k] = v
    _flush()
    has_policy = any(seg[0] == "policy" for seg in segments)
    n = len(train.images)
    rng = np.random.default_rng(seed)
    key = jax.random.key(seed)
    # policy fill color and translate_const come from the DATA config, as in
    # the reference (_get_autoaugment(img_size_min=cfg_data.pixels,
    # mean=cfg_data.mean), data_preparation.py:161) — NOT from the stored
    # image size, which can be the pre-resize cache shape for ImageNet.
    fill_mean = (tuple(cfg_data.mean) if cfg_data.get("mean") is not None
                 else train_mean(train)) if has_policy else None
    policy_size = int(cfg_data.get("pixels") or train.images.shape[1])
    for r in range(rounds):
        order = rng.permutation(n) if cfg_db.shuffle_while_writing else np.arange(n)
        clean = r == 0 and bool(cfg_db.first_round_clean)
        for start in range(0, n, _BAKE_BATCH):
            idx = order[start:start + _BAKE_BATCH]
            batch = train.images[idx]
            th, tw = images.shape[2], images.shape[3]
            if clean and batch.shape[1:3] != (th, tw):
                # first_round_clean with a size-changing bake: deterministic
                # center crop to the store shape (the reference's LMDB keeps
                # raw sizes per key; a fixed-shape array store cannot).
                top = (batch.shape[1] - th) // 2
                left = (batch.shape[2] - tw) // 2
                batch = batch[:, top:top + th, left:left + tw]
            if not clean:
                # stride by n, not a constant: (round, batch) seed pairs must
                # never collide for datasets over the stride (ImageNet)
                stream = r * n + start
                for si, seg in enumerate(segments):
                    if seg[0] == "policy":
                        from .policy_augment import apply_policy_batch

                        batch = apply_policy_batch(
                            batch, seg[1], seg[2], fill_mean,
                            seed=_policy_seed(seed, r, start, si),
                            img_size=policy_size)
                    else:
                        batch_key = jax.random.fold_in(
                            jax.random.fold_in(key, stream), si)
                        out = np.asarray(seg[1](batch, batch_key))
                        batch = (np.clip(out, 0, 255).astype(np.uint8)
                                 if out.dtype != np.uint8 else out)
            images[r, start:start + len(idx)] = batch
            labels[r, start:start + len(idx)] = train.labels[idx]
        log.info("Baked augmentation round %d/%d", r + 1, rounds)


class BakedDataset:
    """Memory-mapped view over the baked rounds."""

    def __init__(self, db_dir: Path):
        self.dir = Path(db_dir)
        self.meta = json.loads((self.dir / "meta.json").read_text())
        self.images = np.load(self.dir / "images.npy", mmap_mode="r")
        self.labels = np.load(self.dir / "labels.npy")
        self.rounds = self.meta["rounds"]
        self.classes = self.meta["classes"]

    def round(self, r: int) -> ArrayDataset:
        """Dataset view for bake round ``r % rounds`` — the reference's
        construct_subset_dataloader semantics (data_preparation.py:89-112)."""
        r = int(r) % self.rounds
        return ArrayDataset(np.asarray(self.images[r]), self.labels[r], self.classes)

    def flat(self) -> ArrayDataset:
        """All rounds concatenated: the N x dataset for full-batch training.

        Stays a lazy memmap view (reshape of the on-disk tensor) - pages are
        read only when sliced/uploaded, so N x ImageNet-scale stores don't
        materialize in host RAM."""
        n = self.meta["size"]
        imgs = self.images.reshape(self.rounds * n, *self.meta["shape"])
        return ArrayDataset(imgs, self.labels.reshape(-1), self.classes)

    def cleanup(self):
        shutil.rmtree(self.dir, ignore_errors=True)
