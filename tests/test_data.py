"""Data subsystem tests: synthetic fallback, augmentations, baked rounds, layout."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fullbatchtraining_tpu.config import load_config
from fullbatchtraining_tpu.data import (
    construct_databundle,
    epoch_layout,
    layout_epoch,
    make_augment_fn,
    normalize,
)
from fullbatchtraining_tpu.data.augmentations import (
    center_crop,
    random_crop,
    random_horizontal_flip,
    random_resized_crop,
)


def test_synthetic_fallback(config_dir, tmp_path):
    cfg = load_config(config_dir, overrides=[
        "data.size=128", f"data.path={tmp_path}/nothing_here"])
    bundle = construct_databundle(cfg.data)
    assert bundle.train.images.shape == (128, 32, 32, 3)
    assert bundle.train.images.dtype == np.uint8
    assert bundle.valid.labels.max() < 10
    # deterministic: same config -> same data
    bundle2 = construct_databundle(cfg.data)
    assert np.array_equal(bundle.train.images, bundle2.train.images)


def _make_cifar10_archive(tmp_path, n_per_batch=4):
    """A genuine cifar-10-python.tar.gz with the standard pickle batches."""
    import pickle
    import tarfile

    src = tmp_path / "src" / "cifar-10-batches-py"
    src.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for fname in [f"data_batch_{i}" for i in range(1, 6)] + ["test_batch"]:
        entry = {b"data": rng.integers(0, 256, (n_per_batch, 3 * 32 * 32),
                                       dtype=np.uint8).astype(np.uint8),
                 b"labels": list(rng.integers(0, 10, n_per_batch))}
        with open(src / fname, "wb") as handle:
            pickle.dump(entry, handle)
    archive = tmp_path / "cifar-10-python.tar.gz"
    with tarfile.open(archive, "w:gz") as tar:
        tar.add(src, arcname="cifar-10-batches-py")
    return archive


def test_download_dataset_file_url(config_dir, tmp_path, monkeypatch):
    """Guarded auto-download (reference data_preparation.py:115-147
    download=can_download): fetch + md5 verify + extract + load, exercised
    through a file:// URL since this environment has no egress."""
    monkeypatch.delenv("FBT_NO_DOWNLOAD", raising=False)
    import hashlib

    from fullbatchtraining_tpu.data import datasets as ds

    archive = _make_cifar10_archive(tmp_path)
    md5 = hashlib.md5(archive.read_bytes()).hexdigest()
    monkeypatch.setitem(ds._ARCHIVES, "CIFAR10", (f"file://{archive}", md5))

    root = tmp_path / "downloaded"
    cfg = load_config(config_dir, overrides=[
        "data.size=20", f"data.path={root}", "data.synthetic_fallback=False"])
    train, valid = ds.construct_datasets(cfg.data)
    assert len(train) == 20 and len(valid) == 4
    assert (root / "cifar-10-batches-py" / "data_batch_1").exists()
    # second construction: raw files present, no re-download attempted
    monkeypatch.setitem(ds._ARCHIVES, "CIFAR10", ("file:///gone.tar.gz", md5))
    train2, _ = ds.construct_datasets(cfg.data)
    assert np.array_equal(train.images, train2.images)


def test_download_tiny_imagenet_zip(config_dir, tmp_path, monkeypatch):
    """The zip branch (reference TinyImageNet downloader, datasets.py:39-81):
    archive -> extract -> the existing folder parser loads it."""
    monkeypatch.delenv("FBT_NO_DOWNLOAD", raising=False)
    import hashlib
    import zipfile

    PIL = pytest.importorskip("PIL.Image")

    from fullbatchtraining_tpu.data import datasets as ds

    src = tmp_path / "src" / "tiny-imagenet-200"
    wnids = ["n01443537", "n01629819"]
    (src / "val" / "images").mkdir(parents=True)
    (src / "wnids.txt").write_text("\n".join(wnids) + "\n")
    rng = np.random.default_rng(0)

    def write_jpeg(path):
        arr = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
        PIL.fromarray(arr.astype(np.uint8)).save(path, "JPEG")

    ann = []
    for i, wnid in enumerate(wnids):
        folder = src / "train" / wnid / "images"
        folder.mkdir(parents=True)
        for j in range(2):
            write_jpeg(folder / f"{wnid}_{j}.JPEG")
        write_jpeg(src / "val" / "images" / f"val_{i}.JPEG")
        ann.append(f"val_{i}.JPEG\t{wnid}\t0\t0\t10\t10")
    (src / "val" / "val_annotations.txt").write_text("\n".join(ann) + "\n")

    archive = tmp_path / "tiny-imagenet-200.zip"
    with zipfile.ZipFile(archive, "w") as zf:
        for f in sorted(src.rglob("*")):
            zf.write(f, f.relative_to(src.parent))
    md5 = hashlib.md5(archive.read_bytes()).hexdigest()
    monkeypatch.setitem(ds._ARCHIVES, "TinyImageNet", (f"file://{archive}", md5))

    root = tmp_path / "root"
    cfg = load_config(config_dir, overrides=[
        "data=TinyImageNet", "data.size=4", f"data.path={root}",
        "data.synthetic_fallback=False"])
    train, valid = ds.construct_datasets(cfg.data)
    assert train.images.shape == (4, 64, 64, 3)
    assert len(valid) == 2 and valid.labels.tolist() == [0, 1]


def test_download_md5_mismatch_raises(tmp_path, monkeypatch):
    """A corrupt archive must fail loudly, never silently fall through to
    synthetic data."""
    monkeypatch.delenv("FBT_NO_DOWNLOAD", raising=False)
    from fullbatchtraining_tpu.data import datasets as ds

    archive = _make_cifar10_archive(tmp_path)
    monkeypatch.setitem(ds._ARCHIVES, "CIFAR10",
                        (f"file://{archive}", "0" * 32))
    with pytest.raises(RuntimeError, match="MD5 mismatch"):
        ds.download_dataset("CIFAR10", tmp_path / "root")


def test_download_offline_falls_back(config_dir, tmp_path, monkeypatch):
    """Zero egress: the downloader degrades to the existing synthetic-fallback
    log line instead of crashing."""
    monkeypatch.delenv("FBT_NO_DOWNLOAD", raising=False)
    from fullbatchtraining_tpu.data import datasets as ds

    monkeypatch.setitem(ds._ARCHIVES, "CIFAR10",
                        ("file:///nonexistent/cifar.tar.gz", "0" * 32))
    cfg = load_config(config_dir, overrides=[
        "data.size=16", f"data.path={tmp_path}/empty"])
    train, _ = ds.construct_datasets(cfg.data)  # synthetic_fallback default True
    assert len(train) == 16

    # distributed gate: can_download=False never even attempts the URL
    def boom(*a, **k):
        raise AssertionError("download attempted under dist")

    monkeypatch.setattr(ds, "download_dataset", boom)
    train, _ = ds.construct_datasets(cfg.data, can_download=False)
    assert len(train) == 16


def test_synthetic_is_learnable(config_dir, tmp_path):
    """Per-class patterns are separable: nearest-pattern classification works."""
    cfg = load_config(config_dir, overrides=["data.size=256", f"data.path={tmp_path}/x"])
    b = construct_databundle(cfg.data)
    imgs = b.train.images.astype(np.float32)
    labels = b.train.labels
    protos = np.stack([imgs[labels == c].mean(0) for c in range(10)])
    pred = np.argmin(
        ((imgs[:, None] - protos[None]) ** 2).reshape(len(imgs), 10, -1).sum(-1), axis=1)
    assert (pred == labels).mean() > 0.9


def test_random_crop_shapes_and_range():
    imgs = np.random.randint(0, 255, (8, 32, 32, 3), np.uint8)
    out = jax.jit(lambda x, k: random_crop(x, k, 32, 4))(imgs, jax.random.key(0))
    assert out.shape == (8, 32, 32, 3)
    # different key -> different crop for at least one image
    out2 = random_crop(imgs, jax.random.key(1), 32, 4)
    assert not np.array_equal(np.asarray(out), np.asarray(out2))


def test_flip_is_exact_mirror():
    imgs = np.arange(2 * 4 * 4 * 1, dtype=np.uint8).reshape(2, 4, 4, 1)
    out = random_horizontal_flip(imgs, jax.random.key(3), p=1.0)
    assert np.array_equal(np.asarray(out), imgs[:, :, ::-1, :])


def test_center_crop():
    imgs = np.zeros((2, 64, 64, 3), np.uint8)
    assert center_crop(imgs, 56).shape == (2, 56, 56, 3)


def test_random_resized_crop_jits():
    imgs = np.random.randint(0, 255, (4, 32, 32, 3), np.uint8)
    out = jax.jit(lambda x, k: random_resized_crop(x, k, 24))(imgs, jax.random.key(0))
    assert out.shape == (4, 24, 24, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_normalize():
    imgs = np.full((2, 4, 4, 3), 255, np.uint8)
    out = normalize(imgs, [1.0, 1.0, 1.0], [0.5, 0.5, 0.5])
    assert np.allclose(np.asarray(out), 0.0)


def test_augment_fn_from_config(config_dir):
    cfg = load_config(config_dir)
    fn = make_augment_fn(cfg.data.augmentations_train)
    imgs = np.random.randint(0, 255, (4, 32, 32, 3), np.uint8)
    out = jax.jit(fn)(imgs, jax.random.key(0))
    assert out.shape == (4, 32, 32, 3)


def test_epoch_layout():
    blocks, chunks, sub = epoch_layout(total=50_000, batch_size=128, sub_batch=128,
                                       num_devices=1)
    assert (blocks, chunks, sub) == (390, 1, 128)
    blocks, chunks, sub = epoch_layout(total=50_000, batch_size=128, sub_batch=32,
                                       num_devices=4)
    assert (blocks, chunks, sub) == (97, 4, 32)


def test_epoch_layout_dryrun_one_block():
    blocks, _, _ = epoch_layout(256, 32, 32, 2, dryrun=True)
    assert blocks == 1


def test_layout_epoch_preserves_samples():
    imgs = np.arange(64, dtype=np.uint8).reshape(64, 1, 1, 1)
    labels = np.arange(64, dtype=np.int32)
    li, ll = layout_epoch(imgs, labels, num_blocks=2, chunks=2, sub=8, num_devices=2)
    assert li.shape == (2, 2, 2, 8, 1, 1, 1)
    assert set(ll.flatten().tolist()) == set(range(64))


def test_baked_rounds(config_dir, tmp_path):
    cfg = load_config(config_dir, overrides=[
        "data.size=64", f"data.path={tmp_path}/none", "data.db=baked",
        f"data.db.path={tmp_path}/db", "data.db.rounds=3",
        "data.db.first_round_clean=True", "data.db.shuffle_while_writing=False",
    ])
    bundle = construct_databundle(cfg.data)
    assert bundle.baked is not None
    assert bundle.train.images.shape[0] == 3 * 64  # N x dataset
    # first_round_clean: round 0 equals the raw data (unshuffled)
    raw = construct_databundle(load_config(config_dir, overrides=[
        "data.size=64", f"data.path={tmp_path}/none"]).data).train
    r0 = bundle.baked.round(0)
    assert np.array_equal(r0.images, raw.images)
    # round indexing wraps (reference: step % rounds)
    r3 = bundle.baked.round(3)
    assert np.array_equal(r3.images, r0.images)
    # later rounds are augmented -> differ
    r1 = bundle.baked.round(1)
    assert not np.array_equal(r1.images, r0.images)
    # rebuild_existing_database=False -> second call reuses the db
    bundle2 = construct_databundle(cfg.data)
    assert np.array_equal(bundle2.baked.round(1).images, r1.images)


def test_policy_augmentations_bake(config_dir, tmp_path):
    """RandAugment/AutoAugment/AugMix specs bake through the PIL policy path."""
    cfg = load_config(config_dir, overrides=[
        "data.size=32", f"data.path={tmp_path}/none", "data.db=baked",
        f"data.db.path={tmp_path}/dbp", "data.db.rounds=2",
        "+data.db.augmentations_train.RandAugment=rand-m7-n2-mstd0.5",
        "data.db.shuffle_while_writing=False"])
    bundle = construct_databundle(cfg.data)
    raw = construct_databundle(load_config(config_dir, overrides=[
        "data.size=32", f"data.path={tmp_path}/none"]).data).train
    assert bundle.train.images.shape[0] == 64
    assert not np.array_equal(bundle.baked.round(0).images, raw.images)


def test_policy_transforms_run():
    from fullbatchtraining_tpu.data.policy_augment import apply_policy_batch

    imgs = np.random.default_rng(0).integers(0, 255, (4, 32, 32, 3), np.uint8)
    for key, spec in [("RandAugment", "rand-m9-n2-mstd0.5-inc1"),
                      ("AutoAugment", "v0"), ("AugMix", "augmix-m3-w3")]:
        out = apply_policy_batch(imgs, key, spec, (0.5, 0.5, 0.5), seed=1)
        assert out.shape == imgs.shape and out.dtype == np.uint8
        # deterministic in the seed
        out2 = apply_policy_batch(imgs, key, spec, (0.5, 0.5, 0.5), seed=1)
        np.testing.assert_array_equal(out, out2)


def test_fused_mxu_crop_flip_semantics():
    from fullbatchtraining_tpu.data.augmentations import random_crop_flip_mxu

    imgs = np.random.default_rng(3).integers(0, 255, (8, 16, 16, 3), np.uint8)
    # pad=0, flip_p=0 -> exact identity
    out = np.asarray(random_crop_flip_mxu(imgs, jax.random.key(0), 16, 0, 0.0))
    np.testing.assert_array_equal(out.astype(np.uint8), imgs)
    # pad=0, flip_p=1 -> exact mirror
    out = np.asarray(random_crop_flip_mxu(imgs, jax.random.key(0), 16, 0, 1.0))
    np.testing.assert_array_equal(out.astype(np.uint8), imgs[:, :, ::-1, :])
    # pad=2: every output must be a contiguous window of the zero-padded input
    out = np.asarray(random_crop_flip_mxu(imgs, jax.random.key(1), 16, 2, 0.0)
                     ).astype(np.uint8)
    padded = np.pad(imgs, ((0, 0), (2, 2), (2, 2), (0, 0)))
    for i in range(8):
        found = any(np.array_equal(out[i], padded[i, y:y+16, x:x+16])
                    for y in range(5) for x in range(5))
        assert found, f"image {i} is not a crop window"
    # jit-compatible and used by the default config path
    fn = make_augment_fn({"RandomCrop": [16, 2], "RandomHorizontalFlip": 0.5})
    j = jax.jit(fn)(imgs, jax.random.key(2))
    assert j.shape == imgs.shape


def test_temporary_database_cleanup(config_dir, tmp_path):
    import subprocess, sys

    script = f"""
import sys; sys.path.insert(0, '/root/repo')
import jax; jax.config.update('jax_platforms', 'cpu')
from fullbatchtraining_tpu.config import load_config
from fullbatchtraining_tpu.data import construct_databundle
cfg = load_config('/root/repo/config', overrides=[
    'data.size=32', 'data.path={tmp_path}/none', 'data.db=baked',
    'data.db.path={tmp_path}/tempdb', 'data.db.rounds=1',
    'data.db.temporary_database=True'])
bundle = construct_databundle(cfg.data)
print('DB_DIR=' + str(bundle.baked.dir))
"""
    out = subprocess.run([sys.executable, "-c", script], capture_output=True,
                         text=True, timeout=240)
    assert out.returncode == 0, out.stderr
    db_dir = [l for l in out.stdout.splitlines() if l.startswith("DB_DIR=")][0][7:]
    import os
    assert not os.path.exists(db_dir)  # removed at interpreter exit


def test_bake_store_key_encodes_config(config_dir, tmp_path):
    """Changing bake-relevant config (augmentations, first_round_clean) must
    not silently reuse a stale store (reference encodes the transform repr
    in the LMDB path, lmdb_datasets.py:171-175)."""
    from fullbatchtraining_tpu.config import load_config
    from fullbatchtraining_tpu.data import construct_databundle

    def bundle(extra):
        cfg = load_config(config_dir, overrides=[
            "data.size=32", "data.path=/tmp/__none__", "data/db=baked",
            f"data.db.path={tmp_path}/db", "data.db.rounds=2", "hyp=fb1"] + extra)
        return construct_databundle(cfg.data, cfg.impl, cfg.hyp, seed=0)

    b1 = bundle([])
    b2 = bundle(["data.db.first_round_clean=True"])
    b3 = bundle(["data.db.augmentations_train=null"])
    assert b1.baked.dir != b2.baked.dir != b3.baked.dir
    # clean round 0 equals the raw data; the default store's round 0 is augmented
    assert np.array_equal(np.asarray(b2.baked.round(0).images),
                          np.asarray(b3.baked.round(0).images))


def test_bake_store_key_encodes_policy_geometry(config_dir, tmp_path):
    """Policy fill color / translate_const derive from data.mean / data.pixels
    (reference _get_autoaugment(img_size_min=cfg.pixels, mean=cfg.mean),
    data_preparation.py:161): changing them must re-bake; non-policy bakes
    ignore them (regression: the store hash omitted both, silently reusing a
    store baked at different geometry)."""
    def bundle(extra):
        cfg = load_config(config_dir, overrides=[
            "data.size=16", f"data.path={tmp_path}/none", "data.db=baked",
            f"data.db.path={tmp_path}/db", "data.db.rounds=2", "hyp=fb1"] + extra)
        return construct_databundle(cfg.data, cfg.impl, cfg.hyp, seed=0)

    pol = ["data.db.augmentations_train={RandAugment: rand-m7-n1}"]
    a = bundle(pol)
    b = bundle(pol + ["data.mean=[0.1,0.2,0.3]"])
    assert a.baked.dir != b.baked.dir
    c = bundle(["data.db.augmentations_train={RandomHorizontalFlip: 0.5}"])
    d = bundle(["data.db.augmentations_train={RandomHorizontalFlip: 0.5}",
                "data.mean=[0.1,0.2,0.3]"])
    assert c.baked.dir == d.baked.dir


def test_bake_policy_seeds_never_collide():
    """The host policy seed mixes (seed, round, batch-start, segment)
    structurally (regression: additive seed+stream+si collided across rounds
    whenever data.size % _BAKE_BATCH != 0)."""
    from fullbatchtraining_tpu.data.baked import _policy_seed

    grid = [(r, start, si) for r in range(8)
            for start in range(0, 4096, 512) for si in range(3)]
    seeds = {_policy_seed(7, r, start, si) for r, start, si in grid}
    assert len(seeds) == len(grid)
    assert _policy_seed(7, 1, 512, 0) == _policy_seed(7, 1, 512, 0)
    # the exact collision class the additive scheme had (n=1025, batch 1024):
    # round r's tail batch/segment 1 vs round r+1's first batch/segment 0
    assert _policy_seed(0, 0, 1024, 1) != _policy_seed(0, 1, 0, 0)


def test_bake_size_changing_crop(config_dir, tmp_path):
    """A bake whose RandomCrop shrinks the images stores the OUTPUT shape
    (regression: the buffer was allocated with the raw shape and baking
    crashed for any non-32px dataset)."""
    from fullbatchtraining_tpu.config import load_config
    from fullbatchtraining_tpu.data import construct_databundle

    cfg = load_config(config_dir, overrides=[
        "data=TinyImageNet", "data.size=16", "data.path=/tmp/__none__",
        "data/db=baked", f"data.db.path={tmp_path}/db", "data.db.rounds=2",
        "data.db.first_round_clean=True", "data.batch_size=8", "hyp=fb1"])
    bundle = construct_databundle(cfg.data, cfg.impl, cfg.hyp, seed=0)
    assert bundle.baked.round(0).images.shape[1:3] == (32, 32)  # 64 -> crop 32


def test_bake_transform_order_matters(config_dir, tmp_path):
    """Transforms compose in config-dict order, as the reference's
    _parse_cfg_dict does (data_preparation.py:175-190): crop-then-policy and
    policy-then-crop are different bakes with different store keys."""
    def bake(order_tag, overrides):
        cfg = load_config(config_dir, overrides=[
            "data.size=16", f"data.path={tmp_path}/none", "data.db=baked",
            f"data.db.path={tmp_path}/db_{order_tag}", "data.db.rounds=2",
            "data.db.first_round_clean=False",
            "data.db.shuffle_while_writing=False"] + overrides)
        return construct_databundle(cfg.data)

    # whole-dict overrides: +key additions merge into the yaml defaults and
    # keep their positions, so only a replacement can flip composition order
    crop_first = bake("a", [
        "data.db.augmentations_train="
        "{RandomCrop:[32,4], RandAugment: rand-m7-n1}"])
    policy_first = bake("b", [
        "data.db.augmentations_train="
        "{RandAugment: rand-m7-n1, RandomCrop:[32,4]}"])
    assert crop_first.baked.dir.name != policy_first.baked.dir.name
    assert not np.array_equal(crop_first.baked.round(0).images,
                              policy_first.baked.round(0).images)


def test_tiny_imagenet_half_extracted_treated_as_absent(tmp_path):
    """A tree left half-extracted by a crash (folder exists, manifest or
    annotations missing) must read as ABSENT (None) so the caller's
    download_dataset() re-extracts the md5-verified archive in place,
    instead of raising FileNotFoundError."""
    from fullbatchtraining_tpu.data.datasets import _load_tiny_imagenet

    folder = tmp_path / "tiny-imagenet-200"
    (folder / "train").mkdir(parents=True)
    assert _load_tiny_imagenet(tmp_path) is None  # no wnids.txt

    (folder / "wnids.txt").write_text("n01443537\n")
    assert _load_tiny_imagenet(tmp_path) is None  # no val_annotations.txt


def _write_tiny_tree(root, wnids=("n01443537", "n01629819"), per_class=2):
    """A minimal valid tiny-imagenet-200 tree with real 64x64 JPEGs."""
    PIL = pytest.importorskip("PIL.Image")
    src = root / "tiny-imagenet-200"
    (src / "val" / "images").mkdir(parents=True)
    (src / "wnids.txt").write_text("\n".join(wnids) + "\n")
    rng = np.random.default_rng(7)

    def write_jpeg(path):
        arr = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
        PIL.fromarray(arr).save(path, "JPEG")

    ann = []
    for i, wnid in enumerate(wnids):
        folder = src / "train" / wnid / "images"
        folder.mkdir(parents=True)
        for j in range(per_class):
            write_jpeg(folder / f"{wnid}_{j}.JPEG")
        write_jpeg(src / "val" / "images" / f"val_{i}.JPEG")
        ann.append(f"val_{i}.JPEG\t{wnid}\t0\t0\t10\t10")
    (src / "val" / "val_annotations.txt").write_text("\n".join(ann) + "\n")
    return src


def test_tiny_imagenet_memmap_cache(tmp_path):
    """The decode runs ONCE into a memmap cache beside the tree; later loads
    mmap the cache without touching the JPEGs (startup-latency fix for the
    one-core host)."""
    from fullbatchtraining_tpu.data.datasets import _load_tiny_imagenet

    src = _write_tiny_tree(tmp_path)
    (tx, ty), (vx, vy) = _load_tiny_imagenet(tmp_path)
    assert tx.shape == (4, 64, 64, 3) and vx.shape == (2, 64, 64, 3)
    assert (src / "_fbt_cache" / "train_labels.npy").exists()

    # delete every JPEG: the cache alone must serve the second load
    for f in src.rglob("*.JPEG"):
        f.unlink()
    (tx2, ty2), (vx2, vy2) = _load_tiny_imagenet(tmp_path)
    np.testing.assert_array_equal(np.asarray(tx), np.asarray(tx2))
    np.testing.assert_array_equal(ty, ty2)
    np.testing.assert_array_equal(np.asarray(vx), np.asarray(vx2))
    np.testing.assert_array_equal(vy, vy2)


def test_imagefolder_skips_non_image_entries(tmp_path):
    """torchvision ImageFolder semantics: stray READMEs/.DS_Store/subdirs in
    class folders are skipped, not decoded (a single stray file must not
    abort a multi-hour cache build)."""
    PIL = pytest.importorskip("PIL.Image")
    from fullbatchtraining_tpu.data.datasets import _load_imagefolder

    rng = np.random.default_rng(3)
    for split in ("train", "val"):
        for cls in ("cat", "dog"):
            folder = tmp_path / split / cls
            folder.mkdir(parents=True)
            for j in range(2):
                arr = rng.integers(0, 256, (48, 48, 3), dtype=np.uint8)
                PIL.fromarray(arr).save(folder / f"{cls}_{j}.jpg", "JPEG")
            (folder / "README.txt").write_text("not an image")
            (folder / ".DS_Store").write_bytes(b"\x00junk")
            (folder / "nested_dir").mkdir()

    (tx, ty), (vx, vy) = _load_imagefolder(tmp_path, 32, "strays")
    assert tx.shape[0] == 4 and vx.shape[0] == 4
    assert sorted(ty.tolist()) == [0, 0, 1, 1]


def test_synthetic_corrupt_cache_regenerates(config_dir, tmp_path, monkeypatch):
    """A cache file truncated by a mid-write kill regenerates instead of
    crashing every subsequent run at np.load."""
    from fullbatchtraining_tpu.data import datasets as ds

    first = ds._synthetic("CorruptTest", 16, 8, 3, 4)
    cache_dir = __import__("pathlib").Path("/tmp/fbt_synthetic")
    cache = next(cache_dir.glob("CorruptTest_*.npz"))
    cache.write_bytes(b"PK\x03\x04 truncated")
    again = ds._synthetic("CorruptTest", 16, 8, 3, 4)
    np.testing.assert_array_equal(first[0][0], again[0][0])
    cache.unlink(missing_ok=True)
