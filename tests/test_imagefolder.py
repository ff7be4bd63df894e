"""ImageFolder (ImageNet-style) loader tests on a synthetic JPEG tree.

Covers the decode/resize loop, the memmap cache hit, and the interrupted-
decode self-healing marker (fullbatchtraining_tpu/data/datasets.py:
_load_imagefolder; reference constructor:
/root/reference/fullbatch/data/data_preparation.py:129-147).
"""

import numpy as np
import pytest

from fullbatchtraining_tpu.data.datasets import _load_imagefolder, construct_datasets

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402

# class name -> solid RGB color; sorted order defines the label assignment
CLASSES = {"n01": (220, 40, 40), "n02": (40, 220, 40), "n03": (40, 40, 220)}
# varied aspect ratios exercise the shorter-side resize + center crop
SIZES = [(40, 30), (30, 48), (64, 64)]


def _make_tree(base, per_class=3, val_per_class=1):
    for split, count in (("train", per_class), ("val", val_per_class)):
        for cls, color in CLASSES.items():
            d = base / split / cls
            d.mkdir(parents=True)
            for i in range(count):
                w, h = SIZES[i % len(SIZES)]
                Image.new("RGB", (w, h), color).save(d / f"img_{i}.jpg",
                                                     quality=95)


def test_imagefolder_decode_resize_and_labels(tmp_path):
    _make_tree(tmp_path)
    train, val = _load_imagefolder(tmp_path, pixels=16, cache_tag="t")
    imgs, labels = train
    side = int(16 * 1.15)  # crop headroom
    assert imgs.shape == (9, side, side, 3) and imgs.dtype == np.uint8
    # labels follow sorted class-name order, files sorted within class
    np.testing.assert_array_equal(labels, np.repeat([0, 1, 2], 3))
    for label, color in enumerate(CLASSES.values()):
        block = np.asarray(imgs[labels == label], np.float32)
        np.testing.assert_allclose(block.mean(axis=(0, 1, 2)), color, atol=12)
    vimgs, vlabels = val
    assert vimgs.shape == (3, side, side, 3)
    np.testing.assert_array_equal(vlabels, [0, 1, 2])


def test_imagefolder_dryrun_decodes_a_bounded_subset(tmp_path):
    """dryrun must not eagerly decode + cache the whole tree (the reference
    subsets the lazy ImageFolder, data_preparation.py:32-37): it decodes at
    most `limit` files into a SEPARATE dryrun cache, and a complete full
    cache is preferred when present."""
    _make_tree(tmp_path, per_class=4, val_per_class=2)
    train, val = _load_imagefolder(tmp_path, pixels=16, cache_tag="d",
                                   dryrun=True)
    assert (tmp_path / "_fbt_cache_d_16_dryrun" / "train_labels.npy").exists()
    assert not (tmp_path / "_fbt_cache_d_16" / "train_labels.npy").exists()
    assert len(train[0]) == 12  # 12 < 256: the whole tiny tree decodes

    # full cache present -> dryrun prefers it over building a dryrun cache
    full_train, _ = _load_imagefolder(tmp_path, pixels=16, cache_tag="d")
    again, _ = _load_imagefolder(tmp_path, pixels=16, cache_tag="d",
                                 dryrun=True)
    assert len(again[0]) == len(full_train[0])


def test_bake_rejects_upscaling_clean_round(config_dir, tmp_path):
    """first_round_clean with a size-INCREASING bake has no un-augmented
    pixels for the store shape: the bake must fail loudly instead of
    writing a broken memmap (review regression)."""
    import pytest as _pytest

    from fullbatchtraining_tpu.config import load_config
    from fullbatchtraining_tpu.data import construct_databundle

    cfg = load_config(config_dir, overrides=[
        "data.size=16", f"data.path={tmp_path}/none", "data.db=baked",
        f"data.db.path={tmp_path}/db", "data.db.rounds=2",
        "data.db.first_round_clean=True",
        "data.db.augmentations_train={RandomCrop:[48,12]}", "hyp=fb1"])
    with _pytest.raises(ValueError, match="size-INCREASING"):
        construct_databundle(cfg.data, cfg.impl, cfg.hyp, seed=0)


def test_imagefolder_cache_hit_skips_decode(tmp_path):
    _make_tree(tmp_path)
    first = _load_imagefolder(tmp_path, pixels=16, cache_tag="t")
    # Remove the source JPEG trees entirely: a second load must come from the
    # memmap cache alone (the directory walk is skipped on a cache hit).
    import shutil
    shutil.rmtree(tmp_path / "train")
    (tmp_path / "train").mkdir()  # loader requires the dir to exist
    shutil.rmtree(tmp_path / "val")
    second = _load_imagefolder(tmp_path, pixels=16, cache_tag="t")
    for (a, la), (b, lb) in zip(first, second):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        np.testing.assert_array_equal(la, lb)


def test_imagefolder_interrupted_decode_self_heals(tmp_path):
    """The label file is written last and acts as the cache-complete marker:
    a cache with images but no labels (interrupted decode) is rebuilt."""
    _make_tree(tmp_path)
    first = _load_imagefolder(tmp_path, pixels=16, cache_tag="t")
    cache = tmp_path / "_fbt_cache_t_16"
    (cache / "train_labels.npy").unlink()
    # corrupt the orphaned image file to prove it is actually re-decoded
    imgs = np.load(cache / "train_images.npy", mmap_mode="r+")
    imgs[:] = 0
    imgs.flush()
    del imgs
    healed = _load_imagefolder(tmp_path, pixels=16, cache_tag="t")
    np.testing.assert_array_equal(np.asarray(healed[0][0]),
                                  np.asarray(first[0][0]))
    np.testing.assert_array_equal(healed[0][1], first[0][1])


def test_imagefolder_through_construct_datasets(tmp_path, config_dir):
    from fullbatchtraining_tpu.config import load_config

    _make_tree(tmp_path)
    cfg = load_config(config_dir, overrides=[
        "data=ImageNet", f"data.path={tmp_path}", "data.pixels=16",
        "data.classes=3", "data.size=6", "data.synthetic_fallback=False"])
    train, valid = construct_datasets(cfg.data)
    assert len(train) == 6  # size subset applied
    assert train.classes == 3
    assert valid.images.shape[1:] == (18, 18, 3)
