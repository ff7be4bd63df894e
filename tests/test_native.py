"""Native C++ data engine: build, correctness vs numpy, bake properties."""

import numpy as np
import pytest

from fullbatchtraining_tpu.data.native import (
    bake_rounds_native,
    gather_rows_native,
    get_lib,
)

pytestmark = pytest.mark.skipif(get_lib() is None,
                                reason="no C++ toolchain for the native engine")


def test_gather_rows_matches_numpy():
    rng = np.random.default_rng(0)
    images = rng.integers(0, 255, (50, 8, 8, 3), np.uint8)
    idx = rng.permutation(50)[:20]
    out = gather_rows_native(images, idx)
    np.testing.assert_array_equal(out, images[idx])


def test_bake_rounds_properties():
    rng = np.random.default_rng(1)
    images = rng.integers(1, 255, (16, 8, 8, 3), np.uint8)  # nonzero pixels
    out = np.zeros((3, 16, 8, 8, 3), np.uint8)
    order = bake_rounds_native(images, rounds=3, pad=1, flip_p=0.5,
                               first_round_clean=True, shuffle=False, seed=7, out=out)
    assert order.shape == (3, 16)
    # clean first round copies the raw data in order
    np.testing.assert_array_equal(out[0], images)
    np.testing.assert_array_equal(order[0], np.arange(16))
    # later rounds are augmented (crops shift zeros in / flips reorder)
    assert not np.array_equal(out[1], images)
    assert not np.array_equal(out[1], out[2])
    # crop keeps pixel value population (zero padding may introduce zeros)
    assert out[1].max() == images.max() or out[1].max() <= images.max()


def test_bake_rounds_deterministic():
    rng = np.random.default_rng(2)
    images = rng.integers(0, 255, (8, 8, 8, 3), np.uint8)
    a = np.zeros((2, 8, 8, 8, 3), np.uint8)
    b = np.zeros_like(a)
    oa = bake_rounds_native(images, 2, 1, 0.5, False, True, 123, a)
    ob = bake_rounds_native(images, 2, 1, 0.5, False, True, 123, b)
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(oa, ob)
    c = np.zeros_like(a)
    bake_rounds_native(images, 2, 1, 0.5, False, True, 124, c)
    assert not np.array_equal(a, c)


def test_bake_shuffle_is_permutation():
    images = np.arange(12 * 4 * 4 * 1, dtype=np.uint8).reshape(12, 4, 4, 1)
    out = np.zeros((1, 12, 4, 4, 1), np.uint8)
    order = bake_rounds_native(images, 1, 0, 0.0, False, True, 5, out)
    assert sorted(order[0].tolist()) == list(range(12))
    # pad=0, flip_p=0 -> pure permutation copy
    np.testing.assert_array_equal(out[0], images[order[0]])


def test_flip_only():
    images = np.arange(2 * 2 * 4 * 1, dtype=np.uint8).reshape(2, 2, 4, 1)
    out = np.zeros((1, 2, 2, 4, 1), np.uint8)
    bake_rounds_native(images, 1, 0, 1.0, False, False, 0, out)
    np.testing.assert_array_equal(out[0], images[:, :, ::-1, :])


def test_baked_dataset_uses_native(config_dir, tmp_path):
    """End-to-end: data.db=baked goes through the native engine and the
    BakedDataset contract holds."""
    from fullbatchtraining_tpu.config import load_config
    from fullbatchtraining_tpu.data import construct_databundle

    cfg = load_config(config_dir, overrides=[
        "data.size=64", f"data.path={tmp_path}/none", "data.db=baked",
        f"data.db.path={tmp_path}/db", "data.db.rounds=4",
        "data.db.first_round_clean=True", "data.db.shuffle_while_writing=False"])
    bundle = construct_databundle(cfg.data)
    raw = construct_databundle(load_config(config_dir, overrides=[
        "data.size=64", f"data.path={tmp_path}/none"]).data).train
    np.testing.assert_array_equal(bundle.baked.round(0).images, raw.images)
    assert not np.array_equal(bundle.baked.round(1).images, raw.images)
    # labels track the shuffled/augmented source samples
    assert sorted(bundle.baked.round(1).labels.tolist()) == sorted(raw.labels.tolist())
