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


# --- native JPEG decode engine (native/fbt_jpeg.cpp) ---------------------

def _pil_decode(blob, side):
    """The exact PIL loop from datasets._load_imagefolder."""
    import io

    from PIL import Image
    img = Image.open(io.BytesIO(blob)).convert("RGB")
    scale = side / min(img.size)
    img = img.resize((max(side, round(img.width * scale)),
                      max(side, round(img.height * scale))), Image.BILINEAR)
    left = (img.width - side) // 2
    top = (img.height - side) // 2
    return np.asarray(img.crop((left, top, left + side, top + side)), np.uint8)


def _make_jpeg(w, h, seed=0, quality=87, mode="RGB"):
    import io

    from PIL import Image
    rng = np.random.default_rng(seed)
    shape = (h, w, 3) if mode == "RGB" else (h, w)
    img = np.clip(rng.normal(128, 40, shape), 0, 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img, mode="RGB" if mode == "RGB" else "L").save(
        buf, "JPEG", quality=quality)
    return buf.getvalue()


@pytest.fixture
def jpeg_lib():
    from fullbatchtraining_tpu.data.native import get_jpeg_lib
    if get_jpeg_lib() is None:
        pytest.skip("no C++ toolchain/libjpeg for the native JPEG engine")


def test_jpeg_decode_byte_exact_vs_pil(jpeg_lib):
    """Downscales under 2x decode at full resolution: the fixed-point
    triangle resample must be byte-identical to PIL's BILINEAR loop."""
    from fullbatchtraining_tpu.data.native import decode_resize_jpeg_batch
    blobs = [_make_jpeg(280, 260, seed=1), _make_jpeg(96, 128, seed=2),
             _make_jpeg(257, 257, seed=3), _make_jpeg(400, 260, seed=4)]
    out, ok = decode_resize_jpeg_batch(blobs, 257)
    assert ok.all()
    for i, blob in enumerate(blobs):
        np.testing.assert_array_equal(out[i], _pil_decode(blob, 257))


def test_jpeg_decode_prescaled_close_to_pil(jpeg_lib):
    """>=2x downscales engage libjpeg's power-of-two IDCT prescale; the
    result is not bit-identical to a full decode + resize but must stay
    visually equivalent (small bounded deviation)."""
    from fullbatchtraining_tpu.data.native import decode_resize_jpeg_batch
    blob = _make_jpeg(1024, 768, seed=5)
    out, ok = decode_resize_jpeg_batch([blob], 257)
    assert ok.all()
    ref = _pil_decode(blob, 257).astype(np.int16)
    diff = np.abs(out[0].astype(np.int16) - ref)
    assert diff.mean() < 4 and diff.max() < 40


def test_jpeg_decode_upscale_and_grayscale(jpeg_lib):
    from fullbatchtraining_tpu.data.native import decode_resize_jpeg_batch
    # shorter side below target -> upscale branch (filterscale clamps to 1);
    # grayscale stays under a 2x downscale so the full-decode path is exact
    small = _make_jpeg(20, 14, seed=6)
    gray = _make_jpeg(32, 24, seed=7, mode="L")
    out, ok = decode_resize_jpeg_batch([small, gray], 18)
    assert ok.all()
    np.testing.assert_array_equal(out[0], _pil_decode(small, 18))
    np.testing.assert_array_equal(out[1], _pil_decode(gray, 18))


def test_jpeg_decode_flags_bad_files_for_fallback(jpeg_lib):
    """Non-JPEG bytes and truncated files must be reported per-file, not
    crash the batch; good files around them still decode."""
    import io

    from PIL import Image
    from fullbatchtraining_tpu.data.native import decode_resize_jpeg_batch
    good = _make_jpeg(24, 20, seed=8)  # <2x downscale: byte-exact path
    png = io.BytesIO()
    Image.new("RGB", (32, 32), (1, 2, 3)).save(png, "PNG")
    out, ok = decode_resize_jpeg_batch(
        [b"garbage", good, png.getvalue(), good[: len(good) // 2], b""], 18)
    assert ok.tolist() == [False, True, False, False, False]
    np.testing.assert_array_equal(out[1], _pil_decode(good, 18))


def test_imagefolder_native_and_pil_caches_agree(jpeg_lib, tmp_path,
                                                 monkeypatch):
    """_load_imagefolder writes the same cache whether the native engine or
    the PIL fallback decodes (small files -> full-resolution decode path)."""
    from PIL import Image

    from fullbatchtraining_tpu.data import datasets as ds
    rng = np.random.default_rng(9)
    for split, n in (("train", 4), ("val", 2)):
        d = tmp_path / split / "n01"
        d.mkdir(parents=True)
        for i in range(n):
            # heights stay under 2x the 18px cache side: full-decode path,
            # byte-identical to PIL by construction
            arr = rng.integers(0, 255, (28 + 2 * i, 40, 3), np.uint8)
            Image.fromarray(arr).save(d / f"img_{i}.jpg", quality=92)
    native = ds._load_imagefolder(tmp_path, pixels=16, cache_tag="nat")
    import fullbatchtraining_tpu.data.native as native_mod
    monkeypatch.setattr(native_mod, "decode_resize_jpeg_batch",
                        lambda *a, **k: None)
    pil = ds._load_imagefolder(tmp_path, pixels=16, cache_tag="pil")
    for (a, la), (b, lb) in zip(native, pil):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        np.testing.assert_array_equal(la, lb)


def test_imagefolder_mixed_tree_falls_back_per_file(jpeg_lib, tmp_path):
    """A PNG disguised as .jpg (ImageNet has a few) is decoded by the PIL
    fallback while the JPEGs around it use the native engine."""
    from PIL import Image

    from fullbatchtraining_tpu.data.datasets import _load_imagefolder
    d = tmp_path / "train" / "n01"
    d.mkdir(parents=True)
    Image.new("RGB", (40, 30), (200, 10, 10)).save(d / "a.jpg", quality=95)
    Image.new("RGB", (40, 30), (10, 200, 10)).save(d / "b.jpg", format="PNG")
    v = tmp_path / "val" / "n01"
    v.mkdir(parents=True)
    Image.new("RGB", (40, 30), (10, 10, 200)).save(v / "c.jpg", quality=95)
    (train, labels), _ = _load_imagefolder(tmp_path, pixels=16, cache_tag="m")
    assert len(train) == 2
    np.testing.assert_allclose(np.asarray(train[0], np.float32).mean(axis=(0, 1)),
                               (200, 10, 10), atol=12)
    np.testing.assert_allclose(np.asarray(train[1], np.float32).mean(axis=(0, 1)),
                               (10, 200, 10), atol=12)


def test_jpeg_decode_threaded_matches_single(jpeg_lib):
    """The thread pool partitions files dynamically; output must not depend
    on thread count (each file writes a disjoint output slot)."""
    from fullbatchtraining_tpu.data.native import decode_resize_jpeg_batch
    blobs = [_make_jpeg(24 + i, 20 + i, seed=10 + i) for i in range(12)]
    one, ok1 = decode_resize_jpeg_batch(blobs, 18, n_threads=1)
    four, ok4 = decode_resize_jpeg_batch(blobs, 18, n_threads=4)
    assert ok1.all() and ok4.all()
    np.testing.assert_array_equal(one, four)
