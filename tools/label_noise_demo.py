#!/usr/bin/env python
"""Generate the noisy-label synthetic CIFAR-10 stand-in for the
recipe-generalization demo (VALIDATION.md "Recipe generalization demo").

Writes standard CIFAR-10 python-pickle batches (data_batch_1..5 +
test_batch) so the run exercises the real pickle loader
(fullbatchtraining_tpu/data/datasets.py:_load_cifar_pickles) instead of the
synthetic fallback. The task: 10 smooth class prototypes + per-sample
gaussian noise; 15% of TRAIN labels are flipped uniformly (the validation
split stays clean). A model that memorizes the flipped labels loses clean
validation accuracy, so the paper's regularization recipes (clip, gradient
penalty — arXiv:2109.14119) have a measurable generalization margin to
protect, which pure synthetic-fallback data (100% learnable) does not offer.

Usage: python tools/label_noise_demo.py [out_dir] [train_n] [val_n]
"""

import pickle
import sys
from pathlib import Path

import numpy as np

NOISE_STD = 80.0     # sample noise around each prototype (uint8 scale)
FLIP_FRACTION = 0.15  # fraction of train labels flipped (val stays clean)
CLASSES = 10
SEED = 20260818


def _smooth_prototypes(rng):
    """Low-frequency class prototypes: upsampled 4x4 random grids."""
    coarse = rng.uniform(0, 255, (CLASSES, 4, 4, 3)).astype(np.float32)
    return coarse.repeat(8, axis=1).repeat(8, axis=2)  # (10, 32, 32, 3)


def _make_split(rng, patterns, n, flip_fraction):
    labels = rng.integers(0, CLASSES, n)
    noise = rng.standard_normal((n, 32, 32, 3), dtype=np.float32)
    images = np.clip(patterns[labels] + NOISE_STD * noise, 0, 255).astype(np.uint8)
    true_labels = labels.copy()
    if flip_fraction:
        n_flip = int(round(flip_fraction * n))
        flip_idx = rng.choice(n, n_flip, replace=False)
        offsets = rng.integers(1, CLASSES, n_flip)  # never the true label
        labels[flip_idx] = (labels[flip_idx] + offsets) % CLASSES
    return images, labels.astype(np.int64), true_labels.astype(np.int64)


def _write_batch(path: Path, images: np.ndarray, labels: np.ndarray):
    # CIFAR python format: row-major CHW bytes per image, b"labels" list
    payload = {
        b"data": images.transpose(0, 3, 1, 2).reshape(len(images), -1).copy(),
        b"labels": [int(label) for label in labels],
    }
    with open(path, "wb") as handle:
        pickle.dump(payload, handle)


def main(out_dir="/tmp/fbt_labelnoise", train_n=20_000, val_n=4_000):
    rng = np.random.default_rng(SEED)
    patterns = _smooth_prototypes(rng)
    tr_images, tr_labels, tr_true = _make_split(rng, patterns, train_n, FLIP_FRACTION)
    va_images, va_labels, _ = _make_split(rng, patterns, val_n, 0.0)

    folder = Path(out_dir) / "cifar-10-batches-py"
    folder.mkdir(parents=True, exist_ok=True)
    per = train_n // 5
    for i in range(5):
        _write_batch(folder / f"data_batch_{i + 1}",
                     tr_images[i * per:(i + 1) * per],
                     tr_labels[i * per:(i + 1) * per])
    _write_batch(folder / "test_batch", va_images, va_labels)
    np.save(folder / "train_true_labels.npy", tr_true)  # for memorization audit

    flipped = int((tr_labels != tr_true).sum())
    print(f"Wrote {train_n} train (+{flipped} flipped labels) / {val_n} clean "
          f"val images to {folder}")
    print(f"Run with: data.path={out_dir} data.size={train_n}")


if __name__ == "__main__":
    main(*sys.argv[1:])
