"""Device-side, jit-compiled batched augmentations.

TPU-native replacement for the reference's PIL/torchvision transform stack
and its 8-per-GPU DataLoader worker processes
(/root/reference/fullbatch/data/data_preparation.py:157-200): augmentations
are pure functions over uint8 NHWC batches keyed by a PRNG key, compiled into
the same XLA program as the training step. Data stays uint8 in HBM;
normalization to compute dtype happens on-device after augmentation.

Supported config surface (mirroring the yaml keys the reference parses):
RandomCrop [size, padding], RandomHorizontalFlip p, CenterCrop size,
Resize size, RandomResizedCrop size.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def normalize(images, mean, std, dtype=jnp.float32):
    """uint8 [0,255] -> normalized float, matching ToTensor + Normalize."""
    x = images.astype(dtype) / 255.0
    mean = jnp.asarray(mean, dtype)
    std = jnp.asarray(std, dtype)
    return (x - mean) / std


def random_crop(images, key, size: int, padding: int):
    """Zero-pad by ``padding`` then crop a random size x size window per image."""
    b, h, w, c = images.shape
    padded = jnp.pad(images, ((0, 0), (padding, padding), (padding, padding), (0, 0)))
    ky, kx = jax.random.split(key)
    oy = jax.random.randint(ky, (b,), 0, h + 2 * padding - size + 1)
    ox = jax.random.randint(kx, (b,), 0, w + 2 * padding - size + 1)

    def crop_one(img, y, x):
        return jax.lax.dynamic_slice(img, (y, x, 0), (size, size, c))

    return jax.vmap(crop_one)(padded, oy, ox)


def random_horizontal_flip(images, key, p: float = 0.5):
    flip = jax.random.bernoulli(key, p, (images.shape[0], 1, 1, 1))
    return jnp.where(flip, images[:, :, ::-1, :], images)


def center_crop(images, size: int):
    h, w = images.shape[1:3]
    top, left = (h - size) // 2, (w - size) // 2
    return images[:, top:top + size, left:left + size, :]


def resize(images, size: int):
    b, _, _, c = images.shape
    return jax.image.resize(images.astype(jnp.float32), (b, size, size, c), "bilinear")


def random_resized_crop(images, key, size: int, scale=(0.08, 1.0), ratio=(3 / 4, 4 / 3)):
    """Crop a random area/aspect box and resize to size x size.

    Fixed-shape implementation via scale_and_translate (no dynamic shapes
    under jit). Uses direct area/log-ratio sampling rather than torchvision's
    10-attempt rejection loop — same distribution family, compiler-friendly.
    """
    b, h, w, c = images.shape
    k1, k2, k3, k4 = jax.random.split(key, 4)
    area = jax.random.uniform(k1, (b,), minval=scale[0], maxval=scale[1]) * (h * w)
    log_ratio = jax.random.uniform(k2, (b,), minval=jnp.log(ratio[0]), maxval=jnp.log(ratio[1]))
    aspect = jnp.exp(log_ratio)
    cw = jnp.clip(jnp.sqrt(area * aspect), 1.0, w)
    ch = jnp.clip(jnp.sqrt(area / aspect), 1.0, h)
    oy = jax.random.uniform(k3, (b,)) * (h - ch)
    ox = jax.random.uniform(k4, (b,)) * (w - cw)

    def one(img, ch_, cw_, oy_, ox_):
        # output[i] = input[i / s + t] ; choose s,t so the box maps to [0, size)
        sy, sx = size / ch_, size / cw_
        return jax.image.scale_and_translate(
            img.astype(jnp.float32), (size, size, c), (0, 1),
            jnp.array([sy, sx]), jnp.array([-oy_ * sy, -ox_ * sx]), "linear")

    return jax.vmap(one)(images, ch, cw, oy, ox)


def random_crop_flip_mxu(images, key, size: int, padding: int, flip_p: float):
    """Fused random crop + horizontal flip as one-hot selection matmuls.

    Per-image dynamic-slice crops lower to gathers, which cost ~35% of the
    full-batch step on TPU. Instead the crop window is expressed as
    out = R @ padded @ C^T with per-image one-hot row/column selectors; the
    flip folds into C by reversing its rows. Both contractions ride the MXU
    and the gather disappears. Exact same semantics/distribution as
    random_crop + random_horizontal_flip.
    """
    b, h, w, c = images.shape
    ph, pw = h + 2 * padding, w + 2 * padding
    padded = jnp.pad(images, ((0, 0), (padding, padding), (padding, padding), (0, 0)))
    ky, kx, kf = jax.random.split(key, 3)
    oy = jax.random.randint(ky, (b,), 0, ph - size + 1)
    ox = jax.random.randint(kx, (b,), 0, pw - size + 1)
    flip = jax.random.bernoulli(kf, flip_p, (b,)) if flip_p > 0 else None

    span = jnp.arange(size)
    rows = jax.nn.one_hot(oy[:, None] + span[None, :], ph, dtype=jnp.bfloat16)
    col_idx = ox[:, None] + span[None, :]
    if flip is not None:
        col_idx = jnp.where(flip[:, None], ox[:, None] + (size - 1 - span)[None, :],
                            col_idx)
    cols = jax.nn.one_hot(col_idx, pw, dtype=jnp.bfloat16)

    x = padded.astype(jnp.bfloat16)  # integers <= 255 are exact in bf16
    x = jnp.einsum("bih,bhwc->biwc", rows, x, preferred_element_type=jnp.bfloat16)
    x = jnp.einsum("bjw,biwc->bijc", cols, x, preferred_element_type=jnp.bfloat16)
    return x


def crop_spec(arg) -> tuple[int, int]:
    """(size, padding) from a RandomCrop config entry ([size, pad] or size)."""
    if isinstance(arg, (list, tuple)):
        size, pad = arg
    else:
        size, pad = arg, 0
    return int(size), int(pad)


def augmented_hw(aug_cfg, h: int, w: int) -> tuple[int, int]:
    """Output spatial dims after the configured augmentations (policy ops
    preserve size; size ops apply in config order)."""
    for name, arg in dict(aug_cfg or {}).items():
        if name == "RandomCrop":
            h = w = crop_spec(arg)[0]
        elif name in ("RandomResizedCrop", "CenterCrop", "Resize"):
            h = w = int(arg)
    return h, w


def make_augment_fn(aug_cfg) -> Callable:
    """Compose augmentations from a config dict -> fn(images_u8, key)."""
    aug_cfg = dict(aug_cfg or {})
    # Fused MXU fast path for the dominant CIFAR pipeline.
    if set(aug_cfg) == {"RandomCrop", "RandomHorizontalFlip"} or set(aug_cfg) == {"RandomCrop"}:
        size, pad = crop_spec(aug_cfg["RandomCrop"])
        flip_p = float(aug_cfg.get("RandomHorizontalFlip", 0.0))

        def fused(images, key):
            if images.shape[1] == int(size) and images.shape[2] == int(size):
                return random_crop_flip_mxu(images, key, int(size), int(pad), flip_p)
            return _compose(aug_cfg)(images, key)

        return fused
    return _compose(aug_cfg)


def _compose(aug_cfg) -> Callable:
    ops = []
    if aug_cfg:
        for name, arg in aug_cfg.items():
            if name == "RandomCrop":
                size, pad = crop_spec(arg)
                ops.append(lambda x, k, s=size, p=pad: random_crop(x, k, s, p))
            elif name == "RandomHorizontalFlip":
                ops.append(lambda x, k, p=float(arg): random_horizontal_flip(x, k, p))
            elif name == "RandomResizedCrop":
                ops.append(lambda x, k, s=int(arg): random_resized_crop(x, k, s))
            elif name == "CenterCrop":
                ops.append(lambda x, k, s=int(arg): center_crop(x, s))
            elif name == "Resize":
                ops.append(lambda x, k, s=int(arg): resize(x, s))
            else:
                raise ValueError(f"Unsupported augmentation {name} "
                                 "(policy augmentations land with the baked-data path).")

    def augment(images, key):
        for i, op in enumerate(ops):
            images = op(images, jax.random.fold_in(key, i))
        return images

    return augment


def make_eval_transform(aug_cfg) -> Callable:
    """Deterministic validation transform (CenterCrop/Resize only)."""
    ops = []
    if aug_cfg:
        for name, arg in aug_cfg.items():
            if name == "CenterCrop":
                ops.append(lambda x, s=int(arg): center_crop(x, s))
            elif name == "Resize":
                ops.append(lambda x, s=int(arg): resize(x, s))
            else:
                raise ValueError(f"Unsupported eval augmentation {name}.")

    def transform(images):
        for op in ops:
            images = op(images)
        return images

    return transform
