"""Policy augmentations (RandAugment / AutoAugment / AugMix), host-side.

Compact re-implementation of the policy-augmentation surface the reference
vendored from timm (/root/reference/fullbatch/data/auto_augment.py, 1041
lines, used at data_preparation.py:157-170 for config keys
``data.augmentations_train.{RandAugment,AutoAugment,AugMix}`` with timm spec
strings like ``rand-m7-n2-mstd0.5-inc1``).

These are PIL per-image transforms and therefore run at BAKE time, producing
fixed-augmentation rounds for the baked store (SURVEY.md §2 #8: "port as
host-side preprocessing during dataset baking"); the device-side jitted path
handles crop/flip/resize families.
"""

from __future__ import annotations

import random
import re
from typing import Callable

import numpy as np
from PIL import Image, ImageEnhance, ImageOps

_MAX_LEVEL = 10.0
_FILL = (128, 128, 128)


def _affine(img, matrix, fill):
    return img.transform(img.size, Image.AFFINE, matrix, fillcolor=fill)


def _make_ops(translate_const: int, fill=_FILL):
    """name -> fn(img, level in [0, 10]) with standard magnitude ranges."""

    def signed(v):
        return -v if random.random() < 0.5 else v

    def enhance(factory, scale=0.9):
        def op(img, level):
            return factory(img).enhance(1.0 + signed(level / _MAX_LEVEL * scale))
        return op

    return {
        "AutoContrast": lambda img, level: ImageOps.autocontrast(img),
        "Equalize": lambda img, level: ImageOps.equalize(img),
        "Invert": lambda img, level: ImageOps.invert(img),
        "Rotate": lambda img, level: img.rotate(signed(level / _MAX_LEVEL * 30.0),
                                                fillcolor=fill),
        "Posterize": lambda img, level: ImageOps.posterize(
            img, max(1, int(8 - level / _MAX_LEVEL * 4))),
        "PosterizeIncreasing": lambda img, level: ImageOps.posterize(
            img, max(1, int(4 + (1 - level / _MAX_LEVEL) * 4))),
        "Solarize": lambda img, level: ImageOps.solarize(
            img, int(256 - level / _MAX_LEVEL * 256)),
        "SolarizeAdd": lambda img, level: _solarize_add(
            img, int(level / _MAX_LEVEL * 110)),
        "Color": enhance(ImageEnhance.Color),
        "Contrast": enhance(ImageEnhance.Contrast),
        "Brightness": enhance(ImageEnhance.Brightness),
        "Sharpness": enhance(ImageEnhance.Sharpness),
        "ShearX": lambda img, level: _affine(
            img, (1, signed(level / _MAX_LEVEL * 0.3), 0, 0, 1, 0), fill),
        "ShearY": lambda img, level: _affine(
            img, (1, 0, 0, signed(level / _MAX_LEVEL * 0.3), 1, 0), fill),
        "TranslateX": lambda img, level: _affine(
            img, (1, 0, signed(level / _MAX_LEVEL * translate_const), 0, 1, 0), fill),
        "TranslateY": lambda img, level: _affine(
            img, (1, 0, 0, 0, 1, signed(level / _MAX_LEVEL * translate_const)), fill),
    }


def _solarize_add(img, add, thresh=128):
    lut = [min(255, i + add) if i < thresh else i for i in range(256)]
    return img.point(lut * len(img.getbands()))


_RAND_OPS = ["AutoContrast", "Equalize", "Invert", "Rotate", "Posterize", "Solarize",
             "SolarizeAdd", "Color", "Contrast", "Brightness", "Sharpness",
             "ShearX", "ShearY", "TranslateX", "TranslateY"]


def _parse_spec(spec: str) -> dict:
    """Parse timm-style 'rand-m9-n2-mstd0.5-inc1' into fields."""
    out = {"kind": None, "m": 10, "n": 2, "mstd": 0.0, "inc": 0, "w": 3, "d": -1}
    parts = str(spec).split("-")
    out["kind"] = parts[0]
    for part in parts[1:]:
        match = re.fullmatch(r"([a-z]+)([0-9.]+)", part)
        if not match:
            continue
        key, value = match.group(1), float(match.group(2))
        if key in out:
            out[key] = value
    return out


def rand_augment_transform(spec: str, params: dict) -> Callable:
    """RandAugment (Cubuk et al.): n random ops at magnitude m (+- mstd)."""
    cfg = _parse_spec(spec)
    ops = _make_ops(params.get("translate_const", 14),
                    params.get("img_mean", _FILL))
    names = list(_RAND_OPS)
    if cfg["inc"]:
        names = [n.replace("Posterize", "PosterizeIncreasing") for n in names]

    def transform(img: Image.Image) -> Image.Image:
        for _ in range(int(cfg["n"])):
            level = random.gauss(cfg["m"], cfg["mstd"]) if cfg["mstd"] else cfg["m"]
            level = min(max(level, 0), _MAX_LEVEL)
            img = ops[random.choice(names)](img, level)
        return img

    return transform


# AutoAugment ImageNet policy v0 (Cubuk et al., table of (op, prob, magnitude) pairs).
_AA_POLICY_V0 = [
    [("Equalize", 0.8, 1), ("ShearY", 0.8, 4)],
    [("Color", 0.4, 9), ("Equalize", 0.6, 3)],
    [("Color", 0.4, 1), ("Rotate", 0.6, 8)],
    [("Solarize", 0.8, 3), ("Equalize", 0.4, 7)],
    [("Solarize", 0.4, 2), ("Solarize", 0.6, 2)],
    [("Color", 0.2, 0), ("Equalize", 0.8, 8)],
    [("Equalize", 0.4, 8), ("SolarizeAdd", 0.8, 3)],
    [("ShearX", 0.2, 9), ("Rotate", 0.6, 8)],
    [("Color", 0.6, 1), ("Equalize", 1.0, 2)],
    [("Invert", 0.4, 9), ("Rotate", 0.6, 0)],
    [("Equalize", 1.0, 9), ("ShearY", 0.6, 3)],
    [("Color", 0.4, 7), ("Equalize", 0.6, 0)],
    [("Posterize", 0.4, 6), ("AutoContrast", 0.4, 7)],
    [("Solarize", 0.6, 8), ("Color", 0.6, 9)],
    [("Solarize", 0.2, 4), ("Rotate", 0.8, 9)],
    [("Rotate", 1.0, 7), ("TranslateY", 0.8, 9)],
    [("ShearX", 0.0, 0), ("Solarize", 0.8, 4)],
    [("ShearY", 0.8, 0), ("Color", 0.6, 4)],
    [("Color", 1.0, 0), ("Rotate", 0.6, 2)],
    [("Equalize", 0.8, 4), ("Equalize", 0.0, 8)],
    [("Equalize", 1.0, 4), ("AutoContrast", 0.6, 2)],
    [("ShearY", 0.4, 7), ("SolarizeAdd", 0.6, 7)],
    [("Posterize", 0.8, 2), ("Solarize", 0.6, 10)],
    [("Solarize", 0.6, 8), ("Equalize", 0.6, 1)],
    [("Color", 0.8, 6), ("Rotate", 0.4, 5)],
]


def auto_augment_transform(spec: str, params: dict) -> Callable:
    ops = _make_ops(params.get("translate_const", 14),
                    params.get("img_mean", _FILL))

    def transform(img: Image.Image) -> Image.Image:
        for name, prob, magnitude in random.choice(_AA_POLICY_V0):
            if random.random() < prob:
                img = ops[name](img, magnitude)
        return img

    return transform


def augment_and_mix_transform(spec: str, params: dict) -> Callable:
    """AugMix (Hendrycks et al.): mix w augmentation chains with Dirichlet
    weights, then blend with the original via a Beta draw."""
    cfg = _parse_spec(spec)
    ops = _make_ops(params.get("translate_const", 14),
                    params.get("img_mean", _FILL))
    # AugMix excludes ops that alter colors inconsistently with corruption evals
    names = ["AutoContrast", "Equalize", "Rotate", "Posterize", "Solarize",
             "ShearX", "ShearY", "TranslateX", "TranslateY"]
    width = int(cfg["w"]) or 3
    alpha = 1.0

    def transform(img: Image.Image) -> Image.Image:
        ws = np.random.dirichlet([alpha] * width)
        m = np.random.beta(alpha, alpha)
        mix = np.zeros((*img.size[::-1], len(img.getbands())), np.float32)
        for i in range(width):
            chain = img.copy()
            depth = int(cfg["d"]) if cfg["d"] > 0 else np.random.randint(1, 4)
            for _ in range(depth):
                chain = ops[random.choice(names)](chain, cfg["m"])
            mix += ws[i] * np.asarray(chain, np.float32)
        blended = (1 - m) * np.asarray(img, np.float32) + m * mix
        return Image.fromarray(np.clip(blended, 0, 255).astype(np.uint8))

    return transform


def get_policy_transform(key: str, spec: str, img_size: int, mean) -> Callable:
    """Dispatch matching the reference's _get_autoaugment
    (data_preparation.py:157-170)."""
    params = {
        "translate_const": int(img_size * 0.45),
        "img_mean": tuple(min(255, round(255 * x)) for x in mean),
    }
    spec = str(spec)
    if key == "RandAugment" or spec.startswith("rand"):
        return rand_augment_transform(spec, params)
    if key == "AugMix" or spec.startswith("augmix"):
        params["translate_pct"] = 0.3
        return augment_and_mix_transform(spec, params)
    return auto_augment_transform(spec, params)


def apply_policy_batch(images: np.ndarray, key: str, spec: str, mean,
                       seed: int = 0) -> np.ndarray:
    """Apply a policy transform to a uint8 NHWC batch (bake-time path)."""
    random.seed(seed)
    np.random.seed(seed % 2**32)
    transform = get_policy_transform(key, spec, images.shape[1], mean)
    out = np.empty_like(images)
    for i in range(len(images)):
        out[i] = np.asarray(transform(Image.fromarray(images[i])), np.uint8)
    return out
