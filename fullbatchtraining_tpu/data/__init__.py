"""Data subsystem: host arrays + device-side augmentation + baked rounds."""

from .augmentations import make_augment_fn, make_eval_transform, normalize
from .baked import BakedDataset, bake_dataset
from .datasets import ArrayDataset, construct_datasets
from .pipeline import DataBundle, construct_databundle, epoch_layout, layout_epoch

__all__ = [
    "ArrayDataset",
    "BakedDataset",
    "DataBundle",
    "bake_dataset",
    "construct_datasets",
    "construct_databundle",
    "epoch_layout",
    "layout_epoch",
    "make_augment_fn",
    "make_eval_transform",
    "normalize",
]
