"""torch.hub-style entry points for released checkpoints.

Counterpart of /root/reference/hubconf.py: same entry names and defaults
(incl. ``pretrained=False`` — hubconf.py:71-99), returning
(flax_module, variables) pairs converted from the reference's released
.pth 5-tuples (see fullbatchtraining_tpu/pretrained.py).
"""

dependencies = ["jax", "flax", "torch"]

from fullbatchtraining_tpu.pretrained import (  # noqa: F401, E402
    RELEASE_FILES,
    load_pretrained,
)


def resnet18_fbaug_clip(pretrained=False, file=None, progress=True, **kwargs):
    return load_pretrained("resnet18_fbaug_clip", file=file, pretrained=pretrained, progress=progress, **kwargs)


def resnet18_fbaug_gradreg(pretrained=False, file=None, progress=True, **kwargs):
    return load_pretrained("resnet18_fbaug_gradreg", file=file, pretrained=pretrained, progress=progress, **kwargs)


def resnet18_fbaug_gradreg_v2(pretrained=False, file=None, progress=True, **kwargs):
    return load_pretrained("resnet18_fbaug_gradreg_v2", file=file, pretrained=pretrained, progress=progress, **kwargs)


def resnet18_fbaug_highreg(pretrained=False, file=None, progress=True, **kwargs):
    return load_pretrained("resnet18_fbaug_highreg", file=file, pretrained=pretrained, progress=progress, **kwargs)


def resnet152_fbaug_highreg(pretrained=False, file=None, progress=True, **kwargs):
    return load_pretrained("resnet152_fbaug_highreg", file=file, pretrained=pretrained, progress=progress, **kwargs)
