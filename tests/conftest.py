"""Test configuration: force an 8-device virtual CPU mesh.

The reference exercises multi-GPU behavior only on real hardware; the
TPU-native rebuild tests all sharding logic on a virtual 8-device CPU backend
(SURVEY.md §4). This must run before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: env may preset the real TPU platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
# Hermetic suite: never attempt real dataset downloads from tests (the
# download tests that exercise the machinery delete this var and use file://)
os.environ.setdefault("FBT_NO_DOWNLOAD", "1")

import pathlib
import sys

import jax
import pytest

# The axon site hook (sitecustomize in PYTHONPATH) force-registers the real
# TPU backend regardless of JAX_PLATFORMS; override at the config level so
# tests genuinely run on the 8-device virtual CPU backend.
jax.config.update("jax_platforms", "cpu")
assert len(jax.devices()) == 8, f"expected 8 CPU devices, got {jax.devices()}"

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))


@pytest.fixture(scope="session")
def config_dir():
    return REPO_ROOT / "config"


@pytest.fixture()
def tiny_overrides(tmp_path):
    """Overrides producing a seconds-scale end-to-end run on CPU."""
    return [
        "dryrun=True",
        "data.size=64",
        "data.batch_size=32",
        "hyp.sub_batch=16",
        "hyp.steps=2",
        "impl.validate_every_nth_step=1",
        f"base_dir={tmp_path}",
        "name=test",
        "seed=0",
    ]
