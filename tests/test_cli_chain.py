"""End-to-end CLI chain: the reference's four entry points as subprocesses.

The reference ships no test suite; its de-facto integration test is running
the real scripts (SURVEY.md §4). This drives the full workflow chain —
train -> verify checkpoint -> FP audit -> loss-surface crunch — through the
actual CLI entry points (argv parsing, job_startup chdir, logging, config
composition) on the 8-device CPU mesh with tiny shapes. The same chain on
real TPU hardware is recorded in VALIDATION.md "Full workflow chain".
"""

import os
import subprocess
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parent.parent

pytestmark = pytest.mark.slow

BASE = ["model=linear", "data.size=64", "data.path=/tmp/__none__",
        "data.batch_size=32", "hyp.sub_batch=16", "seed=0",
        "data.augmentations_train="]


def _run(script, overrides, cwd):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    p = subprocess.run([sys.executable, str(ROOT / script)] + overrides,
                       cwd=cwd, env=env, capture_output=True, text=True,
                       timeout=420)
    assert p.returncode == 0, f"{script} failed:\n{p.stdout}\n{p.stderr}"
    return p.stdout + p.stderr


def test_cli_workflow_chain(tmp_path):
    out = _run("train_with_gradient_descent.py", BASE + [
        "name=chain", "hyp=fb1", "hyp.steps=2", "hyp.warmup=0",
        "impl.checkpoint.name=chain.ckpt"], tmp_path)
    assert "Job finished" in out
    assert (tmp_path / "checkpoints" / "chain.ckpt").exists()

    out = _run("verify_model_checkpoint.py", BASE + [
        "name=chain_verify", "impl.checkpoint.name=chain.ckpt"], tmp_path)
    assert "Checkpoint step 2" in out and "valid_acc" in out

    out = _run("measure_floating_point_accuracy.py", BASE + [
        "name=chain_fp", "hyp=fb1"], tmp_path)
    # XLA CPU is deterministic too: the audit must report bitwise-zero noise
    assert "abs_linf: 0.000e+00" in out
    assert "bitwise reproducible" in out

    out = _run("crunch_loss_landscape.py", BASE + [
        "name=chain_crunch", "hyp=fb1", "impl.checkpoint.name=chain.ckpt",
        "viz=1d", "viz.coordinates.x.num=3", "viz.vmap_positions=3"], tmp_path)
    assert "Surface complete: 3 positions" in out


def test_cli_export_reference_checkpoint(tmp_path):
    """train -> tools/export_reference_checkpoint.py produces a torch-loadable
    reference 5-tuple (the reverse interop direction, MIGRATION.md)."""
    resnet = ["model=resnet20", "model.width=4", "data.size=32",
              "data.path=/tmp/__none__", "data.batch_size=16",
              "hyp.sub_batch=16", "seed=0", "data.augmentations_train="]
    out = _run("train_with_gradient_descent.py", resnet + [
        "name=export_src", "hyp=fb1", "hyp.steps=1", "hyp.warmup=0",
        "impl.checkpoint.name=export_src.ckpt"], tmp_path)
    assert "Job finished" in out

    out = _run("tools/export_reference_checkpoint.py", resnet + [
        "name=export_run", "impl.checkpoint.name=export_src.ckpt",
        "+out=export/final_resnet20.pth"], tmp_path)
    assert "Exported" in out
    pth = tmp_path / "export" / "final_resnet20.pth"
    assert pth.exists()

    import torch

    payload = torch.load(pth, weights_only=False)
    assert isinstance(payload, list) and len(payload) == 5
    assert payload[4] == 1  # trained one step
    assert any(k.endswith("num_batches_tracked") for k in payload[1])
    assert payload[1]["fc.weight"].ndim == 2  # (O, I): torch Linear layout
    assert payload[1]["fc.weight"].shape[0] == 10


def test_cli_import_reference_checkpoint(tmp_path):
    """export -> tools/import_reference_checkpoint.py round-trips through the
    reference .pth into a resumable msgpack TrainState whose weights,
    momentum and step survive bitwise (the mid-run migration direction:
    a reference-side run continues here, MIGRATION.md)."""
    resnet = ["model=resnet20", "model.width=4", "data.size=32",
              "data.path=/tmp/__none__", "data.batch_size=16",
              "hyp.sub_batch=16", "seed=0", "data.augmentations_train="]
    out = _run("train_with_gradient_descent.py", resnet + [
        "name=imp_src", "hyp=fb1", "hyp.steps=2", "hyp.warmup=0",
        "impl.checkpoint.name=imp_src.ckpt"], tmp_path)
    assert "Job finished" in out

    out = _run("tools/export_reference_checkpoint.py", resnet + [
        "name=imp_exp", "hyp=fb1", "hyp.steps=2", "hyp.warmup=0",
        "impl.checkpoint.name=imp_src.ckpt", "+out=export/imp.pth"], tmp_path)
    assert "Exported" in out

    out = _run("tools/import_reference_checkpoint.py", resnet + [
        "name=imp_run", "hyp=fb1", "hyp.steps=2", "hyp.warmup=0",
        "impl.checkpoint.name=imp_back.ckpt", "+in=export/imp.pth"], tmp_path)
    assert "Imported" in out

    # the original and round-tripped msgpack checkpoints agree bitwise on
    # params + momentum + step (msgpack layout is template-driven, so equal
    # trees serialize identically except for ema copies; compare restored)
    from flax import serialization

    a = serialization.msgpack_restore(
        (tmp_path / "checkpoints" / "imp_src.ckpt").read_bytes())
    b = serialization.msgpack_restore(
        (tmp_path / "checkpoints" / "imp_back.ckpt").read_bytes())
    assert int(a["step"]) == int(b["step"]) == 2

    import numpy as np

    def flat(d, prefix=""):
        for k, v in sorted(d.items()):
            if isinstance(v, dict):
                yield from flat(v, f"{prefix}{k}/")
            else:
                yield f"{prefix}{k}", v

    for key_tag in ("params", "batch_stats", "opt_state"):
        fa, fb = dict(flat(a[key_tag])), dict(flat(b[key_tag]))
        assert fa.keys() == fb.keys()
        for k in fa:
            np.testing.assert_array_equal(fa[k], fb[k],
                                          err_msg=f"{key_tag}/{k}")

    # and the resumed checkpoint trains on: steps 3-4 from the import
    out = _run("train_with_gradient_descent.py", resnet + [
        "name=imp_resume", "hyp=fb1", "hyp.steps=4", "hyp.warmup=0",
        "impl.checkpoint.name=imp_back.ckpt"], tmp_path)
    assert "Continuing from step 2" in out and "Job finished" in out
