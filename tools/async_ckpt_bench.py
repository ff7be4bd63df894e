#!/usr/bin/env python
"""Async- vs sync-checkpoint step-time overhead on real hardware.

The reference blocks on torch.save every save interval
(/root/reference/fullbatch/training/training.py:330-335). This repo's
``impl.checkpoint.async_save`` moves the host pull + msgpack serialization +
atomic write onto a background thread against a donation-safe on-device
snapshot (training/utils.py). This tool measures what that buys on the chip:
the same training run with a checkpoint EVERY step, sync vs async, reporting
wall-clock seconds per optimizer step (total loop wall over steps; a warmup
run populates the persistent XLA compile cache — wired via system_startup —
and is excluded, then no-checkpoint / sync / async runs are timed warm).

Usage:  python tools/async_ckpt_bench.py [--steps 8] [--size 50000]
        [--batch 2048] [--cpu]
Writes tools/async_ckpt_bench.json and prints one JSON line.
"""

import argparse
import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def run_once(overrides, tag):
    """One full train() with its own checkpoint dir; returns wall seconds."""
    import jax

    from fullbatchtraining_tpu.config import load_config
    from fullbatchtraining_tpu.data import construct_databundle
    from fullbatchtraining_tpu.models import construct_model
    from fullbatchtraining_tpu.training.training import train
    from fullbatchtraining_tpu.utils import system_startup

    cfg = load_config(REPO / "config", overrides=overrides)
    # system_startup (not bare make_mesh) so impl.compilation_cache is wired
    # up — without it every run_once pays the full cold XLA compile and the
    # sync/async delta drowns in compile noise.
    mesh = system_startup(cfg)
    bundle = construct_databundle(cfg.data, cfg.impl, cfg.hyp, seed=0)
    model = construct_model(cfg.model, bundle.channels, bundle.classes)
    start = time.perf_counter()
    state, stats = train(model, bundle, mesh, cfg)
    jax.block_until_ready(jax.tree.leaves(state.params)[0])
    wall = time.perf_counter() - start
    return wall, len(stats["train_time"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--size", type=int, default=50_000)
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--model", default="resnet18")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    workdir = Path(tempfile.mkdtemp(prefix="async_ckpt_bench_"))
    base = [
        f"model={args.model}", "hyp=fb1", "hyp.warmup=0",
        f"hyp.steps={args.steps}",
        f"data.size={args.size}", "data.path=/tmp/__bench_nodata__",
        f"data.batch_size={args.batch}", f"hyp.sub_batch={args.batch}",
        "impl.mixed_precision=True", "impl.validate_every_nth_step=1000",
        "seed=0", "name=async_ckpt_bench",
    ]

    results = {}
    # warmup populates the persistent compile cache for these exact shapes
    # and is NOT reported; the three timed runs after it (no-checkpoint
    # baseline, sync, async) pay only cache-hit compiles
    for tag, extra in (
        ("warmup", []),
        ("nockpt", []),
        ("sync", [f"impl.checkpoint.name={workdir}/sync.ckpt",
                  "impl.checkpoint.save_every_nth_step=1",
                  "impl.checkpoint.async_save=False"]),
        ("async", [f"impl.checkpoint.name={workdir}/async.ckpt",
                   "impl.checkpoint.save_every_nth_step=1",
                   "impl.checkpoint.async_save=True"]),
    ):
        wall, steps = run_once(base + extra, tag)
        results[tag] = {"wall_s": round(wall, 3),
                        "s_per_step": round(wall / steps, 3), "steps": steps}
        print(f"# {tag}: {wall:.2f}s total, {wall / steps:.3f}s/step",
              file=sys.stderr)

    ckpt_bytes = (workdir / "sync.ckpt").stat().st_size
    # sanity: async final checkpoint byte-identical to sync (same final state)
    identical = (workdir / "sync.ckpt").read_bytes() == (
        workdir / "async.ckpt").read_bytes()
    shutil.rmtree(workdir, ignore_errors=True)

    out = {
        "metric": "checkpoint-every-step overhead, sync vs async",
        "sync_s_per_step": results["sync"]["s_per_step"],
        "async_s_per_step": results["async"]["s_per_step"],
        "nockpt_s_per_step": results["nockpt"]["s_per_step"],
        "ckpt_mb": round(ckpt_bytes / 1e6, 1),
        "final_ckpt_identical": identical,
        "steps": args.steps,
    }
    (REPO / "tools" / "async_ckpt_bench.json").write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
