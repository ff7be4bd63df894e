#!/usr/bin/env python
"""Isolate the device-shuffle gather cost on the chip.

hyp.shuffle=True re-permutes the HBM-resident epoch every optimizer step
via one jitted gather+reshape (training.py:_make_device_stager). This tool
times that staging program alone at the flagship CIFAR shape, so its cost
can be stated as a fraction of the 1.55 s full-batch step (VALIDATION.md)
and compared against the HBM-bandwidth floor (read + write ~150 MB of
uint8 images).

Usage: python tools/shuffle_bench.py
"""

import json
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
import sys

sys.path.insert(0, str(ROOT))


def main():
    import jax
    import numpy as np

    from fullbatchtraining_tpu.config import load_config
    from fullbatchtraining_tpu.data import construct_databundle
    from fullbatchtraining_tpu.models import construct_model, initialize_model
    from fullbatchtraining_tpu.parallel.mesh import make_mesh
    from fullbatchtraining_tpu.training.training import (
        _epoch_order, _make_device_stager, make_train_functions)

    cfg = load_config(ROOT / "config", overrides=[
        "hyp=fb1", "hyp.warmup=0", "hyp.shuffle=True",
        "data.size=50_000", "data.path=/tmp/__bench_nodata__",
        "data.batch_size=2048", "hyp.sub_batch=2048",
        "impl.mixed_precision=True", "seed=0",
    ])
    mesh = make_mesh(cfg.impl.setup)
    bundle = construct_databundle(cfg.data, cfg.impl, cfg.hyp, seed=0)
    model = construct_model(cfg.model, bundle.channels, bundle.classes)
    fns = make_train_functions(model, bundle, mesh, cfg)
    images, labels = bundle.train.images, bundle.train.labels
    stage = _make_device_stager(images, labels, fns, mesh)

    # warm up (compile) then time: order upload + gather + reshape + layout
    order = _epoch_order(cfg, 0, len(images))
    im, lb = stage(order)
    jax.block_until_ready((im, lb))
    times = []
    for step in range(1, 6):
        order = _epoch_order(cfg, step, len(images))
        t0 = time.perf_counter()
        im, lb = stage(order)
        jax.block_until_ready((im, lb))
        times.append(time.perf_counter() - t0)

    epoch_bytes = int(np.prod(im.shape)) * im.dtype.itemsize
    best = min(times)
    result = {
        "stage_time_s": round(best, 5),
        "all_times_s": [round(t, 5) for t in times],
        "epoch_bytes": epoch_bytes,
        "eff_gbps": round(2 * epoch_bytes / best / 1e9, 1),
        "pct_of_1p55s_step": round(100 * best / 1.55, 2),
        "platform": jax.devices()[0].platform,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
