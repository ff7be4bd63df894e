#!/usr/bin/env python
"""Width-scaling control experiment for the MFU ceiling claim (VERDICT r2).

Hypothesis under test: the flagship workload's %-of-peak is capped by the
ResNet-18/CIFAR channel widths (64-512) under-filling the MXU, not by the
step program. If so, the SAME full-batch training step at 2x/4x width must
run at a markedly higher %-of-bf16-peak.

Runs the exact bench.py workload (full 50k-image gradient accumulation step,
bf16 compute, batch 2048) at model.width 64/128/256 and reports achieved
TF/s from XLA's own cost model (cost_analysis counts the scan body once;
multiplied by the trip count).

Usage: python tools/width_scaling.py [--widths 64 128 256]
"""

import argparse
import json
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
import sys

sys.path.insert(0, str(ROOT))


def run_width(width: int, batch: int = 2048):
    import jax

    from fullbatchtraining_tpu.config import load_config
    from fullbatchtraining_tpu.data import construct_databundle
    from fullbatchtraining_tpu.models import construct_model, initialize_model
    from fullbatchtraining_tpu.parallel.mesh import make_mesh
    from fullbatchtraining_tpu.training.training import make_train_functions, stage_epoch

    cfg = load_config(ROOT / "config", overrides=[
        "model=resnet18", f"model.width={width}", "hyp=fb1", "hyp.warmup=0",
        "data.size=50_000", "data.path=/tmp/__bench_nodata__",
        f"data.batch_size={batch}", f"hyp.sub_batch={batch}",
        "impl.mixed_precision=True", "seed=0",
    ])
    mesh = make_mesh(cfg.impl.setup)
    bundle = construct_databundle(cfg.data, cfg.impl, cfg.hyp, seed=0)
    model = construct_model(cfg.model, bundle.channels, bundle.classes)
    fns = make_train_functions(model, bundle, mesh, cfg)
    variables = initialize_model(model, jax.random.key(0), bundle.pixels,
                                 bundle.channels)
    state = fns.init_state(variables)
    images, labels = stage_epoch(bundle, fns, mesh, cfg, 0, {})
    num_blocks, chunks, sub = fns.layout

    compiled = fns.full_step.lower(state, images, labels).compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    # cost_analysis counts the scan body once; multiplying the program total
    # by the trip count also scales the once-per-step optimizer/EMA flops,
    # a < 0.1% overcount at these shapes (body ~6e12 vs update ~1e9 flops).
    step_flops = float(ca["flops"]) * num_blocks * chunks

    state, metrics = compiled(state, images, labels)
    jax.device_get(metrics["train_loss"])  # warmup

    times = []
    for _ in range(4):
        t0 = time.perf_counter()
        state, metrics = compiled(state, images, labels)
        jax.device_get(metrics["train_loss"])
        times.append(time.perf_counter() - t0)
    step_time = min(times)

    peak = {"TPU v5 lite": 197.0, "TPU v4": 275.0, "TPU v5p": 459.0,
            "TPU v6e": 918.0}.get(jax.devices()[0].device_kind, float("nan"))
    tfs = step_flops / step_time / 1e12
    return {"width": width, "step_time_s": step_time, "step_flops": step_flops,
            "tfs": tfs, "pct_peak": 100 * tfs / peak,
            "img_per_s": 50000 / step_time}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--widths", type=int, nargs="+", default=[64, 128, 256])
    args = ap.parse_args()
    rows = []
    print("| width | step time | TF/s | % bf16 peak | img/s |")
    print("|---|---|---|---|---|")
    for w in args.widths:
        r = run_width(w)
        rows.append(r)
        print(f"| {r['width']} | {r['step_time_s']:.3f} s | {r['tfs']:.1f} "
              f"| {r['pct_peak']:.1f}% | {r['img_per_s']:,.0f} |")
    Path(__file__).with_suffix(".json").write_text(json.dumps(rows, indent=1))


if __name__ == "__main__":
    main()
