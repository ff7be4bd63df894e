#!/usr/bin/env python
"""Model-zoo hardware sweep: one full-batch CIFAR-10 optimizer step per
family on the chip (bf16 compute, fp32 accumulation, batch 1024).

Usage: python tools/zoo_bench.py [--models resnet18 vgg16 ...]
"""

import argparse
import json
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
import sys

sys.path.insert(0, str(ROOT))

DEFAULT = ["resnet18", "resnet50", "vgg16", "densenet121", "pyramidnet110",
           "nfn", "linear"]


def run_model(name: str, batch: int = 1024):
    import jax

    from fullbatchtraining_tpu.config import load_config
    from fullbatchtraining_tpu.data import construct_databundle
    from fullbatchtraining_tpu.models import construct_model, initialize_model
    from fullbatchtraining_tpu.parallel.mesh import make_mesh
    from fullbatchtraining_tpu.training.training import make_train_functions, stage_epoch

    cfg = load_config(ROOT / "config", overrides=[
        f"model={name}", "hyp=fb1", "hyp.warmup=0",
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
    state, m = fns.full_step(state, images, labels)
    jax.device_get(m["train_loss"])
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        state, m = fns.full_step(state, images, labels)
        jax.device_get(m["train_loss"])
        times.append(time.perf_counter() - t0)
    n_params = sum(int(p.size) for p in jax.tree.leaves(state.params))
    return {"model": name, "step_time_s": min(times),
            "img_per_s": 50_000 / min(times), "params": n_params,
            "loss": float(m["train_loss"])}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", nargs="+", default=DEFAULT)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--out", default=None,
                    help="JSON output path; the committed tools/zoo_bench.json"
                         " is only overwritten when passed explicitly")
    args = ap.parse_args()
    rows = []
    print("| model | params | step time | img/s |")
    print("|---|---|---|---|")
    for name in args.models:
        try:
            r = run_model(name, args.batch)
        except Exception as err:  # keep sweeping; report the failure
            print(f"| {name} | FAILED: {err} | | |", flush=True)
            continue
        rows.append(r)
        print(f"| {r['model']} | {r['params'] / 1e6:.1f}M "
              f"| {r['step_time_s']:.2f} s | {r['img_per_s']:,.0f} |",
              flush=True)
    if args.out:
        Path(args.out).write_text(json.dumps(rows, indent=1))
    else:
        print(json.dumps(rows, indent=1))


if __name__ == "__main__":
    main()
