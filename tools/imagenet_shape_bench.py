#!/usr/bin/env python
"""ImageNet-shape (224x224, 1000 classes) hardware evidence on the real chip.

Covers BASELINE.json configs[4] ("ResNet-50 ImageNet-scale full-batch ... +
vmapped loss-landscape crunch") at the shapes the reference runs through its
DataLoader (/root/reference/config/data/ImageNet.yaml):

  step      N synthetic 224^2 images, streamed full-batch optimizer steps
            (bf16 compute, fp32 accumulation), timed; the epoch upload is
            timed separately and the jitted per-chunk gradient program's
            XLA cost_analysis FLOPs attribute compute vs tunnel.
  eval      streamed validation staging at the same shape.
  surface   a streamed 1D loss-landscape slice (vmapped positions), the
            any-scale crunch of round 4.
  analysis  the streamed per-chunk gradient SNR / noise-scale sweep.

Usage: python tools/imagenet_shape_bench.py [--model resnet50] [--size 4096]
           [--batch 512] [--sub 32] [--budget-mb 256] [--skip surface ...]
Writes markdown to stdout and JSON to tools/imagenet_shape_bench.json.
"""

import argparse
import json
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
import sys

sys.path.insert(0, str(ROOT))


def build(args, extra=()):
    extra = (*extra, *args.override)
    import jax

    from fullbatchtraining_tpu.config import load_config
    from fullbatchtraining_tpu.data import construct_databundle
    from fullbatchtraining_tpu.models import construct_model, initialize_model
    from fullbatchtraining_tpu.parallel.mesh import make_mesh
    from fullbatchtraining_tpu.training.training import make_train_functions

    cfg = load_config(ROOT / "config", overrides=[
        f"model={args.model}", "hyp=fb1", "hyp.warmup=0", "data=ImageNet",
        "data.path=/tmp/__imagenet_shape_nodata__", f"data.size={args.size}",
        f"data.batch_size={args.batch}", f"hyp.sub_batch={args.sub}",
        "impl.mixed_precision=True", "seed=0",
        f"impl.hbm_epoch_max_bytes={args.budget_mb * 2**20}",
        # grouping vmaps chunks together: at 224^2 that multiplies activation
        # memory by the group, so keep one chunk per scan step
        "impl.block_grouping=1", *extra,
    ])
    mesh = make_mesh(cfg.impl.setup)
    bundle = construct_databundle(cfg.data, cfg.impl, cfg.hyp, seed=0)
    model = construct_model(cfg.model, bundle.channels, bundle.classes)
    fns = make_train_functions(model, bundle, mesh, cfg)
    variables = initialize_model(model, jax.random.key(0), bundle.pixels,
                                 bundle.channels)
    state = fns.init_state(variables)
    return cfg, mesh, bundle, model, fns, state


def chunk_grad_flops(model, bundle, cfg, sub):
    """XLA cost_analysis FLOPs of one jitted per-chunk value_and_grad at the
    step's exact chunk geometry (bf16 compute, train-mode BN)."""
    import jax
    import jax.numpy as jnp

    from fullbatchtraining_tpu.models import initialize_model
    from fullbatchtraining_tpu.models.modules import get_loss_fn

    variables = initialize_model(model, jax.random.key(0), bundle.pixels,
                                 bundle.channels)
    criterion = get_loss_fn(cfg.hyp, bundle.batch_size)

    def chunk_loss(params, batch_stats, images, labels):
        x = images.astype(jnp.bfloat16)
        p = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
        logits, _ = model.apply({"params": p, "batch_stats": batch_stats}, x,
                                train=True, mutable=["batch_stats"])
        return criterion(logits.astype(jnp.float32), labels)

    lowered = jax.jit(jax.value_and_grad(chunk_loss)).lower(
        variables["params"], variables.get("batch_stats", {}),
        jnp.zeros((sub, bundle.pixels, bundle.pixels, bundle.channels),
                  jnp.float32),
        jnp.zeros((sub,), jnp.int32))
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    return float(cost.get("flops", 0.0))


def bench_step(args, out):
    import jax
    import numpy as np

    from fullbatchtraining_tpu.data.pipeline import layout_epoch
    from fullbatchtraining_tpu.parallel.mesh import stream_segments
    from fullbatchtraining_tpu.training.training import stage_epoch

    cfg, mesh, bundle, model, fns, state = build(args)
    assert fns.streamed, "epoch must exceed the forced HBM budget"
    num_blocks, chunks, sub = fns.layout
    images, labels = stage_epoch(bundle, fns, mesh, cfg, 0, {})

    state, m = fns.full_step(state, images, labels)  # compile + warmup
    jax.device_get(m["train_loss"])
    times = []
    for _ in range(args.trips):
        t0 = time.perf_counter()
        state, m = fns.full_step(state, images, labels)
        jax.device_get(m["train_loss"])
        times.append(time.perf_counter() - t0)
    step_s = min(times)

    # upload-only: stream every segment to the device and block
    from fullbatchtraining_tpu.data.pipeline import stream_plan
    per_item = images.dtype.itemsize * int(np.prod(images.shape[4:]))
    _, seg_blocks, _ = stream_plan(num_blocks, chunks, sub, fns.num_devices,
                                   per_item, cfg.impl)
    t0 = time.perf_counter()
    for dimgs, dlbls, _ in stream_segments(mesh, images, labels, seg_blocks):
        jax.block_until_ready(dimgs)
    upload_s = time.perf_counter() - t0

    flops_chunk = chunk_grad_flops(model, bundle, cfg, sub)
    total_flops = flops_chunk * num_blocks * chunks * fns.num_devices
    datapoints = num_blocks * chunks * sub * fns.num_devices

    dev = jax.devices()[0].device_kind
    out["step"] = {
        "device": dev, "model": args.model, "size": args.size,
        "layout": [num_blocks, chunks, sub], "step_s": step_s,
        "upload_s": upload_s, "img_per_s": datapoints / step_s,
        "epoch_mb": datapoints * 224 * 224 * 3 / 2**20,
        "grad_flops_total": total_flops,
        "compute_tf_per_s": total_flops / step_s / 1e12,
        "compute_bound_fraction": None,  # filled below
        "loss": float(jax.device_get(m["train_loss"])),
    }
    # attribute: if the pure upload already accounts for most of the step,
    # the step is tunnel-bound and the compute rides behind the prefetch
    out["step"]["compute_bound_fraction"] = max(
        0.0, 1.0 - upload_s / step_s) if step_s > 0 else None
    print(f"| step | {args.model} {args.size}x224^2 | {step_s:.2f} s "
          f"({datapoints / step_s:,.0f} img/s) | upload alone {upload_s:.2f} s "
          f"| {total_flops / 1e12:.1f} TFLOP -> {total_flops / step_s / 1e12:.1f} TF/s eff |")

    return cfg, mesh, bundle, model, fns, state


def bench_eval(args, out, built=None):
    """Streamed eval at the same shape, independent of the step benchmark.

    (The CIFAR stem at 224^2 needs a 12 GB single activation at eval block
    512 - nobody runs that; pass --override model.stem=standard.)"""
    import jax
    import numpy as np

    from fullbatchtraining_tpu.training.training import stage_validation

    cfg, mesh, bundle, model, fns, state = built or build(args)
    val = stage_validation(bundle, mesh, fns.num_devices, bundle.batch_size,
                           cfg_impl=cfg.impl)
    t0 = time.perf_counter()
    vm = jax.device_get(fns.eval_step(state.params, state.batch_stats, *val))
    eval_s = time.perf_counter() - t0
    out["eval"] = {"streamed": bool(isinstance(val[0], np.ndarray)),
                   "eval_s": eval_s, "valid_loss": float(vm["valid_loss"]),
                   "valid_acc": float(vm["valid_acc"])}
    print(f"| eval | streamed={out['eval']['streamed']} | {eval_s:.2f} s | "
          f"loss {vm['valid_loss']:.3f} |")


def bench_surface(args, out):
    import jax

    from fullbatchtraining_tpu.visualization.crunch import crunch

    pos = args.surface_positions
    cfg, mesh, bundle, model, fns, state = build(args, extra=[
        "viz=1d", f"viz.coordinates.x.num={pos}", f"viz.vmap_positions={pos}",
        "impl.checkpoint.name=imagenet_shape_surface",
        "viz.rebuild_existing_database=True"])
    cfg.original_cwd = "/tmp/__imagenet_shape_surface__"
    Path(cfg.original_cwd).mkdir(exist_ok=True)
    t0 = time.perf_counter()
    store, positions = crunch(model, bundle, mesh, cfg, fns, state)
    surf_s = time.perf_counter() - t0
    rows = store.results()
    losses = [rows[store._key(p)]["train_loss"] for p in positions]
    out["surface"] = {"positions": len(positions), "total_s": surf_s,
                      "losses": losses}
    print(f"| surface | {len(positions)} streamed 1D positions (vmapped) | "
          f"{surf_s:.1f} s total | losses {['%.3f' % l for l in losses]} |")


def bench_analysis(args, out):
    import jax
    from collections import defaultdict

    from fullbatchtraining_tpu.analysis.analysis import analyze

    cfg, mesh, bundle, model, fns, state = build(args, extra=[
        "analysis=full", "analysis.compute_gradient_SNR=True",
        "analysis.compute_gradient_noise_scale=True",
        "analysis.record_gradient_norm_per_batch=False",
        "analysis.measure_grad_norm=False", "analysis.check_momentum=False",
        f"analysis.internal_batch_size_chunks={args.batch // args.sub}"])
    t0 = time.perf_counter()
    stats = analyze(model, bundle, mesh, cfg, fns, state, defaultdict(list))
    ana_s = time.perf_counter() - t0
    out["analysis"] = {"total_s": ana_s,
                       "grad_SNR": stats["analysis_grad_SNR"][-1],
                       "noise_scale": stats["analysis_grad_noise_scale"][-1]}
    print(f"| analysis | streamed SNR sweep | {ana_s:.1f} s | "
          f"SNR {out['analysis']['grad_SNR']:.4f} | noise scale "
          f"{out['analysis']['noise_scale']:.1f} |")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="resnet50")
    ap.add_argument("--size", type=int, default=4096)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--sub", type=int, default=32)
    ap.add_argument("--budget-mb", type=int, default=256)
    ap.add_argument("--trips", type=int, default=3)
    ap.add_argument("--surface-positions", type=int, default=3)
    ap.add_argument("--skip", nargs="*", default=[],
                    choices=["step", "eval", "surface", "analysis"])
    ap.add_argument("--override", nargs="*", default=[],
                    help="extra config overrides, e.g. model.stem=standard "
                         "(the reference model configs default to the CIFAR "
                         "stem; at 224^2 that is a 64x flop blowup nobody "
                         "runs on ImageNet)")
    ap.add_argument("--tag", default="",
                    help="suffix for the output JSON filename")
    args = ap.parse_args()

    out = {"args": vars(args)}
    built = None
    if "step" not in args.skip:
        built = bench_step(args, out)
    if "eval" not in args.skip:
        bench_eval(args, out, built)
    if "surface" not in args.skip:
        bench_surface(args, out)
    if "analysis" not in args.skip:
        bench_analysis(args, out)
    suffix = f"_{args.tag}.json" if args.tag else ".json"
    Path(__file__).with_suffix("").with_name(
        Path(__file__).stem + suffix).write_text(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
