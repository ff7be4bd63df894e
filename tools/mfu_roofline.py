#!/usr/bin/env python
"""Fwd+bwd per-conv roofline + MXU control experiments (VERDICT r2 item 1).

For every convolution in the flagship ResNet-18/CIFAR workload this measures,
on the real chip:

  fwd          y  = conv(x, w)
  bwd-input    dx = vjp wrt x           (same flop count as fwd)
  bwd-filter   dw = vjp wrt w           (same flop count as fwd)
  gemm-equiv   the im2col-shaped matmul (M=B*Ho*Wo, K=kh*kw*Cin, N=Cout)
               - if XLA's GEMM at the exact contraction shape hits the same
               %-of-peak as the conv emitter, the ceiling is the MXU tile
               geometry at these channel widths, not the conv lowering.

Timing: >=50 iterations amortized inside ONE jitted fori_loop (the axon
tunnel adds ~28 ms dispatch+pull per call); the loop carry perturbs the
input by a runtime epsilon so XLA cannot hoist the op out of the loop; the
full output is reduced to an f32 scalar so nothing is sliced away. min of
several calls.

Usage: python tools/mfu_roofline.py [--trips 50] [--batch 2048]
Writes a markdown table to stdout and JSON to tools/mfu_roofline.json.
"""

import argparse
import functools
import json
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

# (name, H(=W), Cin, Cout, kernel, stride, count_in_net)
RESNET18_CONVS = [
    ("stem 3x3 3->64", 32, 3, 64, 3, 1, 1),
    ("L1 3x3 64->64", 32, 64, 64, 3, 1, 4),
    ("L2d 3x3 64->128 s2", 32, 64, 128, 3, 2, 1),
    ("L2 3x3 128->128", 16, 128, 128, 3, 1, 3),
    ("L3d 3x3 128->256 s2", 16, 128, 256, 3, 2, 1),
    ("L3 3x3 256->256", 8, 256, 256, 3, 1, 3),
    ("L4d 3x3 256->512 s2", 8, 256, 512, 3, 2, 1),
    ("L4 3x3 512->512", 4, 512, 512, 3, 1, 3),
    ("sc 1x1 64->128 s2", 32, 64, 128, 1, 2, 1),
    ("sc 1x1 128->256 s2", 16, 128, 256, 1, 2, 1),
    ("sc 1x1 256->512 s2", 8, 256, 512, 1, 2, 1),
]


def conv_fn(x, w, stride):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=[(1, 1), (1, 1)] if w.shape[0] == 3 else [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype)


def timed(fn, *args, trips, reps=3):
    """min seconds per iteration of fn amortized over `trips` in-loop runs."""
    jfn = jax.jit(functools.partial(fn, trips=trips))
    out = jfn(*args)
    jax.device_get(out)  # warmup + compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.device_get(jfn(*args))
        best = min(best, (time.perf_counter() - t0) / trips)
    return best


def loop(body, x, trips):
    """fori_loop that defeats hoisting: input depends on the carry."""
    def step(i, acc):
        eps = (acc * 0 + i).astype(x.dtype) * jnp.asarray(1e-30, x.dtype)
        return acc + body(x * (1 + eps)).astype(jnp.float32).sum()
    return jax.lax.fori_loop(0, trips, step, jnp.zeros((), jnp.float32))


def bench_conv(H, Cin, Cout, k, stride, batch, dtype, trips):
    key = jax.random.key(0)
    x = jax.random.normal(key, (batch, H, H, Cin), dtype)
    w = jax.random.normal(key, (k, k, Cin, Cout), dtype) * 0.05
    Ho = H // stride
    flops = 2 * batch * Ho * Ho * k * k * Cin * Cout

    dy = jax.random.normal(key, (batch, Ho, Ho, Cout), dtype) * 0.05

    def fwd(x_, trips):
        return loop(lambda xi: conv_fn(xi, w, stride), x_, trips)

    # Conv is linear in each operand: linear_transpose gives the PURE
    # backward op (no forward recompute polluting the timing); the loop
    # perturbs the cotangent. x must be an explicit argument — a closed-over
    # device array is baked into the jaxpr as a constant, and the axon
    # tunnel rejects compile requests that large (HTTP 413).
    def bwd_input(dy_, x_, trips):
        t = jax.linear_transpose(lambda xx: conv_fn(xx, w, stride), x_)
        return loop(lambda dyi: t(dyi)[0], dy_, trips)

    def bwd_filter(dy_, x_, trips):
        t = jax.linear_transpose(lambda ww: conv_fn(x_, ww, stride), w)
        return loop(lambda dyi: t(dyi)[0], dy_, trips)

    # gemm operand: same contraction shape as the conv's implicit GEMM
    M = batch * Ho * Ho
    wg = jax.random.normal(key, (k * k * Cin, Cout), dtype) * 0.05
    xg = jax.random.normal(key, (M, k * k * Cin), dtype)
    gemm_flops = 2 * M * (k * k * Cin) * Cout

    def gemm_fn(a_, trips):
        return loop(lambda ai: jnp.dot(ai, wg, preferred_element_type=jnp.float32),
                    a_, trips)

    out = {}
    for tag, fn, fl, args_ in (("fwd", fwd, flops, (x,)),
                               ("bwd_input", bwd_input, flops, (dy, x)),
                               ("bwd_filter", bwd_filter, flops, (dy, x)),
                               ("gemm", gemm_fn, gemm_flops, (xg,))):
        if tag == "bwd_input" and Cin == 3:
            continue  # stem input grads are never computed in training
        secs = timed(fn, *args_, trips=trips)
        out[tag] = {"ms": secs * 1e3, "tfs": fl / secs / 1e12}
    return out, flops


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trips", type=int, default=50)
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()
    dtype = jnp.dtype(args.dtype)

    dev = jax.devices()[0]
    peak = {"TPU v5 lite": 197.0, "TPU v4": 275.0, "TPU v5p": 459.0,
            "TPU v6e": 918.0}.get(dev.device_kind, float("nan"))
    print(f"device: {dev.device_kind}, bf16 peak {peak} TF/s, "
          f"batch {args.batch}, {args.dtype}, trips {args.trips}\n")

    header = ("| conv | fwd ms | fwd TF/s (%pk) | bwd-in TF/s (%pk) | "
              "bwd-filt TF/s (%pk) | GEMM TF/s (%pk) |")
    print(header)
    print("|" + "---|" * 6)
    rows = []
    tot = {k: [0.0, 0.0] for k in ("fwd", "bwd_input", "bwd_filter")}
    for (name, H, Cin, Cout, k, stride, count) in RESNET18_CONVS:
        res, flops = bench_conv(H, Cin, Cout, k, stride, args.batch, dtype,
                                args.trips)
        cells = [name, f"{res['fwd']['ms']:.2f}"]
        for tag in ("fwd", "bwd_input", "bwd_filter", "gemm"):
            if tag in res:
                tfs = res[tag]["tfs"]
                cells.append(f"{tfs:.1f} ({100 * tfs / peak:.0f}%)")
                if tag in tot:
                    tot[tag][0] += count * res[tag]["ms"] / 1e3
                    tot[tag][1] += count * flops
            else:
                cells.append("n/a")
        print("| " + " | ".join(cells) + " |")
        rows.append({"conv": name, "count": count, "flops": flops, **res})

    total_time = sum(v[0] for v in tot.values())
    total_flops = sum(v[1] for v in tot.values())
    print(f"\nweighted totals (per network pass, batch {args.batch}):")
    for tag, (t, f) in tot.items():
        print(f"  {tag:10s}: {t * 1e3:7.1f} ms  {f / t / 1e12:6.1f} TF/s "
              f"({100 * f / t / 1e12 / peak:.0f}% peak)")
    print(f"  {'fwd+bwd':10s}: {total_time * 1e3:7.1f} ms  "
          f"{total_flops / total_time / 1e12:6.1f} TF/s "
          f"({100 * total_flops / total_time / 1e12 / peak:.0f}% peak)")

    out = {"device": dev.device_kind, "peak_tfs": peak, "batch": args.batch,
           "dtype": args.dtype, "rows": rows,
           "totals": {k: {"s": v[0], "flops": v[1]} for k, v in tot.items()}}
    Path(__file__).with_suffix(".json").write_text(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
