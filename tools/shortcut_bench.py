#!/usr/bin/env python
"""Alternative lowerings for the stride-2 convs (the worst %-peak ops).

The round-3 roofline (tools/mfu_roofline.py) shows the stride-2 ops are the
least efficient in the flagship network: the 1x1 shortcut projections run at
7-9% of bf16 peak and the 3x3 downsample convs at 38-43%, vs 53-60% for the
stride-1 body convs. Both are XLA conv-emitter artifacts of the strided
window, not MXU limits, so this tool races mathematically identical
reformulations on the chip:

  1x1 stride-2  : A) lax.conv stride 2 (status quo)
                  B) strided slice x[:, ::2, ::2, :] then a plain dot over C
  3x3 stride-2  : A) lax.conv stride 2 (status quo)
                  B) phase decomposition - split x into its 4 stride-2 phases
                     and the 3x3 kernel into the 4 sub-kernels that touch each
                     phase (2x2 / 2x1 / 1x2 / 1x1 taps); sum four stride-1
                     convs. Same flops, same math, no strided window.

Each direction (fwd, bwd-input, bwd-filter) is timed separately via
jax.linear_transpose with the same hoist-defeating fori_loop harness as
tools/mfu_roofline.py. Numerics are checked against the lax conv first.

Usage: python tools/shortcut_bench.py [--trips 50] [--batch 2048]
Writes JSON to tools/shortcut_bench.json.
"""

import argparse
import functools
import json
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

# (name, H(=W), Cin, Cout, kernel)   all stride 2
SHAPES = [
    ("sc 1x1 64->128", 32, 64, 128, 1),
    ("sc 1x1 128->256", 16, 128, 256, 1),
    ("sc 1x1 256->512", 8, 256, 512, 1),
    ("L2d 3x3 64->128", 32, 64, 128, 3),
    ("L3d 3x3 128->256", 16, 128, 256, 3),
    ("L4d 3x3 256->512", 8, 256, 512, 3),
]


def conv_ref(x, w):
    k = w.shape[0]
    pad = [(1, 1), (1, 1)] if k == 3 else [(0, 0), (0, 0)]
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(2, 2), padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype)


def conv_slice_dot(x, w):
    """1x1 stride-2 == pick every other pixel, then a channel matmul."""
    xs = x[:, ::2, ::2, :]
    return jnp.einsum("nhwc,co->nhwo", xs, w[0, 0],
                      preferred_element_type=x.dtype)


def conv_phase(x, w):
    """3x3 stride-2 SAME-padded conv as 4 stride-1 phase convs.

    y[n,i,j,o] = sum_{a,b in 0..2} x[n, 2i+a-1, 2j+b-1, c] w[a,b,c,o].
    Row index 2i+a-1 is even iff a is odd: taps a=1 read the even-row phase
    x[:, 0::2] (offset 0, i.e. rows 2i), taps a in {0,2} read the odd-row
    phase x[:, 1::2] (rows 2i-1 and 2i+1 = odd phase at positions i-1, i).
    Same for columns. Each (row-phase, col-phase) pair is a stride-1 conv of
    that phase with the matching sub-kernel and its own SAME-style padding.
    """
    xe_e = x[:, 0::2, 0::2, :]   # (rows 2i,   cols 2j)   taps a=1,b=1 -> 1x1
    xe_o = x[:, 0::2, 1::2, :]   # (rows 2i,   cols 2j+1) taps a=1,b in {0,2} -> 1x2
    xo_e = x[:, 1::2, 0::2, :]   # (rows 2i+1, cols 2j)   taps a in {0,2},b=1 -> 2x1
    xo_o = x[:, 1::2, 1::2, :]   # both odd                taps a,b in {0,2} -> 2x2

    def c(xp, wp, pad_h, pad_w):
        return jax.lax.conv_general_dilated(
            xp, wp, window_strides=(1, 1), padding=[pad_h, pad_w],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=x.dtype)

    # odd-phase taps: position i-1 (a=0) and i (a=2) -> kernel [w0, w2] over
    # the odd phase, needing one leading pad element (x[-1] row = 0 pad).
    y = c(xe_e, w[1:2, 1:2], (0, 0), (0, 0))
    y += c(xe_o, w[1:2, 0::2], (0, 0), (1, 0))
    y += c(xo_e, w[0::2, 1:2], (1, 0), (0, 0))
    y += c(xo_o, w[0::2, 0::2], (1, 0), (1, 0))
    return y


def timed(fn, *args, trips, reps=3):
    jfn = jax.jit(functools.partial(fn, trips=trips))
    jax.device_get(jfn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.device_get(jfn(*args))
        best = min(best, (time.perf_counter() - t0) / trips)
    return best


def loop(body, x, trips):
    def step(i, acc):
        eps = (acc * 0 + i).astype(x.dtype) * jnp.asarray(1e-30, x.dtype)
        return acc + body(x * (1 + eps)).astype(jnp.float32).sum()
    return jax.lax.fori_loop(0, trips, step, jnp.zeros((), jnp.float32))


def bench_all(name, H, Cin, Cout, k, batch, dtype, trips, peak):
    key = jax.random.key(0)
    x = jax.random.normal(key, (batch, H, H, Cin), dtype)
    w = jax.random.normal(key, (k, k, Cin, Cout), dtype) * 0.05
    Ho = H // 2
    dy = jax.random.normal(key, (batch, Ho, Ho, Cout), dtype) * 0.05
    flops = 2 * batch * Ho * Ho * k * k * Cin * Cout
    alt = conv_slice_dot if k == 1 else conv_phase

    # numerics: identical math, both accumulate per-tap in the input dtype
    ref = np.asarray(jax.jit(conv_ref)(x, w), np.float32)
    got = np.asarray(jax.jit(alt)(x, w), np.float32)
    err = np.abs(ref - got).max() / max(np.abs(ref).max(), 1e-6)
    assert err < 2e-2, f"{name}: alt lowering mismatch rel={err}"

    row = {"name": name, "flops": flops, "rel_err": float(err)}
    for impl, f in (("conv", conv_ref), ("alt", alt)):
        def fwd(x_, trips, f=f):
            return loop(lambda xi: f(xi, w), x_, trips)

        def bwd_in(dy_, x_, trips, f=f):
            t = jax.linear_transpose(lambda xx: f(xx, w), x_)
            return loop(lambda d: t(d)[0], dy_, trips)

        def bwd_filt(dy_, x_, trips, f=f):
            t = jax.linear_transpose(lambda ww: f(x_, ww), w)
            return loop(lambda d: t(d)[0], dy_, trips)

        for tag, fn, args_ in (("fwd", fwd, (x,)), ("bwd_in", bwd_in, (dy, x)),
                               ("bwd_filt", bwd_filt, (dy, x))):
            secs = timed(fn, *args_, trips=trips)
            row[f"{impl}_{tag}"] = {"ms": secs * 1e3,
                                    "tfs": flops / secs / 1e12}
    tot_conv = sum(row[f"conv_{t}"]["ms"] for t in ("fwd", "bwd_in", "bwd_filt"))
    tot_alt = sum(row[f"alt_{t}"]["ms"] for t in ("fwd", "bwd_in", "bwd_filt"))
    row["speedup_fwdbwd"] = tot_conv / tot_alt
    print(f"| {name} | " + " | ".join(
        f"{row[f'conv_{t}']['tfs']:.1f} vs {row[f'alt_{t}']['tfs']:.1f}"
        for t in ("fwd", "bwd_in", "bwd_filt")) +
        f" | {row['speedup_fwdbwd']:.2f}x |")
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trips", type=int, default=50)
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()
    dtype = jnp.dtype(args.dtype)
    dev = jax.devices()[0]
    peak = {"TPU v5 lite": 197.0}.get(dev.device_kind, float("nan"))
    print(f"device: {dev.device_kind}, batch {args.batch}, {args.dtype}")
    print("| shape | fwd TF/s conv vs alt | bwd-in | bwd-filt | fwd+bwd speedup |")
    print("|---|---|---|---|---|")
    rows = [bench_all(*s, args.batch, dtype, args.trips, peak) for s in SHAPES]
    Path(__file__).with_suffix(".json").write_text(json.dumps(
        {"device": dev.device_kind, "batch": args.batch, "dtype": args.dtype,
         "rows": rows}, indent=1))


if __name__ == "__main__":
    main()
