#!/usr/bin/env python
"""Space-to-depth stem rewrite + bwd-filter rivals (VERDICT r3 item 6).

The round-3 roofline leaves two low-utilization residues in the flagship
ResNet-18/CIFAR step: the stem conv (3x3 3->64 s1) at 4-5% of bf16 peak in
both directions, and the L1 bwd-filter (3x3 64->64) at 36% vs 53% fwd. This
tool races measured attacks on both, on the real chip:

stem: an EXACT algebraic rewrite. space-to-depth(2) turns the 32x32x3 input
  into 16x16x12; the stride-1 3x3 conv becomes a 3x3 conv over the block grid
  with a 3x3x12x(4*64) kernel that is a fixed sparse scatter of the original
  3x3x3x64 weights (25% dense), followed by depth-to-space back to 32x32x64.
  Same function, same parameters, 4x the flops - but K=108,N=256 instead of
  K=27,N=64, so the MXU tiles fill. Wins if the 4x flops run >4x faster.
  Derivation: output pixel (2i+a,2j+b) reads input rows 2i+a-1..2i+a+1, which
  live in blocks i-1..i+1; writing dp=2s+u-a, dq=2t+v-b maps every original
  tap (dp,dq,c,n) to big-kernel entry [s+1,t+1,(u,v,c),(a,b,n)], everything
  else zero. SAME padding on the block grid pads whole zero blocks; the taps
  that would read the spurious extra row/column are exactly the zero entries.

bwd-filter (L1): dW = vjp_w(conv) rivals -
  A) status quo            jax.linear_transpose of the NHWC conv
  B) fp32 accumulate       same, preferred_element_type=float32
  C) manual dnums          dW as an explicit conv_general_dilated with
                           lhs=x spec "CHWN" (batch<->feature swapped),
                           rhs=dy spec "IHWO", out "NHWC" -> (Ci,kh,kw,Co);
                           the textbook grad-filter conv, stated explicitly
                           so XLA's layout assignment sees it fresh
  D) batch-split + sum     vmap the transpose over G batch groups, sum the
                           partial dW (a manual split-K giving XLA G small
                           independent reductions)

Timing uses the hoist-defeating fori_loop of tools/mfu_roofline.py, with BOTH
operands perturbed by the carry (ADVICE r3: a loop-invariant operand lets XLA
hoist its preprocessing out of the timed loop). Numerics are checked in fp32
against the direct conv before any timing. The reference has no analogue
(torch/cudnn pick algorithms internally); this probes XLA's TPU emitters.

Usage: python tools/s2d_stem_bench.py [--trips 50] [--batch 2048]
Writes markdown to stdout and JSON to tools/s2d_stem_bench.json.
"""

import argparse
import functools
import json
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


def conv_fn(x, w, stride=1, pad=1, prefer=None):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding=[(pad, pad)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=prefer or x.dtype)


def s2d_kernel(w, r=2):
    """Scatter the (3,3,C,N) stride-1 kernel into the (3,3,r*r*C,r*r*N)
    block-grid kernel. Linear in w, so autodiff/transpose flow through."""
    k, _, C, N = w.shape
    assert k == 3 and r == 2, "exact rewrite derived for 3x3 s1, block 2"
    big = jnp.zeros((3, 3, r * r * C, r * r * N), w.dtype)
    for a in range(r):
        for b in range(r):
            for dp in (-1, 0, 1):
                for dq in (-1, 0, 1):
                    s, u = divmod(a + dp, r)
                    t, v = divmod(b + dq, r)
                    big = big.at[s + 1, t + 1,
                                 (u * r + v) * C:(u * r + v + 1) * C,
                                 (a * r + b) * N:(a * r + b + 1) * N].set(w[dp + 1, dq + 1])
    return big


def s2d_conv(x, w, r=2):
    """Exact rewrite of conv_fn(x, w, stride=1, pad=1) via space-to-depth."""
    B, H, W, C = x.shape
    N = w.shape[-1]
    xb = x.reshape(B, H // r, r, W // r, r, C).transpose(0, 1, 3, 2, 4, 5)
    xb = xb.reshape(B, H // r, W // r, r * r * C)
    yb = conv_fn(xb, s2d_kernel(w, r))
    y = yb.reshape(B, H // r, W // r, r, r, N).transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(B, H, W, N)


def grad_filter_conv(x, dy, pad=1, prefer=None):
    """dW[kh,kw,ci,co] as an explicit conv: batch is the contraction, the
    128-col output spatial window is dy's spatial extent (stride-1 only)."""
    out = jax.lax.conv_general_dilated(
        x, dy, window_strides=(1, 1), padding=[(pad, pad)] * 2,
        dimension_numbers=("CHWN", "IHWO", "NHWC"),
        preferred_element_type=prefer or x.dtype)
    return out.transpose(1, 2, 0, 3)  # (Ci,kh,kw,Co) -> (kh,kw,Ci,Co)


def timed(fn, *args, trips, reps=3):
    jfn = jax.jit(functools.partial(fn, trips=trips))
    jax.device_get(jfn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.device_get(jfn(*args))
        best = min(best, (time.perf_counter() - t0) / trips)
    return best


def loop2(body, a, b, trips):
    """fori_loop perturbing BOTH operands so neither op chain hoists."""
    tiny = jnp.asarray(np.finfo(np.float32).tiny, a.dtype)

    def step(i, acc):
        eps = (acc * 0 + i).astype(a.dtype) * tiny
        return acc + body(a * (1 + eps), b * (1 + eps)).astype(jnp.float32).sum()

    return jax.lax.fori_loop(0, trips, step, jnp.zeros((), jnp.float32))


def bench_stem(args, dtype, peak, out):
    B, H, Cin, Cout = args.batch, 32, 3, 64
    key = jax.random.key(0)
    x = jax.random.normal(key, (B, H, H, Cin), dtype)
    w = jax.random.normal(key, (3, 3, Cin, Cout), dtype) * 0.05
    dy = jax.random.normal(key, (B, H, H, Cout), dtype) * 0.05
    flops = 2 * B * H * H * 9 * Cin * Cout  # algorithmic (direct) flops

    # numerics first, fp32
    xf, wf = x.astype(jnp.float32), w.astype(jnp.float32)
    ref = jax.jit(conv_fn)(xf, wf)
    got = jax.jit(s2d_conv)(xf, wf)
    err = float(jnp.max(jnp.abs(ref - got)) / jnp.max(jnp.abs(ref)))
    assert err < 1e-5, f"s2d rewrite mismatch: rel err {err}"

    def direct_fwd(x_, w_, trips):
        return loop2(lambda xi, wi: conv_fn(xi, wi), x_, w_, trips)

    def s2d_fwd(x_, w_, trips):
        return loop2(s2d_conv, x_, w_, trips)

    def direct_bwd_filter(dy_, x_, trips):
        def body(dyi, xi):
            t = jax.linear_transpose(lambda ww: conv_fn(xi, ww), w)
            return t(dyi)[0]
        return loop2(body, dy_, x_, trips)

    def s2d_bwd_filter(dy_, x_, trips):
        def body(dyi, xi):
            t = jax.linear_transpose(lambda ww: s2d_conv(xi, ww), w)
            return t(dyi)[0]
        return loop2(body, dy_, x_, trips)

    rows = {}
    for tag, fn, a_, b_ in (("direct_fwd", direct_fwd, x, w),
                            ("s2d_fwd", s2d_fwd, x, w),
                            ("direct_bwd_filter", direct_bwd_filter, dy, x),
                            ("s2d_bwd_filter", s2d_bwd_filter, dy, x)):
        secs = timed(fn, a_, b_, trips=args.trips)
        rows[tag] = {"ms": secs * 1e3, "eff_tfs": flops / secs / 1e12}
        print(f"| stem {tag:18s} | {secs * 1e3:6.3f} ms | "
              f"{flops / secs / 1e12:6.1f} TF/s effective "
              f"({100 * flops / secs / 1e12 / peak:.0f}% pk) |")
    rows["rel_err_fp32"] = err
    rows["speedup_fwd"] = rows["direct_fwd"]["ms"] / rows["s2d_fwd"]["ms"]
    rows["speedup_bwd_filter"] = (rows["direct_bwd_filter"]["ms"]
                                  / rows["s2d_bwd_filter"]["ms"])
    print(f"| stem speedup | fwd {rows['speedup_fwd']:.2f}x | "
          f"bwd-filter {rows['speedup_bwd_filter']:.2f}x |")
    out["stem"] = rows


def bench_bwd_filter(args, dtype, peak, out):
    B, H, C = args.batch, 32, 64
    key = jax.random.key(0)
    x = jax.random.normal(key, (B, H, H, C), dtype)
    w = jax.random.normal(key, (3, 3, C, C), dtype) * 0.05
    dy = jax.random.normal(key, (B, H, H, C), dtype) * 0.05
    flops = 2 * B * H * H * 9 * C * C

    # numerics: all rivals vs the fp32 transpose
    xf, dyf = x.astype(jnp.float32), dy.astype(jnp.float32)
    ref = jax.jit(lambda xx, dd: jax.linear_transpose(
        lambda ww: conv_fn(xx, ww), w.astype(jnp.float32))(dd)[0])(xf, dyf)
    got = jax.jit(grad_filter_conv)(xf, dyf)
    err = float(jnp.max(jnp.abs(ref - got)) / jnp.max(jnp.abs(ref)))
    assert err < 1e-5, f"manual grad-filter conv mismatch: rel err {err}"

    def status_quo(dy_, x_, trips):
        def body(dyi, xi):
            return jax.linear_transpose(lambda ww: conv_fn(xi, ww), w)(dyi)[0]
        return loop2(body, dy_, x_, trips)

    def fp32_acc(dy_, x_, trips):
        # bf16 operands, fp32 MXU accumulation surfaced to the output: the
        # manual grad-filter conv with preferred_element_type=float32
        def body(dyi, xi):
            return grad_filter_conv(xi, dyi, prefer=jnp.float32)
        return loop2(body, dy_, x_, trips)

    def manual_dnums(dy_, x_, trips):
        return loop2(grad_filter_conv, x_, dy_, trips)

    def batch_split(dy_, x_, trips, G=8):
        def body(dyi, xi):
            xs = xi.reshape(G, B // G, H, H, C)
            dys = dyi.reshape(G, B // G, H, H, C)
            parts = jax.vmap(grad_filter_conv)(xs, dys)
            return parts.sum(0)
        return loop2(body, dy_, x_, trips)

    rows = {"rel_err_fp32": err}
    for tag, fn, a_, b_ in (("A_status_quo", status_quo, dy, x),
                            ("B_fp32_acc", fp32_acc, dy, x),
                            ("C_manual_dnums", manual_dnums, dy, x),
                            ("D_batch_split8", batch_split, dy, x)):
        secs = timed(fn, a_, b_, trips=args.trips)
        rows[tag] = {"ms": secs * 1e3, "tfs": flops / secs / 1e12}
        print(f"| L1 bwd-filter {tag:15s} | {secs * 1e3:6.3f} ms | "
              f"{flops / secs / 1e12:6.1f} TF/s "
              f"({100 * flops / secs / 1e12 / peak:.0f}% pk) |")
    out["bwd_filter_L1"] = rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trips", type=int, default=50)
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--skip", nargs="*", default=[], choices=["stem", "bwdf"])
    args = ap.parse_args()
    dtype = jnp.dtype(args.dtype)
    dev = jax.devices()[0]
    peak = {"TPU v5 lite": 197.0, "TPU v4": 275.0, "TPU v5p": 459.0,
            "TPU v6e": 918.0}.get(dev.device_kind, float("nan"))
    print(f"device: {dev.device_kind}, peak {peak} TF/s, batch {args.batch}, "
          f"{args.dtype}, trips {args.trips}\n")
    out = {"device": dev.device_kind, "batch": args.batch, "dtype": args.dtype}
    if "stem" not in args.skip:
        bench_stem(args, dtype, peak, out)
    if "bwdf" not in args.skip:
        bench_bwd_filter(args, dtype, peak, out)
    Path(__file__).with_suffix(".json").write_text(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
