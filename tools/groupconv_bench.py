#!/usr/bin/env python
"""Race XLA's grouped-conv lowerings against explicit batched-GEMM rewrites.

The flagship paper recipe (hyp=gradreg data.batch_size=32, block group 16)
spends +2.43 s/step on "per-chunk gradient semantics" (VALIDATION.md): the
accumulation scan vmaps value_and_grad over 16 chunks of 32 images, so every
conv in the network appears in three grouped forms that XLA lowers through
its batch_group_count / feature_group_count conv emitters:

  dW-grouped   per-chunk filter gradients with SHARED weights
               (vmap over (x, dy) of the filter-transpose)     [base sweep]
  fwd-groupedW forward with PER-CHUNK weights
               (vmap over (x, w) — the FD re-grad's forward)   [gradreg]
  dX-groupedW  input gradients with PER-CHUNK weights          [gradreg]

This tool measures each of those at the recipe geometry (G=16, B=32) on the
real chip and races it against an explicit reformulation that bypasses the
conv emitter entirely:

  patches+GEMM  extract im2col patches on the folded (G*B) batch (group-
                independent when strides share), then one batched dot_general
                per op — patch extraction is INSIDE the timed loop, so its
                cost is paid per trip exactly like the XLA lowering's:
                  dW_g  = patches_g^T @ dy_g    (M=9Cin, K=B*Ho*Wo, N=Cout)
                  y_g   = patches_g  @ w_g      (M=B*Ho*Wo, K=9Cin, N=Cout)
                  dX_g  = patches(dy)_g @ w_g^R (M=B*Ho*Wo, K=9Cout, N=Cin)

Reference floor: the same op dense at batch G*B with shared weights. Each
GEMM reformulation is asserted numerically equal to its XLA form first.

If XLA's grouped lowering already matches the batched GEMM, the +2.43 s is
pinned to semantics (the 16 gradient trees must exist); if the GEMM wins,
that is a shippable kernel swap for the recipe's hot path.

Usage: python tools/groupconv_bench.py [--trips 30] [--dtype float32]
Writes markdown to stdout and JSON to tools/groupconv_bench.json.
"""

import argparse
import functools
import json
import time
from pathlib import Path

import jax
import jax.numpy as jnp

# (name, H(=W), C, fwd-count in ResNet-18) — the four square shapes carry
# ~88% of the network flops; downsample/stem shapes are in mfu_roofline.py.
SHAPES = [
    ("L1 32x32 c64", 32, 64, 4),
    ("L2 16x16 c128", 16, 128, 3),
    ("L3 8x8 c256", 8, 256, 3),
    ("L4 4x4 c512", 4, 512, 3),
]
G, B = 16, 32  # the recipe geometry: 16 vmapped chunks of batch 32


def conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype)


def patches(x):
    """im2col: (N,H,W,C) -> (N,H,W,9C); channel-MAJOR (C, kh, kw) order."""
    p = jax.lax.conv_general_dilated_patches(
        x, (3, 3), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    # conv_general_dilated_patches yields C-major (C*9) feature order; the
    # GEMM contracts the whole axis so the order only has to match w's.
    return p


def w_for_patches(w):
    """HWIO (3,3,Cin,Cout) -> (Cin*9, Cout) matching patches' feature order."""
    return jnp.transpose(w, (2, 0, 1, 3)).reshape(-1, w.shape[-1])


def timed(fn, *args, trips, reps=4):
    jfn = jax.jit(functools.partial(fn, trips=trips))
    jax.device_get(jfn(*args))  # compile + warmup
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.device_get(jfn(*args))
        best = min(best, (time.perf_counter() - t0) / trips)
    return best


def loop(body, operands, trips):
    """Time ``body(*operands)`` over ``trips`` sequential loop iterations.

    EVERY operand is perturbed by an iteration- and carry-dependent epsilon so
    XLA can hoist no operand-derived subcomputation (in particular the im2col
    patch extraction) out of the loop, and trips stay serially dependent. The
    epsilon is the dtype's smallest NORMAL (finfo.tiny): a fixed 1e-30 would
    underflow to zero in float16, turning the perturbation into a
    constant-foldable no-op and letting invariant loop bodies hoist."""
    def step(i, acc):
        s = acc * 0 + i  # carry-dependent: forces sequential trips
        perturbed = [a * (1 + s.astype(a.dtype)
                          * jnp.asarray(jnp.finfo(a.dtype).tiny, a.dtype))
                     for a in operands]
        return acc + body(*perturbed).astype(jnp.float32).sum()
    return jax.lax.fori_loop(0, trips, step, jnp.zeros((), jnp.float32))


def bench_shape(H, C, dtype, trips):
    key = jax.random.key(0)
    kx, kw, kdy = jax.random.split(key, 3)
    xg = jax.random.normal(kx, (G, B, H, H, C), dtype)          # grouped input
    w = jax.random.normal(kw, (3, 3, C, C), dtype) * 0.05       # shared
    wg = jax.random.normal(kw, (G, 3, 3, C, C), dtype) * 0.05   # per-chunk
    dyg = jax.random.normal(kdy, (G, B, H, H, C), dtype) * 0.05
    xd = xg.reshape(G * B, H, H, C)                             # dense view
    dyd = dyg.reshape(G * B, H, H, C)
    flops = 2 * G * B * H * H * 9 * C * C

    def dw_one(x_, dy_):
        t = jax.linear_transpose(lambda ww: conv(x_, ww), w)
        return t(dy_)[0]

    def dx_one(w_, dy_):
        z = jnp.zeros((B, H, H, C), dtype)
        t = jax.linear_transpose(lambda xx: conv(xx, w_), z)
        return t(dy_)[0]

    def dw_gemm_body(xi, d):
        p = patches(xi.reshape(G * B, H, H, C)).reshape(G, B * H * H, 9 * C)
        dg = d.reshape(G, B * H * H, C)
        return jax.lax.dot_general(p, dg, (((1,), (1,)), ((0,), (0,))),
                                   preferred_element_type=dtype)

    def fwd_gemm_body(xi, wi):
        wmat = jax.vmap(w_for_patches)(wi)  # (G, 9C, C)
        p = patches(xi.reshape(G * B, H, H, C)).reshape(G, B * H * H, 9 * C)
        return jax.lax.dot_general(p, wmat, (((2,), (1,)), ((0,), (0,))),
                                   preferred_element_type=dtype)

    def dx_gemm_body(wi, d):
        # dX of a stride-1 SAME 3x3 conv = SAME conv of dy with the kernel
        # flipped spatially and in/out channels swapped. The dy patches are
        # C-major over Cout, so the matching matrix is (Cout, kh, kw, Cin).
        wback = jnp.transpose(wi[:, ::-1, ::-1], (0, 4, 1, 2, 3)).reshape(G, 9 * C, C)
        p = patches(d.reshape(G * B, H, H, C)).reshape(G, B * H * H, 9 * C)
        return jax.lax.dot_general(p, wback, (((2,), (1,)), ((0,), (0,))),
                                   preferred_element_type=dtype)

    cases = {}

    # --- per-chunk dW, shared weights (base-sweep backward) ---
    cases["dW grouped (XLA)"] = (
        lambda x_, dy_, trips: loop(
            lambda xi, d: jax.vmap(dw_one)(xi, d), (x_, dy_), trips),
        (xg, dyg), flops)
    cases["dW grouped (patches+GEMM)"] = (
        lambda x_, dy_, trips: loop(dw_gemm_body, (x_, dy_), trips),
        (xg, dyg), flops)
    cases["dW dense (floor)"] = (
        lambda x_, dy_, trips: loop(
            lambda xi, d: jax.linear_transpose(
                lambda ww: conv(xi, ww), w)(d)[0], (x_, dy_), trips),
        (xd, dyd), flops)

    # --- forward with per-chunk weights (FD re-grad forward) ---
    cases["fwd groupedW (XLA)"] = (
        lambda x_, w_, trips: loop(
            lambda xi, wi: jax.vmap(conv)(xi, wi), (x_, w_), trips),
        (xg, wg), flops)
    cases["fwd groupedW (patches+GEMM)"] = (
        lambda x_, w_, trips: loop(fwd_gemm_body, (x_, w_), trips),
        (xg, wg), flops)
    cases["fwd dense (floor)"] = (
        lambda x_, w_, trips: loop(
            lambda xi, wi: conv(xi, wi), (x_, w_), trips), (xd, w), flops)

    # --- input grads with per-chunk weights (FD re-grad backward) ---
    cases["dX groupedW (XLA)"] = (
        lambda w_, dy_, trips: loop(
            lambda wi, d: jax.vmap(dx_one)(wi, d), (w_, dy_), trips),
        (wg, dyg), flops)
    cases["dX groupedW (patches+GEMM)"] = (
        lambda w_, dy_, trips: loop(dx_gemm_body, (w_, dy_), trips),
        (wg, dyg), flops)
    cases["dX dense (floor)"] = (
        lambda w_, dy_, trips: loop(
            lambda wi, d: jax.linear_transpose(
                lambda xx: conv(xx, wi),
                jnp.zeros((G * B, H, H, C), dtype))(d)[0], (w_, dy_), trips),
        (w, dyd), flops)

    # Self-check: each GEMM reformulation must agree with the XLA lowering
    # (layouts differ — the GEMM emits C-major matrices — so map back first).
    tol = 2e-2 if dtype != jnp.float32 else 1e-3

    def _close(a, b, name):
        a, b = jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32)
        err = float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(b)) + 1e-12))
        assert err < tol, f"{name} GEMM mismatch: rel err {err:.2e}"

    dw_ref = jax.vmap(dw_one)(xg, dyg)                       # (G,3,3,I,O)
    dw_new = dw_gemm_body(xg, dyg).reshape(G, C, 3, 3, C)    # (G,I,kh,kw,O)
    _close(jnp.transpose(dw_new, (0, 2, 3, 1, 4)), dw_ref, "dW")
    fwd_ref = jax.vmap(conv)(xg, wg)
    _close(fwd_gemm_body(xg, wg).reshape(G, B, H, H, C), fwd_ref, "fwd")
    dx_ref = jax.vmap(dx_one)(wg, dyg)
    _close(dx_gemm_body(wg, dyg).reshape(G, B, H, H, C), dx_ref, "dX")

    out = {}
    for name, (fn, args_, fl) in cases.items():
        secs = timed(fn, *args_, trips=trips)
        out[name] = {"ms": secs * 1e3, "tfs": fl / secs / 1e12}
    return out, flops


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trips", type=int, default=30)
    ap.add_argument("--dtype", default="float32")
    args = ap.parse_args()
    dtype = jnp.dtype(args.dtype)

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}, geometry G={G} B={B}, {args.dtype}, "
          f"trips {args.trips}\n")

    all_rows = {}
    order = None
    totals = {}
    for name, H, C, count in SHAPES:
        res, flops = bench_shape(H, C, dtype, args.trips)
        if order is None:
            order = list(res)
            print("| shape | " + " | ".join(order) + " |")
            print("|" + "---|" * (len(order) + 1))
        print(f"| {name} | " + " | ".join(
            f"{res[k]['ms']:.2f} ms ({res[k]['tfs']:.0f} TF/s)"
            for k in order) + " |")
        all_rows[name] = {"H": H, "C": C, "count": count,
                          "flops": flops, **res}
        for k in order:
            t, f = totals.get(k, (0.0, 0.0))
            totals[k] = (t + count * res[k]["ms"], f + count * flops)

    print("\nweighted network totals (fwd-conv counts):")
    for k, (ms, f) in totals.items():
        print(f"  {k:28s}: {ms:7.1f} ms  {f / ms / 1e9:6.1f} TF/s")

    Path(__file__).with_suffix(".json").write_text(json.dumps(
        {"device": dev.device_kind, "dtype": args.dtype, "G": G, "B": B,
         "rows": all_rows,
         "totals": {k: {"ms": v[0], "flops": v[1]}
                    for k, v in totals.items()}}, indent=1))


if __name__ == "__main__":
    main()
