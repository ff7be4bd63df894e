#!/usr/bin/env python
"""Pallas fused BN vs XLA's fused BN, on chip, at the flagship shapes.

Times one train-mode BatchNorm fwd+bwd (value_and_grad of <y, cot>, plus
the mean/var outputs that feed running stats) per ResNet-18/CIFAR
activation shape at batch 2048, isolated from the convs — kernel-vs-kernel,
no cross-op fusion on either side. The full-step verdict (where XLA
additionally fuses BN into the neighbouring convolutions) is the
"Norm-layer share" ablation in VALIDATION.md.

Tunnel-safe timing: ITERS dependency-chained iterations inside one jitted
fori_loop (the axon tunnel adds ~28 ms dispatch latency per call; a single
call is latency-bound), scalar-only pulls.

Usage: python tools/pallas_bn_bench.py
"""

import json
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
import sys

sys.path.insert(0, str(ROOT))

SHAPES = [(2048, 32, 32, 64), (2048, 16, 16, 128),
          (2048, 8, 8, 256), (2048, 4, 4, 512)]
ITERS = 50


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fullbatchtraining_tpu.ops import pallas_bn

    results = []
    for dtype_name, dtype in [("bfloat16", jnp.bfloat16),
                              ("float32", jnp.float32)]:
        for shape in SHAPES:
            c = shape[-1]
            rng = np.random.default_rng(0)
            x = jnp.asarray(rng.standard_normal(shape), dtype)
            cot = jnp.asarray(rng.standard_normal(shape), dtype)
            scale = jnp.ones((c,), jnp.float32)
            bias = jnp.zeros((c,), jnp.float32)

            def make(fn):
                # cot rides as an argument: closing over a device array
                # this large trips the tunnel's request-size limit (413)
                def loss(x, s, b, cot):
                    y, mean, var = fn(x, s, b)
                    return (jnp.sum((y * cot).astype(jnp.float32)),
                            jnp.sum(mean) + jnp.sum(var))

                @jax.jit
                def bench(x, scale, bias, cot):
                    def body(_, carry):
                        x, acc = carry
                        (v, sv), g = jax.value_and_grad(
                            loss, argnums=(0, 1, 2), has_aux=True)(
                                x, scale, bias, cot)
                        dx = g[0]
                        # dependency chain: next x is a mix with dx; acc
                        # keeps the fwd value + stats + param grads alive
                        nxt = (0.9 * x.astype(jnp.float32)
                               + 0.1 * dx.astype(jnp.float32)).astype(x.dtype)
                        acc = acc + v + sv + jnp.sum(g[1]) + jnp.sum(g[2])
                        return nxt, acc
                    x, acc = jax.lax.fori_loop(
                        0, ITERS, body, (x, jnp.float32(0.0)))
                    return acc + jnp.sum(x.astype(jnp.float32))
                return bench

            row = {"shape": list(shape), "dtype": dtype_name}
            for name, fn in [("xla", pallas_bn.bn_train_reference),
                             ("pallas", pallas_bn.bn_train)]:
                bench = make(fn)
                float(bench(x, scale, bias, cot))  # compile + warm
                times = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    float(bench(x, scale, bias, cot))
                    times.append(time.perf_counter() - t0)
                best = min(times) / ITERS
                passes_bytes = 5 * int(np.prod(shape)) * x.dtype.itemsize
                row[name + "_ms"] = round(best * 1e3, 4)
                row[name + "_eff_gbps_at_5_passes"] = round(
                    passes_bytes / best / 1e9, 1)
            row["pallas_over_xla"] = round(row["pallas_ms"] / row["xla_ms"], 3)
            results.append(row)
            print(json.dumps(row))

    agg = {k: round(float(np.mean([r["pallas_over_xla"] for r in results
                                   if r["dtype"] == k])), 3)
           for k in ("bfloat16", "float32")}
    print(json.dumps({"mean_pallas_over_xla": agg, "iters": ITERS,
                      "platform": jax.devices()[0].platform}))


if __name__ == "__main__":
    main()
