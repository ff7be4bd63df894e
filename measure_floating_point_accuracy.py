#!/usr/bin/env python
"""Floating-point reproducibility audit.

CLI mirror of /root/reference/measure_floating_point_accuracy.py +
training.py:429-600 (_measure_implementation_noise): evaluate the full
accumulated gradient twice from identical state and report absolute and
relative L-inf/L2/L1 deviations. XLA on TPU executes deterministically, so
the expected deviation is exactly zero - this script is the acceptance test
for that claim (SURVEY.md §4.3).

    python measure_floating_point_accuracy.py hyp=fb1 data.size=512
"""

import sys
from pathlib import Path

CONFIG_DIR = Path(__file__).resolve().parent / "config"
sys.path.insert(0, str(Path(__file__).resolve().parent))

from fullbatchtraining_tpu.config import load_config  # noqa: E402
from fullbatchtraining_tpu.utils import hydra_main, job_startup, system_startup  # noqa: E402


def measure_implementation_noise(cfg, mesh):
    import logging

    import jax
    import numpy as np

    from fullbatchtraining_tpu.data import construct_databundle
    from fullbatchtraining_tpu.models import construct_model, initialize_model
    from fullbatchtraining_tpu.training.training import make_train_functions, stage_epoch

    log = logging.getLogger("fp_audit")
    bundle = construct_databundle(cfg.data, cfg.impl, cfg.hyp, dryrun=cfg.dryrun,
                                  seed=cfg.seed)
    model = construct_model(cfg.model, bundle.channels, bundle.classes)
    fns = make_train_functions(model, bundle, mesh, cfg)
    variables = initialize_model(model, jax.random.key(cfg.seed), bundle.pixels,
                                 bundle.channels)
    state = fns.init_state(variables)

    cache = {}
    images, labels = stage_epoch(bundle, fns, mesh, cfg, 0, cache)
    grads_a, _, _ = jax.device_get(fns.gradient_eval(state, images, labels))
    grads_b, _, _ = jax.device_get(fns.gradient_eval(state, images, labels))

    flat_a = np.concatenate([np.asarray(g).ravel() for g in jax.tree.leaves(grads_a)])
    flat_b = np.concatenate([np.asarray(g).ravel() for g in jax.tree.leaves(grads_b)])
    diff = np.abs(flat_a - flat_b)
    denom = np.abs(flat_a) + 1e-12
    results = {
        "abs_linf": float(diff.max()),
        "abs_l2": float(np.linalg.norm(diff)),
        "abs_l1": float(diff.sum()),
        "rel_linf": float((diff / denom).max()),
        "rel_l2": float(np.linalg.norm(diff) / np.linalg.norm(flat_a)),
        "rel_l1": float(diff.sum() / np.abs(flat_a).sum()),
    }
    for key, value in results.items():
        log.info("%s: %.3e", key, value)
    if results["abs_linf"] == 0.0:
        log.info("Gradient computation is bitwise reproducible on this platform.")
    return results


def main(overrides=None, job_num=None, sweep_stamp=None):
    cfg = load_config(CONFIG_DIR,
                      overrides=sys.argv[1:] if overrides is None else overrides)
    cfg = job_startup(cfg, "measure_floating_point_accuracy", job_num=job_num, sweep_stamp=sweep_stamp)
    mesh = system_startup(cfg)
    return measure_implementation_noise(cfg, mesh)


if __name__ == "__main__":
    hydra_main(main)
