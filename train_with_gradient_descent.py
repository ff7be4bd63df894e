#!/usr/bin/env python
"""Train a vision classifier with (full-batch) gradient descent on TPU.

CLI mirror of /root/reference/train_with_gradient_descent.py. Usage is
identical Hydra-style overrides:

    python train_with_gradient_descent.py name=fbaug_gradreg hyp=gradreg \
        data.batch_size=128 impl.checkpoint.name=fb_gradreg.ckpt

Unlike the reference there is no per-GPU process spawn (utils.py:45): one
process drives all local devices through the mesh; multi-host runs launch
this script once per host (impl/setup=distributed).
"""

import sys
import time
from pathlib import Path

CONFIG_DIR = Path(__file__).resolve().parent / "config"
sys.path.insert(0, str(Path(__file__).resolve().parent))

from fullbatchtraining_tpu.config import load_config, to_yaml  # noqa: E402
from fullbatchtraining_tpu.utils import (  # noqa: E402
    hydra_main, job_startup, save_summary, system_startup)


def main(overrides=None, job_num=None, sweep_stamp=None):
    cfg = load_config(CONFIG_DIR,
                      overrides=sys.argv[1:] if overrides is None else overrides)
    cfg = job_startup(cfg, "train_with_gradient_descent",
                      job_num=job_num, sweep_stamp=sweep_stamp)
    import logging

    log = logging.getLogger("train")
    log.info("--------------------------------------------------\n%s", to_yaml(cfg))

    mesh = system_startup(cfg)

    from fullbatchtraining_tpu.data import construct_databundle
    from fullbatchtraining_tpu.models import construct_model
    from fullbatchtraining_tpu.training import train

    start = time.time()
    bundle = construct_databundle(cfg.data, cfg.impl, cfg.hyp, dryrun=cfg.dryrun,
                                  seed=cfg.seed)
    model = construct_model(cfg.model, bundle.channels, bundle.classes)
    state, stats = train(model, bundle, mesh, cfg)
    elapsed = time.time() - start

    save_summary(cfg, stats, elapsed)
    log.info("Total training time: %.1fs. Job finished. ", elapsed)
    if stats.get("valid_acc"):
        log.info("Final validation accuracy: %.2f%%", 100 * stats["valid_acc"][-1])
    return stats


if __name__ == "__main__":
    hydra_main(main)
