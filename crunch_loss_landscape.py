#!/usr/bin/env python
"""Compute the loss landscape around a checkpoint.

CLI mirror of /root/reference/crunch_loss_landscape.py, rebuilt TPU-native:
grid positions are evaluated vmapped in groups of viz.vmap_positions per full
data pass instead of one-at-a-time (SURVEY.md §2 #34). Fixes the reference's
missing-cfg.hyp dataloader call (crunch_loss_landscape.py:32, SURVEY.md §7).

    python crunch_loss_landscape.py impl.checkpoint.name=fb.ckpt viz=1d
"""

import sys
from pathlib import Path

CONFIG_DIR = Path(__file__).resolve().parent / "config"
sys.path.insert(0, str(Path(__file__).resolve().parent))

from fullbatchtraining_tpu.config import load_config  # noqa: E402
from fullbatchtraining_tpu.utils import hydra_main, job_startup, system_startup  # noqa: E402


def main(overrides=None, job_num=None, sweep_stamp=None):
    cfg = load_config(CONFIG_DIR,
                      overrides=sys.argv[1:] if overrides is None else overrides)
    checkpoint_dir = Path.cwd() / "checkpoints"
    cfg = job_startup(cfg, "crunch_loss_landscape",
                      job_num=job_num, sweep_stamp=sweep_stamp)

    import logging

    import jax

    log = logging.getLogger("crunch")
    mesh = system_startup(cfg)

    from fullbatchtraining_tpu.data import construct_databundle
    from fullbatchtraining_tpu.models import construct_model, initialize_model
    from fullbatchtraining_tpu.training.training import make_train_functions
    from fullbatchtraining_tpu.training.utils import load_checkpoint
    from fullbatchtraining_tpu.visualization import crunch

    bundle = construct_databundle(cfg.data, cfg.impl, cfg.hyp, dryrun=cfg.dryrun,
                                  seed=cfg.seed)
    model = construct_model(cfg.model, bundle.channels, bundle.classes)
    fns = make_train_functions(model, bundle, mesh, cfg)
    variables = initialize_model(model, jax.random.key(cfg.seed), bundle.pixels,
                                 bundle.channels)
    state = fns.init_state(variables)

    if cfg.impl.checkpoint.name is not None:
        file = checkpoint_dir / str(cfg.impl.checkpoint.name)
        state, step = load_checkpoint(state, cfg, max_steps=float("inf"),
                                      require=True, file=file, mesh=mesh)
        log.info("Loaded model checkpoint from step %d successfully.", step)
    else:
        cfg.impl.checkpoint.name = cfg.name
        log.info("No checkpoint supplied! Loss landscape will be computed for the "
                 "model initialization without training.")

    store, positions = crunch(model, bundle, mesh, cfg, fns, state)
    log.info("Surface complete: %d positions in %s", len(positions),
             store.results_file)


if __name__ == "__main__":
    hydra_main(main)
