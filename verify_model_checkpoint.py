#!/usr/bin/env python
"""Re-evaluate a saved checkpoint's validation accuracy.

CLI mirror of /root/reference/verify_model_checkpoint.py:38-39:
load the checkpoint named by impl.checkpoint.name and run evaluation.

    python verify_model_checkpoint.py impl.checkpoint.name=fb.ckpt
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
    if cfg.impl.checkpoint.name is None:
        raise SystemExit("Set impl.checkpoint.name=<file> to choose a checkpoint.")
    checkpoint_path = (Path(cfg.get("original_cwd", ".")) / "checkpoints"
                       / str(cfg.impl.checkpoint.name)).resolve()
    cfg = job_startup(cfg, "verify_model_checkpoint", job_num=job_num, sweep_stamp=sweep_stamp)

    import logging

    log = logging.getLogger("verify")
    mesh = system_startup(cfg)

    from fullbatchtraining_tpu.data import construct_databundle
    from fullbatchtraining_tpu.models import construct_model, initialize_model
    from fullbatchtraining_tpu.training.training import make_train_functions, stage_validation
    from fullbatchtraining_tpu.training.utils import load_checkpoint

    import jax

    bundle = construct_databundle(cfg.data, cfg.impl, cfg.hyp, dryrun=cfg.dryrun,
                                  seed=cfg.seed)
    model = construct_model(cfg.model, bundle.channels, bundle.classes)
    fns = make_train_functions(model, bundle, mesh, cfg)
    variables = initialize_model(model, jax.random.key(cfg.seed), bundle.pixels,
                                 bundle.channels)
    state = fns.init_state(variables)
    state, step = load_checkpoint(state, cfg, max_steps=float("inf"), require=True,
                                  file=checkpoint_path, mesh=mesh)

    val = stage_validation(bundle, mesh, fns.num_devices, bundle.batch_size,
                           dryrun=cfg.dryrun, cfg_impl=cfg.impl)
    metrics = jax.device_get(fns.eval_step(state.params, state.batch_stats, *val))
    log.info("Checkpoint step %d: valid_loss %.4f, valid_acc %.2f%%",
             step, metrics["valid_loss"], 100 * metrics["valid_acc"])
    return metrics


if __name__ == "__main__":
    hydra_main(main)
