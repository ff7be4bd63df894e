#!/usr/bin/env python
"""Export a trained checkpoint to the reference's torch .pth release format.

Closes the reverse direction of checkpoint interop (MIGRATION.md): a model
trained by this framework becomes a 5-element torch.save list
[optim_state, model_state, scheduler_state, scaler_state, step]
(reference training/utils.py:43-51) that the reference ecosystem consumes
directly — torch.hub release entries (hubconf.py:37-40),
verify_model_checkpoint.py:30-34, crunch.py:27-32.

    python tools/export_reference_checkpoint.py impl.checkpoint.name=fb.ckpt \
        +out=export/final_resnet18.pth [+ema=True] [model=... data=...]

The model/data groups must match the run that wrote the checkpoint (same
requirement as verify_model_checkpoint.py). +ema=True exports the EMA
weights instead of the raw parameters.
"""

import sys
from pathlib import Path

CONFIG_DIR = Path(__file__).resolve().parents[1] / "config"
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from fullbatchtraining_tpu.config import load_config  # noqa: E402
from fullbatchtraining_tpu.utils import hydra_main, job_startup, system_startup  # noqa: E402


def main(overrides=None, job_num=None, sweep_stamp=None):
    cfg = load_config(CONFIG_DIR,
                      overrides=sys.argv[1:] if overrides is None else overrides)
    if cfg.impl.checkpoint.name is None:
        raise SystemExit("Set impl.checkpoint.name=<file> to choose a checkpoint.")
    if cfg.get("out") is None:
        raise SystemExit("Set +out=<file.pth> to choose the export target.")
    checkpoint_path = (Path(cfg.get("original_cwd", ".")) / "checkpoints"
                       / str(cfg.impl.checkpoint.name)).resolve()
    # resolve BEFORE job_startup chdirs into the per-run output dir, so a
    # relative +out= lands next to the launch cwd like checkpoints/ does
    out_path = (Path(cfg.get("original_cwd", ".")) / Path(cfg.get("out"))).resolve()
    cfg = job_startup(cfg, "export_reference_checkpoint", job_num=job_num,
                      sweep_stamp=sweep_stamp)

    import logging

    log = logging.getLogger("export")
    mesh = system_startup(cfg)

    import jax

    from fullbatchtraining_tpu.data import construct_databundle
    from fullbatchtraining_tpu.models import construct_model, initialize_model
    from fullbatchtraining_tpu.pretrained import (
        export_reference_training_checkpoint, save_reference_checkpoint)
    from fullbatchtraining_tpu.training.training import make_train_functions
    from fullbatchtraining_tpu.training.utils import load_checkpoint

    bundle = construct_databundle(cfg.data, cfg.impl, cfg.hyp, dryrun=cfg.dryrun,
                                  seed=cfg.seed)
    model = construct_model(cfg.model, bundle.channels, bundle.classes)
    fns = make_train_functions(model, bundle, mesh, cfg)
    variables = initialize_model(model, jax.random.key(cfg.seed), bundle.pixels,
                                 bundle.channels)
    state = fns.init_state(variables)
    state, step = load_checkpoint(state, cfg, max_steps=float("inf"), require=True,
                                  file=checkpoint_path)

    use_ema = bool(cfg.get("ema", False))
    if use_ema:
        if state.ema_params is None:
            raise SystemExit("+ema=True but the checkpoint carries no EMA "
                             "weights (hyp.evaluate_ema was off).")
        # EMA weights never pair with the live optimizer state: weights-only
        file = save_reference_checkpoint(
            {"params": state.ema_params, "batch_stats": state.ema_batch_stats},
            out_path, step=step, model_cfg=cfg.model)
    else:
        # full 5-tuple: weights + SGD momentum + scheduler state when the
        # optimizer maps to torch's layout, weights-only otherwise
        file = export_reference_training_checkpoint(state, cfg, out_path,
                                                    schedule=fns.schedule)
    log.info("Exported %s step %d -> %s%s", checkpoint_path.name, step, file,
             " (EMA weights)" if use_ema else "")
    return file


if __name__ == "__main__":
    hydra_main(main)
