#!/usr/bin/env python
"""Import a reference torch .pth checkpoint as a resumable TrainState.

Closes the forward direction of MID-RUN checkpoint interop (MIGRATION.md):
a reference 5-element torch.save list [optim_state, model_state,
scheduler_state, scaler_state, step] (reference training/utils.py:43-51)
becomes this framework's msgpack TrainState checkpoint, so

    python tools/import_reference_checkpoint.py +in=ref/checkpoint.pth \
        impl.checkpoint.name=fb.ckpt [model=... data=... hyp=...]
    python train_with_gradient_descent.py impl.checkpoint.name=fb.ckpt ...

continues a run the reference started. Model weights and BN stats import
for every model family; SGD momentum additionally imports for plain-SGD
ResNet runs (the same coverage as the export direction,
tools/export_reference_checkpoint.py). The model/hyp groups must match the
run that wrote the .pth — the saved group lr is cross-checked against the
schedule and mismatches are logged loudly.
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
    if cfg.get("in") is None:
        raise SystemExit("Set +in=<file.pth> to choose the reference checkpoint.")
    if cfg.impl.checkpoint.name is None:
        raise SystemExit("Set impl.checkpoint.name=<file> to name the "
                         "imported checkpoint.")
    in_path = (Path(cfg.get("original_cwd", ".")) / Path(cfg.get("in"))).resolve()
    out_path = (Path(cfg.get("original_cwd", ".")) / "checkpoints"
                / str(cfg.impl.checkpoint.name)).resolve()
    cfg = job_startup(cfg, "import_reference_checkpoint", job_num=job_num,
                      sweep_stamp=sweep_stamp)

    import logging

    log = logging.getLogger("import")
    mesh = system_startup(cfg)

    import jax

    from fullbatchtraining_tpu.data import construct_databundle
    from fullbatchtraining_tpu.models import construct_model, initialize_model
    from fullbatchtraining_tpu.pretrained import import_reference_training_checkpoint
    from fullbatchtraining_tpu.training.training import make_train_functions
    from fullbatchtraining_tpu.training.utils import save_checkpoint

    bundle = construct_databundle(cfg.data, cfg.impl, cfg.hyp, dryrun=cfg.dryrun,
                                  seed=cfg.seed)
    model = construct_model(cfg.model, bundle.channels, bundle.classes)
    fns = make_train_functions(model, bundle, mesh, cfg)
    variables = initialize_model(model, jax.random.key(cfg.seed), bundle.pixels,
                                 bundle.channels)
    state = fns.init_state(variables)
    state, step = import_reference_training_checkpoint(in_path, cfg, state,
                                                       schedule=fns.schedule)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    file = save_checkpoint(state, cfg, file=out_path)
    log.info("Imported %s step %d -> %s", in_path.name, step, file)
    return file


if __name__ == "__main__":
    hydra_main(main)
