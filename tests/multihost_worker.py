"""Worker for the 2-process CPU multi-host test (not a test module).

Usage: python multihost_worker.py <process_id> <num_processes> <port> <outdir> [extra_override ...]

Joins a jax.distributed CPU cluster with 2 local devices per process, runs
one full-batch gradient evaluation over the global mesh, and (rank 0) saves
the gradients + metrics. Exercises process_count>1 semantics: put_global
staging via make_array_from_callback, replicated state placement, and the
single psum over a mesh spanning non-addressable devices (reference
multi-node surface: utils.py:88-97, train_distributed_multinode.sh).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    pid, nproc, port, outdir = (int(sys.argv[1]), int(sys.argv[2]),
                                sys.argv[3], Path(sys.argv[4]))
    extra = list(sys.argv[5:])
    train_mode = "--train" in extra
    if train_mode:
        extra.remove("--train")
    crunch_mode = "--crunch" in extra
    if crunch_mode:
        extra.remove("--crunch")
    analysis_mode = "--analysis" in extra
    if analysis_mode:
        extra.remove("--analysis")
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)

    import numpy as np

    from fullbatchtraining_tpu.config import load_config
    from fullbatchtraining_tpu.data import construct_databundle
    from fullbatchtraining_tpu.models import construct_model, initialize_model
    from fullbatchtraining_tpu.parallel import make_mesh
    from fullbatchtraining_tpu.training.training import (make_train_functions,
                                                         stage_epoch)


    config_dir = Path(__file__).resolve().parent.parent / "config"
    cfg = load_config(config_dir, overrides=[
        "model=linear", "data.size=64", "data.path=/tmp/__none__",
        "data.batch_size=4", "hyp.sub_batch=4", "hyp=fb1", "hyp.warmup=0",
        "seed=0", "data.augmentations_train=", "hyp.shuffle=True",
        "impl/setup=distributed", f"impl.setup.url=localhost:{port}",
        f"impl.setup.world_size={nproc}", f"impl.setup.rank={pid}"] + extra)
    # Join the cluster through the production path (mesh.setup_distributed),
    # which must run before any backend-touching call.
    from fullbatchtraining_tpu.parallel.mesh import setup_distributed
    setup_distributed(cfg.impl.setup)
    assert jax.process_count() == nproc
    assert len(jax.devices()) == 2 * nproc
    mesh = make_mesh(cfg.impl.setup)
    bundle = construct_databundle(cfg.data, cfg.impl, cfg.hyp, seed=0)
    model = construct_model(cfg.model, bundle.channels, bundle.classes)
    fns = make_train_functions(model, bundle, mesh, cfg)
    if int(cfg.impl.get("hbm_epoch_max_bytes", 8 << 30)) == 1:
        # tests forcing a 1-byte budget expect streaming to actually engage
        assert fns.streamed, "forced budget did not engage streaming"
    variables = initialize_model(model, jax.random.key(0), bundle.pixels,
                                 bundle.channels)
    if train_mode:
        # Full train() loop across processes: full_step, eval cadence,
        # rank-0 checkpoint writes, metrics collection.
        import os
        os.chdir(outdir)
        from fullbatchtraining_tpu.training.training import train
        cfg.hyp.steps = 3
        cfg.impl.checkpoint.name = "mh.ckpt"
        state, stats = train(model, bundle, mesh, cfg)
        if jax.process_index() == 0:
            flat = np.concatenate([np.asarray(jax.device_get(g)).ravel()
                                   for g in jax.tree.leaves(state.params)])
            np.savez(outdir / "multiproc_train.npz", params=flat,
                     losses=np.asarray(stats["train_loss"]))
        jax.distributed.shutdown()
        return

    if crunch_mode:
        # Multi-process loss-landscape crunch: rank 0 draws directions into
        # the store (the file is the broadcast), the todo list is rank-0
        # coherent, and only rank 0 records rows.
        import os

        os.chdir(outdir)
        from fullbatchtraining_tpu.visualization.crunch import crunch
        from fullbatchtraining_tpu.visualization.database import load_surface

        state = fns.init_state(variables)
        store, positions = crunch(model, bundle, mesh, cfg, fns, state)
        if jax.process_index() == 0:
            landscape = load_surface(store.path, positions)
            np.savez(outdir / "multiproc_crunch.npz",
                     train_loss=np.asarray(landscape["train_loss"]),
                     full_loss=np.asarray(landscape["full_loss"]))
        jax.distributed.shutdown()
        return

    if analysis_mode:
        # Multi-process gradient-statistics sweep (SNR / noise scale /
        # per-batch norms); with a forced 1-byte HBM budget the per-chunk
        # sweep streams its donated Welford carry (device-sharded ACROSS
        # processes) through segment programs.
        from collections import defaultdict

        from fullbatchtraining_tpu.analysis.analysis import analyze

        state = fns.init_state(variables)
        stats = analyze(model, bundle, mesh, cfg, fns, state, defaultdict(list))
        if jax.process_index() == 0:
            np.savez(outdir / "multiproc_analysis.npz",
                     **{k: np.asarray(v) for k, v in stats.items()})
        jax.distributed.shutdown()
        return

    state = fns.init_state(variables)
    images, labels = stage_epoch(bundle, fns, mesh, cfg, 0, {})
    grads, _, metrics = fns.gradient_eval(state, images, labels,
                                          with_modifiers=False)
    flat = np.concatenate([np.asarray(jax.device_get(g)).ravel()
                           for g in jax.tree.leaves(grads)])
    if jax.process_index() == 0:
        np.savez(outdir / "multiproc_grads.npz", grads=flat,
                 loss=float(metrics["train_loss"]))
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
