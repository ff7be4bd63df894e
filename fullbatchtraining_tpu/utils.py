"""Runtime layer: job startup, mesh/system setup, logging, summary tables.

TPU-native counterpart of /root/reference/fullbatch/utils.py. The reference
spawns one process per local GPU and rendezvouses over a TCP store
(utils.py:20-52, :88-97); under JAX one process owns all local devices, so
job_startup only finalizes the config, creates the per-run output directory
(Hydra's chdir behavior, reference config/cfg.yaml:23-29), seeds, and
configures logging. system_startup builds the device mesh.

The summary surface (per-step convergence CSV + appended run row in
tables/table_fb_<dataset>_runs.csv, tab-separated) mirrors
utils.py:131-224 so downstream tooling keeps working.
"""

from __future__ import annotations

import csv
import datetime
import logging
import os
import random
import re
import sys
import time
from pathlib import Path

import numpy as np

log = logging.getLogger(__name__)


def job_startup(cfg, script_name: str = "job", job_num=None, sweep_stamp=None):
    """Finalize config, create + chdir into the run directory, set up logging.

    Single runs chdir into ``<base_dir>/<date>/<time>`` (the reference's
    hydra.run.dir, config/cfg.yaml:23-29). Under ``--multirun`` the driver
    passes the shared ``sweep_stamp`` plus this job's ``job_num`` and runs
    land in ``<base_dir>/<date>/<time>/<job_num>`` (hydra.sweep.dir + the
    basic launcher's numbered subdirs)."""
    cfg.original_cwd = os.getcwd()
    if cfg.seed is None:
        cfg.seed = random.SystemRandom().randint(0, 2**31 - 1)
    hydra = cfg.pop("_hydra", {})  # hydra.run.dir / sweep.dir / job.chdir CLI overrides
    now = sweep_stamp or datetime.datetime.now()
    dir_key = "run.dir" if job_num is None else "sweep.dir"
    if hydra.get(dir_key) is not None:
        run_dir = Path(_resolve_now(str(hydra[dir_key]), now))
    else:
        run_dir = (Path(cfg.base_dir) / now.strftime("%Y-%m-%d")
                   / now.strftime("%H-%M-%S.%f"))
    if job_num is not None:
        run_dir = run_dir / str(job_num)
    run_dir = run_dir.resolve()  # log path must survive the chdir below
    run_dir.mkdir(parents=True, exist_ok=True)
    if hydra.get("job.chdir", True):
        os.chdir(run_dir)

    handlers = [logging.StreamHandler(sys.stdout)]
    handlers.append(logging.FileHandler(run_dir / f"{script_name}.log"))
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(name)s %(levelname)s: %(message)s",
        handlers=handlers,
        force=True,
    )
    logging.getLogger("jax").setLevel(logging.WARNING)
    np.random.seed(cfg.seed % 2**32)
    random.seed(cfg.seed)
    return cfg


_NOW_PATTERN = re.compile(r"\$\{now:([^}]*)\}")


def _resolve_now(pattern: str, now) -> str:
    """Resolve Hydra's ``${now:%Y-%m-%d}`` resolver in a dir pattern."""
    return _NOW_PATTERN.sub(lambda m: now.strftime(m.group(1)), pattern)


def hydra_main(main, argv=None):
    """Entry-point driver mirroring ``@hydra.main``: one run, or a sweep.

    ``main(overrides, job_num=None, sweep_stamp=None)`` is called once per
    job. ``--multirun``/``-m`` expands comma choice sweeps via
    :func:`fullbatchtraining_tpu.config.expand_multirun` and runs the jobs
    sequentially (Hydra's basic launcher), each under
    ``<base_dir>/<date>/<time>/<job_num>``, restoring the launch cwd between
    jobs. A failing job aborts the sweep, as upstream."""
    from fullbatchtraining_tpu.config import expand_multirun

    is_multi, jobs = expand_multirun(sys.argv[1:] if argv is None else argv)
    if not is_multi:
        return main(jobs[0])
    launch_cwd = os.getcwd()
    sweep_stamp = datetime.datetime.now()
    results = []
    for i, job in enumerate(jobs):
        print(f"[multirun] launching job #{i} : {' '.join(job)}", flush=True)
        os.chdir(launch_cwd)
        try:
            results.append(main(job, job_num=i, sweep_stamp=sweep_stamp))
        finally:
            os.chdir(launch_cwd)
    return results


def _host_fingerprint() -> str:
    """Stable 8-hex tag for this host's CPU ISA (see compilation-cache note).

    Uses /proc/cpuinfo's flags line (the feature set XLA:CPU AOT compiles
    against); falls back to the platform triple where /proc is absent."""
    import hashlib
    import platform

    try:
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if line.startswith(("flags", "Features")):
                    spec = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
            else:
                spec = platform.platform()
    except OSError:
        spec = platform.platform()
    return hashlib.sha1(spec.encode()).hexdigest()[:8]


def enable_compilation_cache(cache_dir) -> None:
    """Point JAX at the persistent XLA executable cache under ``cache_dir``.

    Repeat launches of the same recipe skip compilation entirely (measured
    through the axon tunnel: 80 s cold -> 0.26 s warm for a conv program).
    Safe to share across processes; keyed by computation + backend.
    XLA:CPU AOT executables additionally embed the HOST machine's ISA
    features, which the cache key does NOT cover - an entry written on
    another machine loads with a feature-mismatch warning and can then
    misexecute (observed: a cross-host entry spinning forever on this
    host). Scope the cache per host fingerprint so shared filesystems
    and reimaged machines stay safe. No-op when ``cache_dir`` is falsy."""
    if not cache_dir:
        return
    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.expanduser(str(cache_dir)),
                         f"host-{_host_fingerprint()}"))
    except Exception as err:  # unsupported backend/flag: run uncached
        log.info("Compilation cache disabled: %s", err)
        return
    try:
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as err:
        # cache stays ON; only the 1s threshold tuning failed
        log.info("Compilation cache min-compile-time tuning unavailable: %s", err)


def system_startup(cfg):
    """Initialize distributed runtime (if any) and build the mesh."""
    import jax

    # Restore standard JAX_PLATFORMS semantics: the axon site hook registers
    # the TPU backend unconditionally, shadowing the env var.
    if os.environ.get("JAX_PLATFORMS"):
        try:
            jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
        except RuntimeError:
            pass  # backend already initialized

    enable_compilation_cache(cfg.impl.get("compilation_cache"))

    from .parallel import make_mesh, setup_distributed

    setup_distributed(cfg.impl.setup)
    if jax.process_count() > 1:
        # The run seed feeds collective programs that every process must
        # build identically (model init, the host-PRNG shuffle order in
        # training.py) — but with cfg.seed unset, job_startup drew a
        # DIFFERENT SystemRandom seed per process. Rank 0's seed wins, as in
        # the reference where the launcher draws the seed once before
        # spawning workers (reference utils.py:25-26).
        from jax.experimental import multihost_utils
        seed = int(multihost_utils.broadcast_one_to_all(
            np.asarray(int(cfg.seed), np.int64)))
        if seed != cfg.seed:
            cfg.seed = seed
            np.random.seed(seed % 2**32)
            random.seed(seed)
    mesh = make_mesh(cfg.impl.setup)
    log.info("Platform: %s, devices: %d (%s), processes: %d, mesh axes: %s",
             jax.default_backend(), jax.device_count(),
             jax.devices()[0].device_kind, jax.process_count(), mesh.axis_names)
    log.info("Python %s, jax %s", sys.version.split()[0], jax.__version__)
    log.info("Config name: %s, seed: %s, dryrun: %s", cfg.name, cfg.seed, cfg.dryrun)
    return mesh


def is_main_process() -> bool:
    import jax

    return jax.process_index() == 0


def save_summary(cfg, stats, local_time: float):
    """Per-step convergence table + appended one-row run summary
    (reference utils.py:131-186).

    DOCUMENTED DEVIATION: hyp/impl config columns are flattened to dotted
    keys ('optim.lr', 'grad_reg.block_strength') instead of the reference's
    top-level `**cfg.hyp` columns, which held python dict REPRs for nested
    groups ('optim': "{'name': ...}") and were unusable for filtering. The
    file location/format (tab-separated tables/table_fb_<dataset>_runs.csv)
    and all metric columns are unchanged; mixed-era tables reconcile by
    header (save_to_table)."""
    if not is_main_process():
        return
    num_steps = len(stats.get("train_loss", []))
    for step in range(num_steps):
        iteration = {}
        for key in stats:
            values = stats[key]
            iteration[key] = values[step] if step < len(values) else None
        save_to_table(".", f"{cfg.name}_convergence_results", dryrun=cfg.dryrun, **iteration)

    def maybe(key):
        return stats[key][-1] if stats.get(key) else ""

    max_val_acc = max(stats["valid_acc"]) if stats.get("valid_acc") else ""
    try:
        # Skip warmup, find the validation block with minimal full training loss
        # and report validation accuracy there (utils.py:149-157).
        warmup = cfg.hyp.warmup
        blocks = np.array(stats["full_loss"][warmup:], dtype=np.float64)
        blocks = blocks[: len(blocks) - len(blocks) % cfg.impl.validate_every_nth_step]
        blocks = blocks.reshape(-1, cfg.impl.validate_every_nth_step)
        best = blocks.mean(-1).argmin() + warmup // cfg.impl.validate_every_nth_step
        acc_at_min_loss = stats["valid_acc"][best]
    except (ValueError, IndexError, KeyError):
        acc_at_min_loss = ""

    flat_hyp = _flatten(dict(cfg.hyp))
    flat_impl = _flatten({k: v for k, v in cfg.impl.items() if k != "setup"})
    summary = dict(
        name=cfg.name,
        model=cfg.model.name,
        optimizer=cfg.hyp.optim.name,
        stoch=cfg.hyp.train_stochastic,
        augmentations=bool(cfg.data.augmentations_train),
        valid_acc=maybe("valid_acc"),
        valid_acc_at_min_loss=acc_at_min_loss,
        max_val_acc=max_val_acc,
        train_acc=maybe("train_acc"),
        valid_loss=maybe("valid_loss"),
        train_loss=maybe("train_loss"),
        full_loss=maybe("full_loss"),
        grad_norm=maybe("grad_norm"),
        avg_step_time=float(np.median(np.asarray(stats["train_time"], dtype=np.float64)))
        if stats.get("train_time") else "",
        total_time=str(datetime.timedelta(seconds=int(local_time))).replace(",", ""),
        param_norm=maybe("param_norm"),
        grad_SNR=maybe("analysis_grad_SNR"),
        grad_mean_norm=maybe("analysis_grad_mean_norm"),
        grad_noise_scale=maybe("analysis_grad_noise_scale"),
        empirical_flatness=maybe("analysis_empirical_flatness"),
        batch_size=cfg.data.batch_size,
        **flat_hyp,
        **flat_impl,
        seed=cfg.seed,
        folder=os.getcwd(),
    )
    save_to_table(os.path.join(cfg.original_cwd, "tables"),
                  f"fb_{cfg.data.name}_runs", dryrun=cfg.dryrun, **summary)


def _flatten(d, prefix=""):
    out = {}
    for k, v in d.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(_flatten(v, prefix=f"{key}."))
        else:
            out[key] = v
    return out


def save_to_table(out_dir, table_name, dryrun, **kwargs):
    """Append a row to a tab-separated .csv, creating the header on first use.

    Reference bug FIXED (documented per CLAUDE.md): the reference appends
    rows in the new run's own column order without reconciling against an
    existing file's header (its consistency assert is commented out,
    utils.py:200-204), silently misaligning heterogeneous runs. Rows here
    are written under the EXISTING header: missing columns become empty
    cells and genuinely new columns are dropped with a warning.
    """
    if dryrun:
        return
    os.makedirs(out_dir, exist_ok=True)
    fname = os.path.join(out_dir, f"table_{table_name}.csv")
    fieldnames = list(kwargs.keys())
    existing = None
    if os.path.exists(fname):
        with open(fname, newline="") as handle:
            existing = next(csv.reader(handle, delimiter="\t"), None)
    if not existing:
        # absent OR empty (killed between create and writeheader): (re)write
        # the header — appending headerless rows would make every later run
        # mistake the first data row for the header (reference
        # utils.py:196-205 recreates the header on any read failure)
        with open(fname, "w", newline="") as handle:
            csv.DictWriter(handle, delimiter="\t", fieldnames=fieldnames).writeheader()
    else:
        if existing != fieldnames:
            dropped = [k for k in fieldnames if k not in existing]
            if dropped:
                log.warning("Summary table %s: dropping columns not in the "
                            "existing header: %s", fname, dropped)
            fieldnames = existing
    with open(fname, "a", newline="") as handle:
        csv.DictWriter(handle, delimiter="\t", fieldnames=fieldnames,
                       extrasaction="ignore", restval="").writerow(kwargs)


class Timer:
    def __enter__(self):
        self.start = time.time()
        return self

    def __exit__(self, *args):
        self.elapsed = time.time() - self.start
