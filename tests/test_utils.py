"""Runtime-layer tests: summary tables, test-time flips, checkpoint format."""

import csv
import os

import numpy as np
import pytest

import jax

from fullbatchtraining_tpu.config import load_config
from fullbatchtraining_tpu.data import construct_databundle
from fullbatchtraining_tpu.models import construct_model, initialize_model
from fullbatchtraining_tpu.parallel import make_mesh
from fullbatchtraining_tpu.training.training import (
    make_train_functions,
    stage_validation,
    train,
)
from fullbatchtraining_tpu.utils import save_summary, save_to_table


def test_save_summary_tables(config_dir, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    cfg = load_config(config_dir, overrides=[
        "name=summary_test", "hyp.steps=4", "hyp.warmup=0",
        "impl.validate_every_nth_step=2"])
    cfg.original_cwd = str(tmp_path)
    stats = {
        "train_loss": [2.0, 1.5, 1.2, 1.0],
        "train_acc": [0.2, 0.4, 0.6, 0.7],
        "full_loss": [2.5, 1.9, 1.0, 1.4],  # min at block 2 -> second val block
        "valid_acc": [0.3, 0.65],
        "valid_loss": [2.0, 1.1],
        "grad_norm": [1.0, 0.9, 0.8, 0.7],
        "param_norm": [10.0] * 4,
        "train_time": [1.0, 1.1, 0.9, 1.0],
    }
    save_summary(cfg, stats, local_time=42.0)
    # per-step convergence table in cwd
    conv = tmp_path / "table_summary_test_convergence_results.csv"
    assert conv.exists()
    rows = list(csv.DictReader(open(conv), delimiter="\t"))
    assert len(rows) == 4
    assert float(rows[0]["train_loss"]) == 2.0
    # summary row in tables/
    summary_file = tmp_path / "tables" / "table_fb_CIFAR10_runs.csv"
    rows = list(csv.DictReader(open(summary_file), delimiter="\t"))
    assert len(rows) == 1
    row = rows[0]
    assert row["name"] == "summary_test"
    assert float(row["valid_acc"]) == 0.65
    # blocks of full_loss (validate_every=2): [2.5,1.9]=2.2, [1.0,1.4]=1.2 ->
    # min at block 1 -> valid_acc_at_min_loss = 0.65
    assert float(row["valid_acc_at_min_loss"]) == 0.65
    assert float(row["avg_step_time"]) == 1.0
    # appending a second run adds a row, keeps the header
    save_summary(cfg, stats, local_time=10.0)
    rows = list(csv.DictReader(open(summary_file), delimiter="\t"))
    assert len(rows) == 2


def test_save_to_table_dryrun_writes_nothing(tmp_path):
    save_to_table(str(tmp_path), "nothing", dryrun=True, a=1)
    assert not (tmp_path / "table_nothing.csv").exists()


def test_test_time_flips(config_dir):
    cfg = load_config(config_dir, overrides=[
        "model=linear", "data.size=64", "data.path=/tmp/__none__",
        "data.batch_size=8", "hyp.sub_batch=8", "hyp=fb1", "hyp.warmup=0",
        "seed=0", "hyp.test_time_flips=True"])
    mesh = make_mesh(cfg.impl.setup)
    bundle = construct_databundle(cfg.data, cfg.impl, cfg.hyp, seed=0)
    model = construct_model(cfg.model, bundle.channels, bundle.classes)
    fns = make_train_functions(model, bundle, mesh, cfg)
    variables = initialize_model(model, jax.random.key(0), bundle.pixels,
                                 bundle.channels)
    state = fns.init_state(variables)
    val = stage_validation(bundle, mesh, fns.num_devices, bundle.batch_size)
    m_flips = jax.device_get(fns.eval_step(state.params, state.batch_stats, *val))

    cfg2 = load_config(config_dir, overrides=[
        "model=linear", "data.size=64", "data.path=/tmp/__none__",
        "data.batch_size=8", "hyp.sub_batch=8", "hyp=fb1", "hyp.warmup=0", "seed=0"])
    fns2 = make_train_functions(model, bundle, mesh, cfg2)
    m_plain = jax.device_get(fns2.eval_step(state.params, state.batch_stats, *val))
    # flip-averaging changes the loss value (softmax-sum outputs)
    assert not np.isclose(m_flips["valid_loss"], m_plain["valid_loss"])
    assert 0.0 <= m_flips["valid_acc"] <= 1.0


def test_save_to_table_header_reconciliation(tmp_path):
    """Rows from heterogeneous runs align to the existing header (reference
    bug fixed: misaligned appends); new columns are dropped with a warning,
    missing ones become empty cells."""
    import csv

    from fullbatchtraining_tpu.utils import save_to_table

    save_to_table(str(tmp_path), "t", False, name="a", momentum=0.9, lr=0.1)
    save_to_table(str(tmp_path), "t", False, name="b", betas="0.9,0.999", lr=0.2)
    with open(tmp_path / "table_t.csv", newline="") as fh:
        rows = list(csv.DictReader(fh, delimiter="\t"))
    assert rows[0]["momentum"] == "0.9"
    assert rows[1]["momentum"] == ""        # missing -> empty, not misaligned
    assert rows[1]["lr"] == "0.2"
    assert "betas" not in rows[1]           # new column dropped, not shifted


def test_save_to_table_rewrites_header_on_empty_file(tmp_path):
    """A table file left empty by a kill between create and writeheader must
    get a fresh header (reference utils.py:196-205 recreates it on any read
    failure) — otherwise every later run mistakes the first data row for the
    header and writes empty cells forever."""
    import csv

    from fullbatchtraining_tpu.utils import save_to_table

    (tmp_path / "table_runs.csv").write_text("")  # the crash artifact
    save_to_table(str(tmp_path), "runs", dryrun=False, name="a", acc=0.5)
    save_to_table(str(tmp_path), "runs", dryrun=False, name="b", acc=0.7)
    with open(tmp_path / "table_runs.csv", newline="") as handle:
        rows = list(csv.reader(handle, delimiter="\t"))
    assert rows[0] == ["name", "acc"]
    assert [r[0] for r in rows[1:]] == ["a", "b"]
