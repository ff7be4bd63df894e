"""--multirun sweep support (Hydra basic sweeper + basic launcher).

The reference inherits multirun from Hydra 1.x (@hydra.main,
/root/reference/train_with_gradient_descent.py:19) with sweep output dirs
from /root/reference/config/cfg.yaml:23-29 (outputs/<date>/<time>/<job_num>).
Its own launch scripts never use the flag, but the CLI surface supports it;
this repo mirrors it via config.expand_multirun + utils.hydra_main.
"""

import os
import subprocess
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parent.parent

from fullbatchtraining_tpu.config import expand_multirun, load_config  # noqa: E402
from fullbatchtraining_tpu.utils import hydra_main  # noqa: E402


def test_no_flag_is_single_job():
    is_multi, jobs = expand_multirun(["a=1,2", "b=x"])
    assert not is_multi
    # without the flag, commas are NOT sweeps (hydra passes the value through)
    assert jobs == [["a=1,2", "b=x"]]


def test_cartesian_product_order():
    is_multi, jobs = expand_multirun(["--multirun", "db=mysql,postgres",
                                      "schema=a,b,c"])
    assert is_multi
    # first override varies slowest, last fastest (Hydra basic sweeper)
    assert jobs == [
        ["db=mysql", "schema=a"], ["db=mysql", "schema=b"],
        ["db=mysql", "schema=c"], ["db=postgres", "schema=a"],
        ["db=postgres", "schema=b"], ["db=postgres", "schema=c"],
    ]


def test_short_flag_and_unswept_override():
    is_multi, jobs = expand_multirun(["-m", "hyp=fb1,gradreg", "seed=0"])
    assert is_multi
    assert jobs == [["hyp=fb1", "seed=0"], ["hyp=gradreg", "seed=0"]]


def test_brackets_and_quotes_do_not_split():
    _, jobs = expand_multirun(["-m", "key=[a,b],[c,d]", "q='x,y'"])
    assert jobs == [["key=[a,b]", "q='x,y'"], ["key=[c,d]", "q='x,y'"]]


def test_deletions_pass_through():
    _, jobs = expand_multirun(["-m", "~hyp.warmup", "seed=0,1"])
    assert jobs == [["~hyp.warmup", "seed=0"], ["~hyp.warmup", "seed=1"]]


def test_hydra_node_stripped_from_job_config():
    cfg = load_config(ROOT / "config")
    # cfg.yaml carries the reference's hydra block for file parity, but like
    # Hydra the composed job config must not expose it
    assert "hydra" not in cfg
    # ...and the block is LIVE, not dead config: its dir patterns (with
    # ${base_dir} interpolated) ride the private _hydra node job_startup uses
    assert cfg["_hydra"]["run.dir"] == "outputs/${now:%Y-%m-%d}/${now:%H-%M-%S.%f}"
    assert cfg["_hydra"]["job.chdir"] is True
    cfg2 = load_config(ROOT / "config", overrides=["base_dir=elsewhere"])
    assert cfg2["_hydra"]["sweep.dir"].startswith("elsewhere/")


def test_hydra_main_driver_sequences_jobs(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    calls = []

    def fake_main(overrides, job_num=None, sweep_stamp=None):
        calls.append((list(overrides), job_num))
        os.chdir(tmp_path / "elsewhere")  # driver must restore launch cwd
        return job_num

    (tmp_path / "elsewhere").mkdir()
    out = hydra_main(fake_main, argv=["--multirun", "seed=0,1"])
    assert out == [0, 1]
    assert calls == [(["seed=0"], 0), (["seed=1"], 1)]
    assert Path.cwd() == tmp_path
    # same stamp shared across the sweep: single run path untouched
    out = hydra_main(fake_main, argv=["seed=7"])
    assert calls[-1] == (["seed=7"], None) and out is None


def test_hydra_run_dir_override(tmp_path, monkeypatch):
    from fullbatchtraining_tpu.utils import job_startup

    monkeypatch.chdir(tmp_path)
    cfg = load_config(ROOT / "config",
                      overrides=["seed=0", "hydra.run.dir=custom/${now:%Y}run"])
    assert cfg["_hydra"]["run.dir"] == "custom/${now:%Y}run"
    cfg = job_startup(cfg, "t")
    assert "_hydra" not in cfg  # popped, like Hydra's stripped node
    import datetime
    year = datetime.datetime.now().strftime("%Y")
    assert Path.cwd() == (tmp_path / f"custom/{year}run").resolve()
    assert (Path.cwd() / "t.log").exists()


def test_hydra_dir_override_interpolates(tmp_path, monkeypatch):
    """CLI hydra.run.dir values resolve ${...} against the job config (Hydra
    semantics) instead of mkdir-ing a literal '${base_dir}' directory; the
    defaults-path resolution (cfg.yaml) is unaffected."""
    from fullbatchtraining_tpu.utils import job_startup

    monkeypatch.chdir(tmp_path)
    cfg = load_config(ROOT / "config",
                      overrides=["seed=0", "hydra.run.dir=${base_dir}/exp1"])
    assert cfg["_hydra"]["run.dir"] == "outputs/exp1"
    job_startup(cfg, "t")
    assert Path.cwd() == (tmp_path / "outputs" / "exp1").resolve()


def test_hydra_chdir_false_keeps_cwd(tmp_path, monkeypatch):
    from fullbatchtraining_tpu.utils import job_startup

    monkeypatch.chdir(tmp_path)
    cfg = load_config(ROOT / "config",
                      overrides=["seed=0", "hydra.run.dir=stay",
                                 "hydra.job.chdir=False"])
    job_startup(cfg, "t")
    assert Path.cwd() == tmp_path  # no chdir
    assert (tmp_path / "stay" / "t.log").exists()  # log still in run dir


def test_hydra_sweep_dir_override(tmp_path, monkeypatch):
    from fullbatchtraining_tpu.utils import job_startup

    monkeypatch.chdir(tmp_path)
    cfg = load_config(ROOT / "config",
                      overrides=["seed=0", "hydra.sweep.dir=sweep_here"])
    job_startup(cfg, "t", job_num=3)
    assert Path.cwd() == (tmp_path / "sweep_here" / "3").resolve()


@pytest.mark.slow
def test_multirun_cli_end_to_end(tmp_path):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    p = subprocess.run(
        [sys.executable, str(ROOT / "train_with_gradient_descent.py"),
         "--multirun", "model=linear", "data.size=64",
         "data.path=/tmp/__none__", "data.batch_size=32", "hyp.sub_batch=16",
         "data.augmentations_train=", "hyp=fb1", "hyp.steps=1",
         "hyp.warmup=0", "name=sweep", "seed=0,1"],
        cwd=tmp_path, env=env, capture_output=True, text=True, timeout=420)
    assert p.returncode == 0, f"multirun failed:\n{p.stdout}\n{p.stderr}"
    assert "[multirun] launching job #0 : " in p.stdout
    assert "[multirun] launching job #1 : " in p.stdout
    sweep_dirs = sorted((tmp_path / "outputs").glob("*/*/*"))
    names = sorted(d.name for d in sweep_dirs if d.is_dir())
    assert names == ["0", "1"], f"sweep layout wrong: {sweep_dirs}"
    for d in sweep_dirs:
        assert (d / "train_with_gradient_descent.log").exists()
