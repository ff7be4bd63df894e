"""Installed-package smoke test: what actually ships in a wheel works.

Builds the wheel once per session (setuptools, no network), unpacks it to a
temp dir, and imports/composes from THERE with the repo root scrubbed from
sys.path — catching missing subpackages, missing package data, and
repo-layout assumptions that `import fullbatchtraining_tpu` from the
checkout can never see. (Reference parity: setup.cfg packages=find: ships
`fullbatch` only; the config tree stays a repo artifact passed by path in
both frameworks.)
"""

import subprocess
import sys
import zipfile
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parent.parent

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def wheel_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("wheel")
    build = subprocess.run(
        [sys.executable, "-m", "pip", "wheel", "--no-deps",
         "--no-build-isolation", "-w", str(out), str(ROOT)],
        capture_output=True, text=True, timeout=300)
    assert build.returncode == 0, build.stdout + build.stderr
    wheels = list(out.glob("fullbatchtraining_tpu-*.whl"))
    assert len(wheels) == 1, wheels
    site = out / "site"
    with zipfile.ZipFile(wheels[0]) as zf:
        zf.extractall(site)
    return site


def test_wheel_ships_every_subpackage_and_native_sources(wheel_dir):
    pkg = wheel_dir / "fullbatchtraining_tpu"
    for sub in ["models", "data", "training", "training/opt", "parallel",
                "analysis", "visualization", "ops"]:
        assert (pkg / sub / "__init__.py").exists(), f"missing subpackage {sub}"
    # the C++ engines ship as package data (build-on-first-use)
    assert (pkg / "_native_src" / "fbt_data.cpp").stat().st_size > 1000
    assert (pkg / "_native_src" / "fbt_jpeg.cpp").stat().st_size > 1000


def test_wheel_imports_and_composes_outside_repo(wheel_dir, tmp_path):
    """Run the library surface from the INSTALLED tree, from a foreign cwd,
    with the repo root removed from sys.path."""
    script = tmp_path / "smoke.py"
    script.write_text(f"""
import sys
sys.path = [p for p in sys.path if p not in ("", ".", {str(ROOT)!r})]
sys.path.insert(0, {str(wheel_dir)!r})
import os
os.environ.setdefault("FBT_NO_DOWNLOAD", "1")
import jax
jax.config.update("jax_platforms", "cpu")

import fullbatchtraining_tpu
assert fullbatchtraining_tpu.__file__.startswith({str(wheel_dir)!r}), \\
    fullbatchtraining_tpu.__file__
from fullbatchtraining_tpu.config import load_config
from fullbatchtraining_tpu.models import construct_model, initialize_model
from fullbatchtraining_tpu.data import construct_databundle
from fullbatchtraining_tpu.data.native import _find_src

# config tree is a by-path artifact (reference parity)
cfg = load_config({str(ROOT / "config")!r}, overrides=[
    "model=resnet20", "model.width=4", "data.size=16",
    "data.path=/tmp/__pkg_smoke_none__", "data.batch_size=8",
    "hyp.sub_batch=8"])
assert cfg.hyp.optim.lr == 0.1, cfg.hyp.optim.lr
bundle = construct_databundle(cfg.data, cfg.impl, cfg.hyp, seed=0)
model = construct_model(cfg.model, bundle.channels, bundle.classes)
variables = initialize_model(model, jax.random.key(0), bundle.pixels,
                             bundle.channels)
out = model.apply(variables, jax.numpy.zeros((2, 32, 32, 3)), train=False)
assert out.shape == (2, 10), out.shape
# the installed tree resolves its own packaged C++ sources
assert _find_src("fbt_data.cpp").exists()
print("PACKAGED-SMOKE-OK")
""")
    run = subprocess.run([sys.executable, str(script)], cwd=tmp_path,
                         capture_output=True, text=True, timeout=300)
    assert run.returncode == 0, run.stdout + run.stderr
    assert "PACKAGED-SMOKE-OK" in run.stdout
