"""Loss-landscape crunch tests: vmapped surface, resume, plotting."""

import numpy as np
import pytest

import jax

from fullbatchtraining_tpu.config import load_config
from fullbatchtraining_tpu.data import construct_databundle
from fullbatchtraining_tpu.models import construct_model, initialize_model
from fullbatchtraining_tpu.parallel import make_mesh
from fullbatchtraining_tpu.training.training import make_train_functions
from fullbatchtraining_tpu.visualization import crunch, load_surface, plot_1d_loss_err_row  # noqa: F401


def _setup(config_dir, tmp_path, extra=()):
    cfg = load_config(config_dir, overrides=[
        "model=linear", "data.size=64", "data.path=/tmp/__none__",
        "data.batch_size=8", "hyp.sub_batch=8", "hyp=fb1", "hyp.warmup=0",
        "seed=0", "viz=1d", "viz.coordinates.x.num=5", "viz.vmap_positions=3",
        "impl.checkpoint.name=crunch_test", *extra])
    cfg.original_cwd = str(tmp_path)
    mesh = make_mesh(cfg.impl.setup)
    bundle = construct_databundle(cfg.data, cfg.impl, cfg.hyp, seed=0)
    model = construct_model(cfg.model, bundle.channels, bundle.classes)
    fns = make_train_functions(model, bundle, mesh, cfg)
    variables = initialize_model(model, jax.random.key(0), bundle.pixels,
                                 bundle.channels)
    state = fns.init_state(variables)
    return cfg, mesh, bundle, model, fns, state


def test_crunch_1d_surface(config_dir, tmp_path):
    cfg, mesh, bundle, model, fns, state = _setup(config_dir, tmp_path)
    store, positions = crunch(model, bundle, mesh, cfg, fns, state)
    assert len(positions) == 5
    results = store.results()
    assert len(results) == 5
    landscape = load_surface(store.path, positions)
    assert np.isfinite(landscape["train_loss"]).all()
    # center position (x=0) evaluates the unperturbed model: minimum-ish loss
    center = landscape["train_loss"][2]
    assert center <= landscape["train_loss"].max()
    # accuracy in [0, 1]
    assert (landscape["train_acc"] >= 0).all() and (landscape["train_acc"] <= 1).all()


def test_crunch_resume_skips_done(config_dir, tmp_path):
    cfg, mesh, bundle, model, fns, state = _setup(config_dir, tmp_path)
    store, positions = crunch(model, bundle, mesh, cfg, fns, state)
    first = store.results()
    # second run must reuse every position (same values, no recompute drift)
    store2, _ = crunch(model, bundle, mesh, cfg, fns, state)
    second = store2.results()
    assert first.keys() == second.keys()
    for key in first:
        assert first[key] == second[key]


def test_crunch_rejects_mismatched_model(config_dir, tmp_path):
    cfg, mesh, bundle, model, fns, state = _setup(config_dir, tmp_path)
    crunch(model, bundle, mesh, cfg, fns, state)
    # different params -> stored surface belongs to another model state
    variables = initialize_model(model, jax.random.key(99), bundle.pixels,
                                 bundle.channels)
    other = fns.init_state(variables)
    with pytest.raises(ValueError, match="different model"):
        crunch(model, bundle, mesh, cfg, fns, other)


def test_crunch_with_gradreg_full_loss(config_dir, tmp_path):
    cfg, mesh, bundle, model, fns, state = _setup(
        config_dir, tmp_path, extra=["hyp.grad_reg.block_strength=0.5"])
    store, positions = crunch(model, bundle, mesh, cfg, fns, state)
    landscape = load_surface(store.path, positions)
    # full loss includes the grad-norm penalty -> strictly above train loss
    assert (landscape["full_loss"] >= landscape["train_loss"] - 1e-6).all()


def test_crunch_rejects_acc_strength(config_dir, tmp_path):
    cfg, mesh, bundle, model, fns, state = _setup(
        config_dir, tmp_path,
        extra=["hyp.grad_reg.block_strength=0.5", "hyp.grad_reg.acc_strength=0.1"])
    with pytest.raises(ValueError, match="acc_strength"):
        crunch(model, bundle, mesh, cfg, fns, state)


def test_plot_1d(config_dir, tmp_path):
    cfg, mesh, bundle, model, fns, state = _setup(config_dir, tmp_path)
    store, positions = crunch(model, bundle, mesh, cfg, fns, state)
    xcoords = np.linspace(-1, 1, 5)
    fig, landscape = plot_1d_loss_err_row(
        str(store.path.parent), [store.path.name], ["test"], xcoords, positions)
    out = tmp_path / "plot.png"
    fig.savefig(out)
    assert out.exists() and out.stat().st_size > 0


def test_plot_2d_contour(config_dir, tmp_path):
    cfg, mesh, bundle, model, fns, state = _setup(
        config_dir, tmp_path,
        extra=["viz=2d", "viz.coordinates.x.num=3", "viz.coordinates.y.num=3",
               "viz.vmap_positions=4"])
    store, positions = crunch(model, bundle, mesh, cfg, fns, state)
    from fullbatchtraining_tpu.visualization.plotting import plot_2d_contour

    xcoords = np.linspace(-1, 1, 3)
    ycoords = np.linspace(-1, 1, 3)
    fig, landscape = plot_2d_contour(store.path, xcoords, ycoords)
    out = tmp_path / "surface2d.png"
    fig.savefig(out)
    assert out.exists() and out.stat().st_size > 0
    assert np.isfinite(landscape["train_loss"]).all()


def test_crunch_streamed_equals_resident(config_dir, tmp_path):
    """Forcing a 1-byte HBM budget streams the surface sweep in 1-block
    segments; the carry-threaded scan init preserves addition order, so the
    streamed surface is BITWISE equal to the resident one (any-scale crunch,
    reference crunch.py:113-136)."""
    extra = ["data.size=128", "data.batch_size=4", "hyp.sub_batch=4",
             "hyp.grad_reg.block_strength=0.5"]  # cover the gn-sum stream too
    (tmp_path / "res").mkdir()
    (tmp_path / "str").mkdir()
    cfg, mesh, bundle, model, fns, state = _setup(
        config_dir, tmp_path / "res", extra=extra)
    store_r, positions = crunch(model, bundle, mesh, cfg, fns, state)
    cfg2, mesh2, bundle2, model2, fns2, state2 = _setup(
        config_dir, tmp_path / "str",
        extra=extra + ["impl.hbm_epoch_max_bytes=1"])
    assert fns2.streamed  # the forced budget must actually engage streaming
    store_s, _ = crunch(model2, bundle2, mesh2, cfg2, fns2, state2)
    res_r, res_s = store_r.results(), store_s.results()
    assert res_r.keys() == res_s.keys() and len(res_r) == len(positions)
    for key in res_r:
        for field in ("train_loss", "train_acc", "full_loss"):
            assert res_r[key][field] == res_s[key][field], (key, field)


def test_crunch_claims_enable_work_sharing(config_dir, tmp_path):
    """A fresh claim makes other jobs skip the position; results override
    claims; stale claims are retried (reference placeholder rows)."""
    from fullbatchtraining_tpu.visualization.database import SurfaceStore

    store = SurfaceStore(tmp_path / "shared")
    positions = [(0.0, 0.0), (0.5, 0.0), (1.0, 0.0)]
    store.claim(positions[:1])
    assert store.pending(positions) == positions[1:]
    # a result for a claimed position overrides the claim
    store.record(positions[0], train_loss=1.0, train_acc=0.5, full_loss=1.1)
    assert store.results()["0.000000,0.000000"]["train_loss"] == 1.0
    # stale claims are retried
    store.claim(positions[1:2])
    assert store.pending(positions[1:2], ttl=-1.0) == positions[1:2]


def test_surface_store_rejects_other_architecture(tmp_path):
    """A stored snapshot from a DIFFERENT architecture under the same
    database name must read as 'does not match' (None -> crunch's clean
    ValueError), not propagate a flax restore traceback; and create() is
    atomic, so a torn sidecar can never wedge the store."""
    import jax
    import jax.numpy as jnp

    from fullbatchtraining_tpu.visualization.database import SurfaceStore

    store = SurfaceStore(tmp_path / "s.directions.msgpack")
    small = {"w": jnp.ones((2, 2))}
    store.create(small, small, small)
    assert store.verify_model(small) is not None
    other_tree = {"w": jnp.ones((2, 2)), "extra": jnp.zeros((3,))}
    assert store.verify_model(other_tree) is None  # tree mismatch, no raise
    other_shape = {"w": jnp.ones((4, 4))}
    assert store.verify_model(other_shape) is None
    assert not list(tmp_path.glob("*.tmp"))  # atomic create left no temps
