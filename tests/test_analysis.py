"""Analysis subsystem tests: Welford numerics, directions, full analyze pass."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from collections import defaultdict

from fullbatchtraining_tpu.analysis.directions import (
    create_random_direction,
    set_parameter_offset,
    tree_norm,
)
from fullbatchtraining_tpu.analysis.welford import (
    welford_finalize,
    welford_init,
    welford_merge,
    welford_update,
)
from fullbatchtraining_tpu.config import load_config
from fullbatchtraining_tpu.data import construct_databundle
from fullbatchtraining_tpu.models import construct_model
from fullbatchtraining_tpu.parallel import make_mesh
from fullbatchtraining_tpu.training.training import train


def test_welford_matches_numpy():
    rng = np.random.default_rng(0)
    vectors = rng.normal(size=(20, 7)).astype(np.float32)
    state = welford_init(7)
    for v in vectors:
        state = welford_update(state, jnp.asarray(v))
    mean, var, std, norm, sqnorm = welford_finalize(state)
    np.testing.assert_allclose(np.asarray(mean), vectors.mean(0), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(var), vectors.var(0, ddof=1), rtol=1e-4)
    np.testing.assert_allclose(float(norm),
                               np.linalg.norm(vectors, axis=1).mean(), rtol=1e-5)


def test_welford_merge_exact():
    rng = np.random.default_rng(1)
    vectors = rng.normal(size=(30, 5)).astype(np.float32)
    full = welford_init(5)
    for v in vectors:
        full = welford_update(full, jnp.asarray(v))
    a, b = welford_init(5), welford_init(5)
    for v in vectors[:13]:
        a = welford_update(a, jnp.asarray(v))
    for v in vectors[13:]:
        b = welford_update(b, jnp.asarray(v))
    merged = welford_merge(a, b)
    for x, y in zip(welford_finalize(full)[:3], welford_finalize(merged)[:3]):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-4, atol=1e-6)


def test_random_direction_biasbn_and_filter_norm():
    params = {"conv": {"kernel": jnp.ones((3, 3, 4, 8)) * 2.0, "bias": jnp.ones(8)},
              "bn": {"scale": jnp.ones(8)}}
    d = create_random_direction(params, jax.random.key(0), norm="filter")
    assert np.all(np.asarray(d["conv"]["bias"]) == 0)  # biasbn rule
    assert np.all(np.asarray(d["bn"]["scale"]) == 0)
    # each output filter of the direction has the same norm as the weights'
    dk = np.asarray(d["conv"]["kernel"])
    wk = np.asarray(params["conv"]["kernel"])
    for i in range(8):
        np.testing.assert_allclose(np.linalg.norm(dk[..., i]),
                                   np.linalg.norm(wk[..., i]), rtol=1e-4)


def test_set_parameter_offset_2d():
    base = {"w": jnp.zeros(3)}
    dx = {"w": jnp.ones(3)}
    dy = {"w": jnp.full(3, 2.0)}
    out = set_parameter_offset(base, dx, 0.5, dy, 0.25)
    np.testing.assert_allclose(np.asarray(out["w"]), 1.0)


@pytest.mark.slow  # compile-heavy on the 1-core host; semantics also covered by faster siblings
def test_full_analyze_pass(config_dir):
    cfg = load_config(config_dir, overrides=[
        "model=linear", "data.size=64", "data.path=/tmp/__none__",
        "data.batch_size=8", "hyp.sub_batch=8", "hyp=fb1", "hyp.steps=2",
        "hyp.warmup=0", "seed=0", "impl.validate_every_nth_step=10",
        "analysis=full", "analysis.compute_gradient_SNR=True",
        "analysis.compute_gradient_noise_scale=True",
        "analysis.check_every_nth_step=1"])
    mesh = make_mesh(cfg.impl.setup)
    bundle = construct_databundle(cfg.data, cfg.impl, cfg.hyp, seed=0)
    model = construct_model(cfg.model, bundle.channels, bundle.classes)
    state, stats = train(model, bundle, mesh, cfg)
    assert len(stats["analysis_param_norm"]) == 2
    assert len(stats["analysis_grad_norm"]) == 2
    assert len(stats["analysis_momentum_dist"]) == 2
    assert stats["analysis_grad_SNR"][-1] > 0
    assert "analysis_grad_noise_scale" in stats
    assert "analysis_grad_norm_0" in stats  # per-batch norms recorded


def test_analysis_streamed_equals_resident(config_dir):
    """Forcing a 1-byte HBM budget streams the per-chunk gradient sweep in
    1-block segments; the Welford carry threads segment to segment, so every
    SNR / noise-scale / per-batch-norm statistic is BITWISE equal to the
    resident sweep (any-scale analysis, reference analysis.py:44-97)."""
    from fullbatchtraining_tpu.analysis.analysis import analyze
    from fullbatchtraining_tpu.models import initialize_model
    from fullbatchtraining_tpu.training.training import make_train_functions

    base = ["model=linear", "data.size=128", "data.path=/tmp/__none__",
            "data.batch_size=4", "hyp.sub_batch=4", "hyp=fb1", "hyp.warmup=0",
            "seed=0", "analysis=full", "analysis.compute_gradient_SNR=True",
            "analysis.compute_gradient_noise_scale=True",
            "analysis.measure_param_norm=False",
            "analysis.measure_grad_norm=False", "analysis.check_momentum=False"]

    def run(extra):
        cfg = load_config(config_dir, overrides=base + extra)
        mesh = make_mesh(cfg.impl.setup)
        bundle = construct_databundle(cfg.data, cfg.impl, cfg.hyp, seed=0)
        model = construct_model(cfg.model, bundle.channels, bundle.classes)
        fns = make_train_functions(model, bundle, mesh, cfg)
        variables = initialize_model(model, jax.random.key(0), bundle.pixels,
                                     bundle.channels)
        state = fns.init_state(variables)
        return fns, analyze(model, bundle, mesh, cfg, fns, state,
                            defaultdict(list))

    _, resident = run([])
    fns_s, streamed = run(["impl.hbm_epoch_max_bytes=1"])
    assert fns_s.streamed  # the forced budget must actually engage streaming
    assert resident.keys() == streamed.keys()
    assert any(k.startswith("analysis_grad_norm_") for k in resident)
    for key in resident:
        assert resident[key] == streamed[key], key


def test_per_batch_norms_in_dataset_order(config_dir):
    """analysis_grad_norm_{i} must be the i-th DATASET batch on any mesh:
    the (blocks, devices, chunks) layout is flattened back to dataset order
    (block-major), not device-major, matching the reference's in-order
    DataLoader walk (analysis.py:44-97). The single-device run — whose order
    is trivially correct and oracle-verified — is the yardstick."""
    from fullbatchtraining_tpu.analysis.analysis import analyze
    from fullbatchtraining_tpu.models import initialize_model
    from fullbatchtraining_tpu.training.training import make_train_functions

    base = ["model=linear", "data.size=128", "data.path=/tmp/__none__",
            "data.batch_size=4", "hyp.sub_batch=4", "hyp=fb1", "hyp.warmup=0",
            "seed=0", "analysis=full",
            "analysis.record_gradient_norm_per_batch=True",
            "analysis.measure_param_norm=False",
            "analysis.measure_grad_norm=False", "analysis.check_momentum=False"]
    cfg = load_config(config_dir, overrides=base)
    bundle = construct_databundle(cfg.data, cfg.impl, cfg.hyp, seed=0)
    model = construct_model(cfg.model, bundle.channels, bundle.classes)
    variables = None
    norms = {}
    for n_dev in (1, 8):
        mesh = make_mesh(cfg.impl.setup, devices=np.asarray(jax.devices()[:n_dev]))
        fns = make_train_functions(model, bundle, mesh, cfg)
        if variables is None:
            variables = initialize_model(model, jax.random.key(0),
                                         bundle.pixels, bundle.channels)
        state = fns.init_state(variables)
        stats = analyze(model, bundle, mesh, cfg, fns, state, defaultdict(list))
        keys = sorted((k for k in stats if k.startswith("analysis_grad_norm_")),
                      key=lambda k: int(k.rsplit("_", 1)[1]))
        # undo the reference-faithful 1/num_blocks loss scale (num_blocks is
        # the per-device block count, mesh-dependent exactly as the
        # reference's DDP per-rank len(dataloader) is — analysis.py:46)
        num_blocks = 128 // (4 * n_dev)
        norms[n_dev] = np.asarray([stats[k][-1] for k in keys]) * num_blocks
    assert len(norms[1]) == len(norms[8]) == 32
    np.testing.assert_allclose(norms[8], norms[1], rtol=1e-5)


@pytest.mark.slow  # compile-heavy on the 1-core host; semantics also covered by faster siblings
def test_flatness(config_dir):
    cfg = load_config(config_dir, overrides=[
        "model=linear", "data.size=64", "data.path=/tmp/__none__",
        "data.batch_size=8", "hyp.sub_batch=8", "hyp=fb1", "hyp.steps=1",
        "hyp.warmup=0", "seed=0", "impl.validate_every_nth_step=10",
        "analysis=full", "analysis.compute_flatness=True",
        "analysis.flatness_threshold=3.0", "analysis.flatness_step_size=0.5"])
    mesh = make_mesh(cfg.impl.setup)
    bundle = construct_databundle(cfg.data, cfg.impl, cfg.hyp, seed=0)
    model = construct_model(cfg.model, bundle.channels, bundle.classes)
    state, stats = train(model, bundle, mesh, cfg)
    assert "analysis_empirical_flatness" in stats
    assert stats["analysis_empirical_flatness"][-1] >= 0


def test_perturb2threshold_stops_on_nan_loss():
    """A NaN loss (logits overflowed) must stop the walk like a threshold
    crossing: `loss > threshold` is False for NaN, which would burn all
    max_steps full-dataset evaluations and record a bogus flatness."""
    import jax
    import jax.numpy as jnp

    from fullbatchtraining_tpu.analysis.directions import perturb2threshold

    params = {"w": jnp.ones((4, 4))}
    calls = []

    def loss_fn(p):
        calls.append(1)
        return jnp.asarray(float("nan") if len(calls) > 2 else 0.0)

    dist, counter = perturb2threshold(params, loss_fn, jax.random.key(0),
                                      step_size=0.1, threshold=1.0,
                                      max_steps=50)
    assert counter == 2  # stopped at the first NaN, not at max_steps
