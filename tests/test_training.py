"""Training-core integration tests on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fullbatchtraining_tpu.config import load_config
from fullbatchtraining_tpu.data import construct_databundle
from fullbatchtraining_tpu.models import construct_model, initialize_model
from fullbatchtraining_tpu.parallel import make_mesh
from fullbatchtraining_tpu.training.training import (
    make_train_functions,
    stage_epoch,
    train,
)

BASE = ["model=linear", "data.size=128", "data.path=/tmp/__none__",
        "data.batch_size=16", "hyp.sub_batch=16", "hyp=fb1", "hyp.steps=2",
        "hyp.warmup=0", "seed=0", "impl.validate_every_nth_step=10"]


def _setup(config_dir, overrides):
    cfg = load_config(config_dir, overrides=BASE + list(overrides))
    mesh = make_mesh(cfg.impl.setup)
    bundle = construct_databundle(cfg.data, cfg.impl, cfg.hyp, seed=0)
    model = construct_model(cfg.model, bundle.channels, bundle.classes)
    return cfg, mesh, bundle, model


def test_full_batch_learns(config_dir):
    cfg, mesh, bundle, model = _setup(config_dir, [
        "hyp.steps=30", "hyp.optim.lr=0.02", "hyp.optim.weight_decay=0",
        "data.augmentations_train=", "impl.validate_every_nth_step=29"])
    state, stats = train(model, bundle, mesh, cfg)
    assert stats["train_acc"][-1] > 0.95
    assert stats["valid_acc"][-1] > 0.9


def test_sharding_invariance(config_dir):
    """The accumulated full gradient must not depend on the mesh size
    (reference parity: N GPUs vs 1 GPU produce the same mean gradient)."""
    results = {}
    for n_dev in (1, 8):
        # batch 8 -> 2 blocks on 8 devices: multiple chunks per device, the
        # regime where the reference's counter formula was biased (fixed).
        cfg, _, bundle, model = _setup(config_dir, [
            "data.augmentations_train=", "data.batch_size=8", "hyp.sub_batch=8"])
        mesh = make_mesh(cfg.impl.setup, devices=np.asarray(jax.devices()[:n_dev]))
        fns = make_train_functions(model, bundle, mesh, cfg)
        variables = initialize_model(model, jax.random.key(0), bundle.pixels,
                                     bundle.channels)
        state = fns.init_state(variables)
        images, labels = stage_epoch(bundle, fns, mesh, cfg, 0, {})
        grads, _, metrics = fns.gradient_eval(state, images, labels)
        results[n_dev] = (jax.device_get(grads), float(metrics["train_loss"]))
    g1, l1 = results[1]
    g8, l8 = results[8]
    np.testing.assert_allclose(l1, l8, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_streaming_mean_equals_direct_mean(config_dir):
    """The stable streaming accumulation equals the plain mean over chunks —
    including with multiple chunks per device (reference counter bug fixed)."""
    cfg, mesh, bundle, model = _setup(config_dir, [
        "data.augmentations_train=", "data.batch_size=4", "hyp.sub_batch=4"])
    fns = make_train_functions(model, bundle, mesh, cfg)
    variables = initialize_model(model, jax.random.key(0), bundle.pixels,
                                 bundle.channels)
    state = fns.init_state(variables)
    images, labels = stage_epoch(bundle, fns, mesh, cfg, 0, {})
    grads, _, _ = fns.gradient_eval(state, images, labels, with_modifiers=False)

    # direct: one grad over the whole dataset (loss is a mean -> same value)
    from fullbatchtraining_tpu.data.augmentations import normalize
    from fullbatchtraining_tpu.models.modules import get_loss_fn

    x = normalize(jnp.asarray(bundle.train.images), bundle.mean, bundle.std)
    y = jnp.asarray(bundle.train.labels)
    criterion = get_loss_fn(cfg.hyp)

    def loss_fn(p):
        logits = model.apply({"params": p}, x, train=False)
        return criterion(logits, y)

    direct = jax.grad(loss_fn)(state.params)
    for a, b in zip(jax.tree.leaves(grads), jax.tree.leaves(direct)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_grad_clip_bounds_gradient(config_dir):
    cfg, mesh, bundle, model = _setup(config_dir, ["hyp.grad_clip=0.01"])
    fns = make_train_functions(model, bundle, mesh, cfg)
    variables = initialize_model(model, jax.random.key(0), bundle.pixels,
                                 bundle.channels)
    state = fns.init_state(variables)
    images, labels = stage_epoch(bundle, fns, mesh, cfg, 0, {})
    grads, _, metrics = fns.gradient_eval(state, images, labels)
    total = np.sqrt(sum(float(jnp.sum(g**2)) for g in jax.tree.leaves(grads)))
    assert total <= 0.0101
    assert float(metrics["clipped_step"]) == 1.0
    assert float(metrics["preclip_gradnorm"]) > 0.01


def test_ema_tracks_params(config_dir):
    cfg, mesh, bundle, model = _setup(config_dir, [
        "hyp.evaluate_ema=True", "hyp.eval_ema_momentum=0.5", "hyp.steps=3"])
    state, stats = train(model, bundle, mesh, cfg)
    ema = np.concatenate([np.asarray(v).ravel() for v in jax.tree.leaves(state.ema_params)])
    cur = np.concatenate([np.asarray(v).ravel() for v in jax.tree.leaves(state.params)])
    assert not np.allclose(ema, cur)  # EMA lags behind


def test_switch_stochastic(config_dir):
    cfg, mesh, bundle, model = _setup(config_dir, [
        "hyp.steps=3", "hyp.train_switch_stochastic=1"])
    # fb1: train_stochastic=False -> full-batch step 0, stochastic from the
    # switch step on ("switch after this many steps", yaml intent; the
    # reference's latching-inversion bug is documented in training.py)
    state, stats = train(model, bundle, mesh, cfg)
    assert len(stats["train_loss"]) == 3


def test_stochastic_shuffle_and_semi(config_dir, tmp_path):
    cfg, mesh, bundle, model = _setup(config_dir, [
        "hyp=base_sgd", "hyp.steps=2", "data.db=baked",
        f"data.db.path={tmp_path}/db", "data.db.rounds=2",
        "hyp.train_semi_stochastic=True"])
    state, stats = train(model, bundle, mesh, cfg)
    assert np.isfinite(stats["train_loss"]).all()


def test_dryrun_single_block(config_dir, tmp_path):
    cfg, mesh, bundle, model = _setup(config_dir, ["dryrun=True", "hyp.steps=99"])
    state, stats = train(model, bundle, mesh, cfg)
    assert len(stats["train_loss"]) == 1  # dryrun breaks after one step


def test_divergence_stops_training(config_dir):
    cfg, mesh, bundle, model = _setup(config_dir, [
        "hyp.steps=50", "hyp.optim.lr=1e6"])  # guaranteed blow-up
    state, stats = train(model, bundle, mesh, cfg)
    assert len(stats["train_loss"]) < 50


def test_stop_at_full_training_accuracy(config_dir):
    cfg, mesh, bundle, model = _setup(config_dir, [
        "hyp.steps=200", "hyp.optim.lr=0.05", "hyp.optim.weight_decay=0",
        "data.augmentations_train=", "hyp.stop_at_full_training_accuracy=2"])
    state, stats = train(model, bundle, mesh, cfg)
    assert len(stats["train_loss"]) < 200
    assert stats["train_acc"][-1] == 1.0


def test_gradreg_sharding_invariance(config_dir):
    """Finite-difference grad-reg under 8-device sharding matches 1-device.

    Per-chunk regularization depends only on local chunk data, so identical
    chunking must give identical regularized gradients regardless of mesh."""
    results = {}
    for n_dev in (1, 8):
        cfg, _, bundle, model = _setup(config_dir, [
            "data.augmentations_train=", "hyp.grad_reg.block_strength=0.5",
            "hyp.optim.lr=0.4", "hyp.warmup=0"])
        mesh = make_mesh(cfg.impl.setup, devices=np.asarray(jax.devices()[:n_dev]))
        fns = make_train_functions(model, bundle, mesh, cfg)
        variables = initialize_model(model, jax.random.key(0), bundle.pixels,
                                     bundle.channels)
        state = fns.init_state(variables)
        images, labels = stage_epoch(bundle, fns, mesh, cfg, 0, {})
        grads, _, _ = fns.gradient_eval(state, images, labels, with_modifiers=False)
        results[n_dev] = jax.device_get(grads)
    for a, b in zip(jax.tree.leaves(results[1]), jax.tree.leaves(results[8])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-5)


def test_checkpoint_resume_is_equivalent(config_dir, tmp_path, monkeypatch):
    """train(4 steps) == train(2) -> save -> load -> train(2 more), exactly."""
    monkeypatch.chdir(tmp_path)

    def run(steps, ckpt=None, resume=False):
        # constant lr: the cosine schedule depends on hyp.steps, which differs
        # between the 2-step and 4-step runs by construction
        overrides = [f"hyp.steps={steps}", "data.augmentations_train=",
                     "hyp.optim.lr=0.05", "hyp.scheduler=none"]
        if ckpt:
            overrides += [f"impl.checkpoint.name={ckpt}",
                          "impl.checkpoint.save_every_nth_step=1"]
        cfg, mesh, bundle, model = _setup(config_dir, overrides)
        cfg.original_cwd = str(tmp_path)
        return train(model, bundle, mesh, cfg)

    state_straight, stats_straight = run(4)
    state_a, _ = run(2, ckpt="resume.ckpt")
    state_b, stats_b = run(4, ckpt="resume.ckpt")  # resumes from step 2
    assert int(state_b.step) == 4
    for a, b in zip(jax.tree.leaves(state_straight.params),
                    jax.tree.leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_async_checkpoint_save(config_dir, tmp_path, monkeypatch):
    """impl.checkpoint.async_save writes identical bytes to the sync path and
    the snapshot is donation-safe: overwriting the live state through a
    donating jit right after the save must not leak into the file. train()
    guarantees the final checkpoint is durable on return."""
    from fullbatchtraining_tpu.training.training import make_train_functions
    from fullbatchtraining_tpu.training.utils import (load_checkpoint,
                                                      save_checkpoint,
                                                      wait_for_async_checkpoints)

    cfg, mesh, bundle, model = _setup(config_dir, ["data.augmentations_train="])
    fns = make_train_functions(model, bundle, mesh, cfg)
    variables = initialize_model(model, jax.random.key(0), bundle.pixels,
                                 bundle.channels)
    state = fns.init_state(variables)

    cfg.impl.checkpoint.async_save = False
    sync_file = save_checkpoint(state, cfg, file=tmp_path / "sync.msgpack")
    cfg.impl.checkpoint.async_save = True
    async_file = save_checkpoint(state, cfg, file=tmp_path / "async.msgpack")
    # donate/overwrite the live buffers immediately after the async save
    bump = jax.jit(lambda s: jax.tree.map(lambda x: x + 1, s), donate_argnums=0)
    mutated = bump(state)
    jax.block_until_ready(jax.tree.leaves(mutated.params)[0])
    wait_for_async_checkpoints()
    assert async_file.read_bytes() == sync_file.read_bytes()

    # end-to-end through train(): the final async save is durable on return.
    # Streamed mode on purpose: the checkpoint writer thread must coexist
    # with the streamed path's prefetch threading.
    monkeypatch.chdir(tmp_path)
    cfg, mesh, bundle, model = _setup(config_dir, [
        "hyp.steps=2", "data.augmentations_train=",
        "impl.hbm_epoch_max_bytes=1", "impl.stream_segment_blocks=2",
        "impl.checkpoint.name=async.ckpt", "impl.checkpoint.async_save=True"])
    cfg.original_cwd = str(tmp_path)
    final, _ = train(model, bundle, mesh, cfg)
    restored, step = load_checkpoint(final, cfg, max_steps=10)
    assert step == 2
    for a, b in zip(jax.tree.leaves(final.params),
                    jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_training_is_deterministic(config_dir):
    """Identical seeds produce identical loss traces (PRNG-keyed augmentation)."""
    traces = []
    for _ in range(2):
        cfg, mesh, bundle, model = _setup(config_dir, ["hyp.steps=3", "seed=11"])
        state, stats = train(model, bundle, mesh, cfg)
        traces.append(stats["train_loss"])
    assert traces[0] == traces[1]


def test_stochastic_layers_get_rngs(config_dir):
    """Models with Dropout/StochDepth train without InvalidRngError
    (regression: forward() must thread stochastic-layer rngs)."""
    from flax import linen as nn

    class DropoutNet(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = True):
            x = x.reshape(x.shape[0], -1)
            x = nn.Dropout(0.3, deterministic=not train)(x)
            return nn.Dense(10)(x)

    cfg, mesh, bundle, _ = _setup(config_dir, ["data.augmentations_train="])
    model = DropoutNet()
    fns = make_train_functions(model, bundle, mesh, cfg)
    variables = initialize_model(model, jax.random.key(0), bundle.pixels,
                                 bundle.channels)
    state = fns.init_state(variables)
    images, labels = stage_epoch(bundle, fns, mesh, cfg, 0, {})
    _, _, metrics = fns.gradient_eval(state, images, labels)
    assert np.isfinite(float(metrics["train_loss"]))


def test_stochastic_line_search(config_dir):
    """Line-search optimizers run per-block closures in stochastic mode
    (reference training.py:241-286)."""
    cfg, mesh, bundle, model = _setup(config_dir, [
        "hyp=base_sgd", "hyp.steps=2", "hyp.optim.line_search=wolfe",
        "data.batch_size=8"])  # 2 blocks: exercises the per-block loop
    state, stats = train(model, bundle, mesh, cfg)
    assert int(state.step) == 2
    assert np.isfinite(stats["train_loss"]).all()


def test_device_shuffle_matches_host_shuffle(config_dir):
    """HBM-resident device shuffle stages bitwise the same epoch as the host
    gather path (VERDICT round 1, item 2), so gradients are identical too."""
    cfg, mesh, bundle, model = _setup(config_dir, [
        "hyp.shuffle=True", "data.augmentations_train="])
    fns = make_train_functions(model, bundle, mesh, cfg)
    for step in (0, 3):
        dev = stage_epoch(bundle, fns, mesh, cfg, step, {})
        cfg.impl.device_shuffle = False
        host = stage_epoch(bundle, fns, mesh, cfg, step, {})
        cfg.impl.device_shuffle = True
        for a, b in zip(dev, host):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_device_shuffle_with_replacement(config_dir):
    cfg, mesh, bundle, model = _setup(config_dir, [
        "hyp.shuffle=True", "hyp.sample_with_replacement=True",
        "data.augmentations_train="])
    fns = make_train_functions(model, bundle, mesh, cfg)
    dev = stage_epoch(bundle, fns, mesh, cfg, 1, {})
    cfg.impl.device_shuffle = False
    host = stage_epoch(bundle, fns, mesh, cfg, 1, {})
    for a, b in zip(dev, host):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_semi_stochastic_resident_matches_host(config_dir, tmp_path):
    """HBM-resident baked rounds: the on-device round pick + shuffle stages
    bitwise the same epoch as the host re-upload path, for both shuffle
    settings and across the round wrap (step % rounds)."""
    cfg, mesh, bundle, model = _setup(config_dir, [
        "hyp=base_sgd", "data.db=baked", f"data.db.path={tmp_path}/db",
        "data.db.rounds=2", "hyp.train_semi_stochastic=True"])
    for shuffle in (True, False):
        cfg.hyp.shuffle = shuffle
        fns = make_train_functions(model, bundle, mesh, cfg)
        for step in (0, 1, 3):  # round 1, round 0 again via the wrap
            dev = stage_epoch(bundle, fns, mesh, cfg, step, {})
            cfg.impl.device_shuffle = False
            host = stage_epoch(bundle, fns, mesh, cfg, step, {})
            cfg.impl.device_shuffle = True
            for a, b in zip(dev, host):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def _tiny_bn_model():
    from flax import linen as nn

    from fullbatchtraining_tpu.models.layers import BatchNorm2d

    class TinyBN(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = True):
            x = nn.Conv(4, (3, 3), use_bias=False)(x)
            x = BatchNorm2d(4)(x, train=train)
            x = nn.relu(x)
            return nn.Dense(10)(x.mean(axis=(1, 2)))

    return TinyBN()


def test_block_grouping_matches_sequential(config_dir):
    """Vmapped chunk groups reproduce the sequential accumulation: same mean
    gradient, per-chunk grad norms, loss, and (sequential-EMA) BN running
    stats, with grad-reg and per-chunk clipping active (VERDICT r1 item 2)."""
    results = {}
    for grouping in (1, 3):  # 8 chunks with group 3 -> 2 groups + ragged tail of 2
        cfg, mesh, bundle, _ = _setup(config_dir, [
            "data.augmentations_train=", "hyp.grad_reg.block_strength=0.5",
            "hyp.batch_clip=0.25", "hyp.optim.lr=0.4", "hyp.warmup=0",
            "data.batch_size=2", "hyp.sub_batch=2",
            f"impl.block_grouping={grouping}"])
        model = _tiny_bn_model()
        fns = make_train_functions(model, bundle, mesh, cfg)
        variables = initialize_model(model, jax.random.key(0), bundle.pixels,
                                     bundle.channels)
        state = fns.init_state(variables)
        images, labels = stage_epoch(bundle, fns, mesh, cfg, 0, {})
        grads, bn, metrics = fns.gradient_eval(state, images, labels,
                                               with_modifiers=False)
        results[grouping] = (jax.device_get(grads), jax.device_get(bn),
                             jax.device_get(metrics))
    g1, bn1, m1 = results[1]
    g4, bn4, m4 = results[3]
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g4)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6)
    for a, b in zip(jax.tree.leaves(bn1), jax.tree.leaves(bn4)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(m1["train_loss"], m4["train_loss"], rtol=1e-5)
    np.testing.assert_allclose(m1["grad_norm"], m4["grad_norm"], rtol=1e-4)


@pytest.mark.slow  # compile-heavy on the 1-core host; semantics also covered by faster siblings
def test_grad_noise_modifiers(config_dir):
    """hyp.grad_noise additive/multiplicative on the FULL averaged gradient
    (reference training.py:212-215): zero-mean draws at the configured scale,
    fresh per step, applied AFTER clipping; multiplicative noise keeps zero
    gradients zero (g * (1 + sigma*xi))."""
    def grads_with(extra, step=0):
        cfg, mesh, bundle, model = _setup(config_dir, [
            "data.augmentations_train="] + extra)
        fns = make_train_functions(model, bundle, mesh, cfg)
        variables = initialize_model(model, jax.random.key(0), bundle.pixels,
                                     bundle.channels)
        state = fns.init_state(variables)
        state = state.replace(step=jnp.asarray(step, jnp.int32))
        images, labels = stage_epoch(bundle, fns, mesh, cfg, 0, {})
        g, _, _ = fns.gradient_eval(state, images, labels)
        return jax.device_get(g)

    clean = grads_with([])
    add0 = grads_with(["hyp.grad_noise.additive=0.05"])
    add1 = grads_with(["hyp.grad_noise.additive=0.05"], step=1)

    def flat_diff(a, b):
        return np.concatenate([(np.asarray(x) - np.asarray(y)).ravel()
                               for x, y in zip(jax.tree.leaves(a),
                                               jax.tree.leaves(b))])
    noise0 = flat_diff(add0, clean)
    noise1 = flat_diff(add1, clean)
    assert 0.03 < noise0.std() < 0.07       # configured scale
    assert abs(noise0.mean()) < 0.01        # zero-mean
    assert not np.allclose(noise0, noise1)  # fresh draw per step

    mult = grads_with(["hyp.grad_noise.multiplicative=0.1"])
    ratios = []
    for m, c in zip(jax.tree.leaves(mult), jax.tree.leaves(clean)):
        m, c = np.asarray(m), np.asarray(c)
        assert np.all(m[c == 0] == 0)       # zero grads stay zero
        nz = c != 0
        ratios.append((m[nz] / c[nz] - 1.0).ravel())
    r = np.concatenate(ratios)
    assert 0.06 < r.std() < 0.14

    # noise rides on top of the clipped gradient, not under it (ref order)
    clipnoise = grads_with(["hyp.grad_clip=0.001",
                            "hyp.grad_noise.additive=0.05"])
    norm = np.sqrt(sum((np.asarray(g) ** 2).sum()
                       for g in jax.tree.leaves(clipnoise)))
    assert norm > 0.01


@pytest.mark.slow  # compile-heavy on the 1-core host; semantics also covered by faster siblings
def test_block_grouping_detects_custom_bn_momentum(config_dir):
    """A model built with a non-default norm momentum must still produce
    correct grouped running stats: the per-leaf stat decay is MEASURED at
    make_train_functions time (VERDICT r2 weak #5, upgraded in round 3),
    so heterogeneous momenta fold exactly instead of disabling grouping."""
    from flax import linen as nn

    from fullbatchtraining_tpu.models.layers import BatchNorm2d
    from fullbatchtraining_tpu.models.models import detect_norm_momenta

    class CustomBN(nn.Module):
        momenta: tuple = (0.5, 0.5)

        @nn.compact
        def __call__(self, x, train: bool = True):
            x = nn.Conv(4, (3, 3), use_bias=False)(x)
            x = BatchNorm2d(4, momentum=self.momenta[0])(x, train=train)
            x = nn.relu(x)
            x = nn.Conv(4, (3, 3), use_bias=False)(x)
            x = BatchNorm2d(4, momentum=self.momenta[1])(x, train=train)
            return nn.Dense(10)(x.mean(axis=(1, 2)))

    assert detect_norm_momenta(CustomBN(), 8, 3) == {0.5}
    assert detect_norm_momenta(CustomBN(momenta=(0.5, 0.7)), 8, 3) == {0.5, 0.7}

    results = {}
    for grouping in (1, 3):
        cfg, mesh, bundle, _ = _setup(config_dir, [
            "data.augmentations_train=", "data.batch_size=2", "hyp.sub_batch=2",
            f"impl.block_grouping={grouping}"])
        model = CustomBN()
        fns = make_train_functions(model, bundle, mesh, cfg)
        assert fns.group == grouping
        variables = initialize_model(model, jax.random.key(0), bundle.pixels,
                                     bundle.channels)
        state = fns.init_state(variables)
        images, labels = stage_epoch(bundle, fns, mesh, cfg, 0, {})
        _, bn, _ = fns.gradient_eval(state, images, labels, with_modifiers=False)
        results[grouping] = jax.device_get(bn)
    for a, b in zip(jax.tree.leaves(results[1]), jax.tree.leaves(results[3])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)

    # Heterogeneous momenta: the measured per-leaf decay keeps grouping ON
    # and the grouped stats exactly equal to the sequential run.
    het = {}
    for grouping in (1, 3):
        cfg, mesh, bundle, _ = _setup(config_dir, [
            "data.augmentations_train=", "data.batch_size=2", "hyp.sub_batch=2",
            f"impl.block_grouping={grouping}"])
        model = CustomBN(momenta=(0.5, 0.7))
        fns = make_train_functions(model, bundle, mesh, cfg)
        assert fns.group == grouping
        variables = initialize_model(model, jax.random.key(0), bundle.pixels,
                                     bundle.channels)
        state = fns.init_state(variables)
        images, labels = stage_epoch(bundle, fns, mesh, cfg, 0, {})
        _, bn, _ = fns.gradient_eval(state, images, labels,
                                     with_modifiers=False)
        het[grouping] = jax.device_get(bn)
    for a, b in zip(jax.tree.leaves(het[1]), jax.tree.leaves(het[3])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_block_grouping_disables_on_non_affine_stats(config_dir):
    """A norm layer whose running-stat update is not affine in the incoming
    stats (here: a running max) cannot be composed by the grouped fold; the
    affinity probe must detect it and disable grouping loudly."""
    import jax.numpy as jnp
    from flax import linen as nn

    class MaxNorm(nn.Module):
        momentum: float = 0.9  # advertised, but the update below ignores it

        @nn.compact
        def __call__(self, x, train: bool = True):
            ra = self.variable("batch_stats", "peak",
                               lambda: jnp.zeros(x.shape[-1]))
            if train and not self.is_initializing():
                ra.value = jnp.maximum(ra.value, jnp.max(jnp.abs(x), axis=(0, 1, 2)))
            return x / (1.0 + ra.value)

    class Net(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = True):
            x = nn.Conv(4, (3, 3), use_bias=False)(x)
            x = MaxNorm()(x, train=train)
            return nn.Dense(10)(x.mean(axis=(1, 2)))

    cfg, mesh, bundle, _ = _setup(config_dir, [
        "data.augmentations_train=", "data.batch_size=2", "hyp.sub_batch=2",
        "impl.block_grouping=3"])
    fns = make_train_functions(Net(), bundle, mesh, cfg)
    assert fns.group == 1


@pytest.mark.slow  # compile-heavy on the 1-core host; semantics also covered by faster siblings
def test_block_grouping_probes_momentum_less_stat_layers(config_dir):
    """A stats-bearing layer WITHOUT a `momentum` attribute must still be
    probed: non-affine updates disable grouping, affine ones fold with the
    measured decay (regression: the probe used to be gated on momentum-attr
    DETECTION, so momentum-less stat layers silently composed with the
    default impl.bn_momentum)."""
    import jax.numpy as jnp
    from flax import linen as nn

    class MaxNormNoAttr(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = True):
            ra = self.variable("batch_stats", "peak",
                               lambda: jnp.zeros(x.shape[-1]))
            if train and not self.is_initializing():
                ra.value = jnp.maximum(ra.value,
                                       jnp.max(jnp.abs(x), axis=(0, 1, 2)))
            return x / (1.0 + ra.value)

    class EmaNoAttr(nn.Module):
        # affine stat update with a hard-coded decay nothing advertises
        @nn.compact
        def __call__(self, x, train: bool = True):
            ra = self.variable("batch_stats", "mean",
                               lambda: jnp.zeros(x.shape[-1]))
            if train and not self.is_initializing():
                ra.value = 0.25 * ra.value + 0.75 * x.mean(axis=(0, 1, 2))
            return x - ra.value

    def make_net(layer_cls):
        class Net(nn.Module):
            @nn.compact
            def __call__(self, x, train: bool = True):
                x = nn.Conv(4, (3, 3), use_bias=False)(x)
                x = layer_cls()(x, train=train)
                return nn.Dense(10)(x.mean(axis=(1, 2)))
        return Net()

    cfg, mesh, bundle, _ = _setup(config_dir, [
        "data.augmentations_train=", "data.batch_size=2", "hyp.sub_batch=2",
        "impl.block_grouping=3"])
    fns = make_train_functions(make_net(MaxNormNoAttr), bundle, mesh, cfg)
    assert fns.group == 1  # probed and refuted despite no momentum attribute

    results = {}
    for grouping in (1, 3):
        cfg, mesh, bundle, _ = _setup(config_dir, [
            "data.augmentations_train=", "data.batch_size=2", "hyp.sub_batch=2",
            f"impl.block_grouping={grouping}"])
        model = make_net(EmaNoAttr)
        fns = make_train_functions(model, bundle, mesh, cfg)
        assert fns.group == grouping  # affine: grouping stays on
        variables = initialize_model(model, jax.random.key(0), bundle.pixels,
                                     bundle.channels)
        state = fns.init_state(variables)
        images, labels = stage_epoch(bundle, fns, mesh, cfg, 0, {})
        _, bn, _ = fns.gradient_eval(state, images, labels,
                                     with_modifiers=False)
        results[grouping] = jax.device_get(bn)
    for a, b in zip(jax.tree.leaves(results[1]), jax.tree.leaves(results[3])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_block_grouping_auto_resolution():
    from fullbatchtraining_tpu.training.training import _resolve_block_grouping

    assert _resolve_block_grouping("auto", 1563, 32) == 16  # ragged tail allowed
    assert _resolve_block_grouping("auto", 390, 128) == 4   # 512//128
    assert _resolve_block_grouping("auto", 4, 512) == 1
    assert _resolve_block_grouping("auto", 2, 32) == 2      # capped by chunk count
    assert _resolve_block_grouping(1, 100, 32) == 1
    assert _resolve_block_grouping(8, 100, 32) == 8
    assert _resolve_block_grouping(None, 100, 32) == 1


def test_block_grouping_activation_budget_cap():
    """Auto grouping shrinks under the activation budget so deep models
    (ResNet-152 highreg OOM, VALIDATION.md) fit by default; explicit specs
    and flagship-size estimates are untouched."""
    from fullbatchtraining_tpu.training.training import _resolve_block_grouping

    mb = 1 << 20
    # ResNet-18-scale estimate (~8 MB/sample): the 9 GB default keeps 16
    assert _resolve_block_grouping("auto", 1563, 32,
                                   act_bytes_per_sample=8 * mb,
                                   double_activations=True) == 16
    # ResNet-152-scale (~100 MB/sample) under gradreg: degrades, never OOMs
    assert _resolve_block_grouping("auto", 1563, 32,
                                   act_bytes_per_sample=100 * mb,
                                   double_activations=True) == 1
    assert _resolve_block_grouping("auto", 1563, 32,
                                   act_bytes_per_sample=100 * mb) == 2
    # explicit integers are trusted unchanged (the user's measured override)
    assert _resolve_block_grouping(4, 1563, 32,
                                   act_bytes_per_sample=100 * mb,
                                   double_activations=True) == 4
    # a custom budget moves the cap
    assert _resolve_block_grouping("auto", 1563, 32,
                                   act_bytes_per_sample=100 * mb,
                                   act_budget=26 << 30,
                                   double_activations=True) == 4


def test_estimate_activation_bytes_orders_models():
    from pathlib import Path

    from fullbatchtraining_tpu.config import load_config
    from fullbatchtraining_tpu.models import construct_model
    from fullbatchtraining_tpu.models.models import estimate_activation_bytes

    repo = Path(__file__).resolve().parent.parent
    sizes = {}
    for name in ("resnet18", "resnet152"):
        cfg = load_config(repo / "config", overrides=[f"model={name}"])
        model = construct_model(cfg.model, channels=3, classes=10)
        sizes[name] = estimate_activation_bytes(model, 32, 3)
    assert sizes["resnet18"] > 1 << 20  # megabytes, not zero
    assert sizes["resnet152"] > 5 * sizes["resnet18"]  # depth dominates


def test_estimate_activation_bytes_follows_compute_dtype():
    """The training wrapper casts inputs AND params to the compute dtype, so
    a bf16 recipe's activations are half the float32 estimate — the budget
    cap must be computed for the dtype actually run (models carry none)."""
    from pathlib import Path

    import jax.numpy as jnp

    from fullbatchtraining_tpu.config import load_config
    from fullbatchtraining_tpu.models import construct_model
    from fullbatchtraining_tpu.models.models import estimate_activation_bytes

    repo = Path(__file__).resolve().parent.parent
    cfg = load_config(repo / "config", overrides=["model=resnet18"])
    model = construct_model(cfg.model, channels=3, classes=10)
    f32 = estimate_activation_bytes(model, 32, 3)
    bf16 = estimate_activation_bytes(model, 32, 3, compute_dtype=jnp.bfloat16)
    assert bf16 * 2 == f32


def test_block_grouping_one_skips_activation_probe(config_dir, monkeypatch):
    """impl.block_grouping=1 + impl.eval_block_chunks=1 (both documented
    'disables') must not pay the activation-estimate trace — only
    'auto'/True read it. Guarded against Python's 1 == True equality for
    BOTH keys."""
    import fullbatchtraining_tpu.models.models as mm
    from fullbatchtraining_tpu.config import load_config
    from fullbatchtraining_tpu.data import construct_databundle
    from fullbatchtraining_tpu.models import construct_model
    from fullbatchtraining_tpu.parallel import make_mesh
    from fullbatchtraining_tpu.training.training import make_train_functions

    def boom(*a, **k):
        raise AssertionError("estimate_activation_bytes called for spec=1")

    monkeypatch.setattr(mm, "estimate_activation_bytes", boom)
    cfg = load_config(config_dir, overrides=[
        "model=linear", "data.size=16", "data.path=/tmp/__none__",
        "data.batch_size=2", "hyp.sub_batch=2", "hyp=fb1", "seed=0",
        "impl.block_grouping=1", "impl.eval_block_chunks=1"])
    mesh = make_mesh(cfg.impl.setup)
    bundle = construct_databundle(cfg.data, cfg.impl, cfg.hyp, seed=0)
    model = construct_model(cfg.model, bundle.channels, bundle.classes)
    make_train_functions(model, bundle, mesh, cfg)  # must not raise


def test_streamed_accumulation_matches_resident(config_dir):
    """Epochs over the HBM budget stream through per-segment programs; the
    accumulated gradient, BN stats, and metrics match the HBM-resident path
    (carry threads the absolute chunk index, one psum in finalize)."""
    results = {}
    for budget in ("resident", "streamed"):
        overrides = ["data.augmentations_train=", "hyp.grad_reg.block_strength=0.5",
                     "hyp.batch_clip=0.25", "data.batch_size=2", "hyp.sub_batch=2",
                     "hyp.optim.lr=0.4", "hyp.warmup=0"]
        if budget == "streamed":
            # ~3 blocks per segment: 8 blocks -> 2 full segments + remainder
            overrides += ["impl.hbm_epoch_max_bytes=1",
                          "impl.stream_segment_blocks=3"]
        cfg, mesh, bundle, _ = _setup(config_dir, overrides)
        model = _tiny_bn_model()
        fns = make_train_functions(model, bundle, mesh, cfg)
        assert fns.streamed == (budget == "streamed")
        variables = initialize_model(model, jax.random.key(0), bundle.pixels,
                                     bundle.channels)
        state = fns.init_state(variables)
        images, labels = stage_epoch(bundle, fns, mesh, cfg, 0, {})
        grads, bn, metrics = fns.gradient_eval(state, images, labels,
                                               with_modifiers=False)
        results[budget] = (jax.device_get(grads), jax.device_get(bn),
                          jax.device_get(metrics))
    g0, bn0, m0 = results["resident"]
    g1, bn1, m1 = results["streamed"]
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)
    for a, b in zip(jax.tree.leaves(bn0), jax.tree.leaves(bn1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)
    for k in ("train_loss", "train_acc", "grad_norm", "full_loss", "clipped_batches"):
        np.testing.assert_allclose(m0[k], m1[k], rtol=1e-5, err_msg=k)


def test_streamed_training_runs(config_dir):
    """train() end-to-end in streamed mode (full_step path incl. modifiers,
    optimizer, EMA off, eval) matches the resident trajectory."""
    traces = {}
    for budget in ("resident", "streamed"):
        overrides = ["hyp.steps=3", "data.augmentations_train=",
                     "hyp.optim.lr=0.05", "hyp.shuffle=True"]
        if budget == "streamed":
            overrides += ["impl.hbm_epoch_max_bytes=1"]
        cfg, mesh, bundle, model = _setup(config_dir, overrides)
        state, stats = train(model, bundle, mesh, cfg)
        traces[budget] = stats["train_loss"]
    np.testing.assert_allclose(traces["resident"], traces["streamed"], rtol=1e-5)


def test_streamed_acc_strength_matches_resident(config_dir):
    """grad_reg.acc_strength needs a full pre-pass over the data; streamed
    mode runs it as a second segment sweep and must reproduce the resident
    gradient, full_loss (incl. the acc penalty term), and BN stats
    (VERDICT r2 missing #2; ref training.py:128-142)."""
    results = {}
    for budget in ("resident", "streamed"):
        overrides = ["data.augmentations_train=", "hyp.grad_reg.acc_strength=0.3",
                     "hyp.grad_reg.block_strength=0.25", "data.batch_size=2",
                     "hyp.sub_batch=2", "hyp.optim.lr=0.4", "hyp.warmup=0"]
        if budget == "streamed":
            overrides += ["impl.hbm_epoch_max_bytes=1",
                          "impl.stream_segment_blocks=3"]
        cfg, mesh, bundle, _ = _setup(config_dir, overrides)
        model = _tiny_bn_model()
        fns = make_train_functions(model, bundle, mesh, cfg)
        assert fns.streamed == (budget == "streamed")
        variables = initialize_model(model, jax.random.key(0), bundle.pixels,
                                     bundle.channels)
        state = fns.init_state(variables)
        images, labels = stage_epoch(bundle, fns, mesh, cfg, 0, {})
        grads, bn, metrics = fns.gradient_eval(state, images, labels,
                                               with_modifiers=False)
        results[budget] = (jax.device_get(grads), jax.device_get(bn),
                           jax.device_get(metrics))
    g0, bn0, m0 = results["resident"]
    g1, bn1, m1 = results["streamed"]
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)
    for a, b in zip(jax.tree.leaves(bn0), jax.tree.leaves(bn1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)
    for k in ("train_loss", "full_loss", "grad_norm"):
        np.testing.assert_allclose(m0[k], m1[k], rtol=1e-5, err_msg=k)


def test_streamed_stochastic_matches_resident(config_dir):
    """Stochastic SGD over a larger-than-HBM epoch: segments thread the
    (params, BN, opt_state) carry and must reproduce the resident one-program
    epoch exactly (VERDICT r2 missing #1; ref training.py:241-286)."""
    traces = {}
    for budget in ("resident", "streamed"):
        overrides = ["hyp.steps=3", "data.augmentations_train=",
                     "hyp.train_stochastic=True", "hyp.shuffle=True",
                     "hyp.optim.lr=0.05"]
        if budget == "streamed":
            overrides += ["impl.hbm_epoch_max_bytes=1",
                          "impl.stream_segment_blocks=3"]
        cfg, mesh, bundle, model = _setup(config_dir, overrides)
        state, stats = train(model, bundle, mesh, cfg)
        traces[budget] = (stats["train_loss"], stats["train_acc"],
                          jax.device_get(state.params))
    l0, a0, p0 = traces["resident"]
    l1, a1, p1 = traces["streamed"]
    np.testing.assert_allclose(l0, l1, rtol=1e-5)
    np.testing.assert_allclose(a0, a1, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(p1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)


def test_streamed_stochastic_closure_runs(config_dir):
    """Per-block closure optimization (line search) in streamed stochastic
    mode: host block slices are staged per block and the run matches the
    resident trajectory."""
    traces = {}
    for budget in ("resident", "streamed"):
        overrides = ["hyp.steps=2", "data.augmentations_train=",
                     "hyp.train_stochastic=True", "hyp.optim.line_search=non-monotone",
                     "hyp.optim.lr=0.05"]
        if budget == "streamed":
            overrides += ["impl.hbm_epoch_max_bytes=1",
                          "impl.stream_segment_blocks=3"]
        cfg, mesh, bundle, model = _setup(config_dir, overrides)
        state, stats = train(model, bundle, mesh, cfg)
        traces[budget] = stats["train_loss"]
    np.testing.assert_allclose(traces["resident"], traces["streamed"], rtol=1e-5)


def test_closure_driver_resume_is_equivalent(config_dir, tmp_path, monkeypatch):
    """L-BFGS curvature memory survives checkpoint resume via the driver-state
    sidecar: train(4) == train(2) -> save -> resume -> train(2 more)."""
    monkeypatch.chdir(tmp_path)

    def run(steps, ckpt=None):
        overrides = [f"hyp.steps={steps}", "data.augmentations_train=",
                     "hyp/optim=lbfgs", "hyp.optim.lr=0.2",
                     "hyp.scheduler=none",
                     # async on purpose: the sidecar write must queue BEHIND
                     # the main checkpoint write and drain before resume
                     "impl.checkpoint.async_save=True"]
        if ckpt:
            overrides += [f"impl.checkpoint.name={ckpt}",
                          "impl.checkpoint.save_every_nth_step=1"]
        cfg, mesh, bundle, model = _setup(config_dir, overrides)
        cfg.original_cwd = str(tmp_path)
        return train(model, bundle, mesh, cfg)

    state_straight, _ = run(4)
    run(2, ckpt="lbfgs_resume.ckpt")
    state_b, _ = run(4, ckpt="lbfgs_resume.ckpt")  # resumes from step 2
    assert int(state_b.step) == 4
    for a, b in zip(jax.tree.leaves(state_straight.params),
                    jax.tree.leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_stochastic_closure_driver_resume_is_equivalent(config_dir, tmp_path,
                                                        monkeypatch):
    """In stochastic mode the per-block line search drives the run's ONE
    driver object, so its loss history rides the same sidecar as the
    full-batch path and survives resume (the reference checkpoints its
    single optimizer's state_dict; training/utils.py:43-51)."""
    monkeypatch.chdir(tmp_path)

    def run(steps, ckpt=None):
        # scheduler=none: the schedule horizon is hyp.steps, which differs
        # between the interrupted and the straight run by construction
        overrides = [f"hyp.steps={steps}", "data.augmentations_train=",
                     "hyp=base_sgd", "hyp.optim.line_search=non-monotone",
                     "+hyp.optim.interval=3", "hyp.optim.lr=2.0",
                     "hyp.scheduler=none",
                     "data.batch_size=8"]  # wild lr: retries consult history
        if ckpt:
            overrides += [f"impl.checkpoint.name={ckpt}",
                          "impl.checkpoint.save_every_nth_step=1"]
        cfg, mesh, bundle, model = _setup(config_dir, overrides)
        cfg.original_cwd = str(tmp_path)
        return train(model, bundle, mesh, cfg)

    state_straight, _ = run(4)
    run(2, ckpt="nm_resume.ckpt")
    # the sidecar must hold the BLOCK drivers' history — with a separate
    # (unused) full-batch driver it would be empty
    from flax import serialization
    sidecar = tmp_path / "checkpoints" / "nm_resume.opt.msgpack"
    payload = serialization.msgpack_restore(sidecar.read_bytes())
    assert len(payload["losses"]) >= 2
    state_b, _ = run(4, ckpt="nm_resume.ckpt")  # resumes from step 2
    assert int(state_b.step) == 4
    for a, b in zip(jax.tree.leaves(state_straight.params),
                    jax.tree.leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


# -- L-BFGS driver regressions (round-3 review fixes) -----------------------


def _lbfgs_driver(config_dir, **opt_overrides):
    from fullbatchtraining_tpu.training.opt.lbfgs import LBFGSDriver
    ov = [f"hyp.optim.{k}={v}" for k, v in opt_overrides.items()]
    cfg = load_config(config_dir, overrides=BASE + ["hyp/optim=lbfgs"] + ov)
    return LBFGSDriver, cfg


def test_lbfgs_wolfe_rejects_nan_trial(config_dir):
    """A NaN trial loss must bracket (bisect), never be returned as a
    successful step (fix of the reference's Wolfe NaN hole, lbfgs.py:539)."""
    LBFGSDriver, cfg = _lbfgs_driver(config_dir, line_search="Wolfe")
    d = LBFGSDriver.__new__(LBFGSDriver)
    d.max_ls, d.c1, d.c2, d.eta = 10, 1e-4, 0.9, 2.0

    def phi_grad(t):  # quadratic with an overflow region at t >= 1
        if t >= 1.0:
            return float("nan"), float("nan")
        return (t - 0.5) ** 2, 2 * (t - 0.5)

    t, F_new, fail = d._wolfe(phi_grad, 0.25, -1.0)
    assert not fail and np.isfinite(F_new)
    assert t == 0.5  # bisection of (0, 1) after the NaN upper bound


def test_lbfgs_step_chains_bn_and_preserves_param_dtype(config_dir):
    """Every closure evaluation applies one running-stat EMA update in call
    order (reference closure semantics), and probe/final params are rebuilt
    in the PARAM dtype even when gradients arrive in a different
    accumulation dtype."""
    from fullbatchtraining_tpu.training.training import TrainState

    LBFGSDriver, cfg = _lbfgs_driver(config_dir, line_search="Armijo",
                                     weight_decay=0.0)
    calls = {"n": 0, "probe_dtypes": set(), "probe_bn": []}
    target = jnp.asarray([0.7, -0.3], jnp.float32)

    class FakeFns:
        @staticmethod
        def schedule(step):
            return jnp.asarray(1.0)

        @staticmethod
        def gradient_eval(state, images, labels):
            calls["n"] += 1
            calls["probe_dtypes"].add(str(state.params["w"].dtype))
            calls["probe_bn"].append(float(state.batch_stats["calls"]))
            # steep quadratic so Armijo at t=1 fails and must backtrack
            w32 = state.params["w"].astype(jnp.float32)
            grads = {"w": (200.0 * (w32 - target)).astype(jnp.bfloat16)}
            bn = {"calls": state.batch_stats["calls"] + 1.0}
            loss = 100.0 * float(jnp.sum((w32 - target) ** 2))
            return grads, bn, {"train_loss": jnp.asarray(loss)}

    driver = LBFGSDriver(FakeFns, cfg)
    state = TrainState(step=jnp.asarray(0), params={"w": jnp.zeros(2)},
                       batch_stats={"calls": jnp.asarray(0.0)},
                       opt_state=None)
    # two steps: the second builds a real quasi-Newton pair/backtrack
    for _ in range(2):
        state, metrics = driver.step(state, None, None)
    assert calls["n"] >= 3  # at least one backtracking evaluation happened
    # params stay in the param dtype despite bf16 gradients
    assert state.params["w"].dtype == jnp.float32
    assert calls["probe_dtypes"] == {"float32"}
    # stats chain one EMA update per evaluation, in call order
    assert calls["probe_bn"] == [float(i) for i in range(calls["n"])]
    assert float(state.batch_stats["calls"]) == calls["n"]


def test_lbfgs_sharded_vectors_match_replicated(config_dir):
    """impl.shard_opt_vectors (ZeRO-style, beyond the reference): every
    driver vector lives split across the data axis — memory per device
    shrinks by n_devices — and the trajectory matches the replicated driver
    (identical math up to dot-product reduction order); the checkpoint
    payload stays shard- and padding-free."""
    from jax.sharding import NamedSharding
    from fullbatchtraining_tpu.training.opt.closures import make_closure_step

    def run(shard):
        cfg, mesh, bundle, model = _setup(config_dir, [
            "hyp/optim=lbfgs", "hyp.optim.lr=0.5", "hyp.steps=3",
            f"impl.shard_opt_vectors={shard}"])
        fns = make_train_functions(model, bundle, mesh, cfg)
        variables = initialize_model(model, jax.random.key(0), bundle.pixels,
                                     bundle.channels)
        state = fns.init_state(variables)
        driver = make_closure_step(fns, cfg, "lbfgs")
        images, labels = stage_epoch(bundle, fns, mesh, cfg, 0, {})
        for _ in range(3):
            state, _ = driver.step(state, images, labels)
        return state, driver, fns, cfg

    state_r, _, _, _ = run(False)
    state_s, driver, fns, cfg = run(True)
    n_dev = jax.device_count()
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree.leaves(state_s.params))
    vectors = driver.s_hist + driver.y_hist + [driver.prev_flat_grad,
                                               driver.Bs, driver.d]
    assert driver.s_hist
    for v in vectors:
        assert isinstance(v.sharding, NamedSharding)
        assert len(v.sharding.device_set) == n_dev
        assert v.addressable_shards[0].data.shape[0] == v.shape[0] // n_dev
        assert v.shape[0] == n_params + (-n_params) % n_dev
    for a, b in zip(jax.tree.leaves(state_r.params),
                    jax.tree.leaves(state_s.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)
    # checkpoint payload is unpadded host data; restore re-shards
    payload = driver.get_state()
    assert payload["s_hist"][0].shape[0] == n_params
    driver.set_state(payload)
    assert driver.s_hist[0].shape[0] % n_dev == 0
    assert isinstance(driver.s_hist[0].sharding, NamedSharding)
    # set_state -> checkpoint again BEFORE any step (preemption mid-stage):
    # the re-saved payload must stay unpadded, else a later restore on a
    # different mesh re-pads to a length the fresh gradients don't have
    fresh = make_closure_step(fns, cfg, "lbfgs")
    fresh.set_state(payload)
    repay = fresh.get_state()
    assert repay["s_hist"][0].shape[0] == n_params
    assert repay["prev_flat_grad"].shape[0] == n_params


def test_eval_streamed_equals_resident(config_dir):
    """stage_validation keeps the padded valid set host-resident above the
    HBM budget and eval_step streams it in segments; the carry-threaded eval
    scan makes the streamed metrics BITWISE equal to the resident ones
    (reference evaluates through a DataLoader at any scale,
    training.py:343-388)."""
    from fullbatchtraining_tpu.training.training import stage_validation

    # synthetic valid split is 25 samples -> 2 blocks of 8 devices x batch 2
    cfg, mesh, bundle, model = _setup(config_dir, ["data.batch_size=2",
                                                   "hyp.sub_batch=2"])
    fns = make_train_functions(model, bundle, mesh, cfg)
    variables = initialize_model(model, jax.random.key(0), bundle.pixels,
                                 bundle.channels)
    state = fns.init_state(variables)

    resident = stage_validation(bundle, mesh, fns.num_devices,
                                bundle.batch_size, cfg_impl=cfg.impl)
    assert not isinstance(resident[0], np.ndarray)
    cfg.impl.hbm_epoch_max_bytes = 1  # force host-resident streamed staging
    streamed = stage_validation(bundle, mesh, fns.num_devices,
                                bundle.batch_size, cfg_impl=cfg.impl)
    assert isinstance(streamed[0], np.ndarray) and streamed[0].shape[0] > 1

    m_res = jax.device_get(fns.eval_step(state.params, state.batch_stats,
                                         *resident))
    m_str = jax.device_get(fns.eval_step(state.params, state.batch_stats,
                                         *streamed))
    assert float(m_res["valid_loss"]) == float(m_str["valid_loss"])
    assert float(m_res["valid_acc"]) == float(m_str["valid_acc"])


def test_resolve_eval_chunking():
    """Divisor selection for activation-aware eval sub-chunking."""
    from fullbatchtraining_tpu.training.training import _resolve_eval_chunking

    # fits the budget -> one forward per block
    assert _resolve_eval_chunking("auto", 2048, 10, act_budget=1 << 30) == 1
    # 2048 x 6MB = 12 GB over a 9 GB budget -> needs 2, 2 divides
    assert _resolve_eval_chunking("auto", 2048, 6 << 20, act_budget=9 << 30) == 2
    # need rounds UP to the next divisor (batch 16, need 3 -> 4)
    assert _resolve_eval_chunking("auto", 16, 3 << 30, act_budget=16 << 30) == 4
    # test_time_flips doubles the live activations
    assert _resolve_eval_chunking("auto", 2048, 6 << 20, act_budget=9 << 30,
                                  double=True) == 4
    # prime batch: only full split divides
    assert _resolve_eval_chunking("auto", 13, 1 << 30, act_budget=1) == 13
    # explicit specs: trusted (rounded up to a divisor), 1/None disable
    assert _resolve_eval_chunking(4, 16, None) == 4
    assert _resolve_eval_chunking(3, 16, None) == 4
    assert _resolve_eval_chunking(1, 2048, 1 << 40, act_budget=1) == 1
    assert _resolve_eval_chunking(None, 2048, 1 << 40, act_budget=1) == 1
    # no estimate available (block_grouping forced off): stay whole
    assert _resolve_eval_chunking("auto", 2048, None, act_budget=1) == 1


@pytest.mark.parametrize("force", [["impl.eval_block_chunks=4"],
                                   ["impl.activation_budget_bytes=1"]])
def test_eval_chunked_equals_whole(config_dir, force):
    """Activation-aware eval sub-chunking (explicit and forced-budget auto)
    yields the same metrics as whole-block eval — metrics are per-sample
    sums, so the split only reassociates them (reference eval fits wherever
    training does, training.py:343-388)."""
    from fullbatchtraining_tpu.training.training import stage_validation

    metrics = {}
    for tag, extra in [("whole", []), ("chunked", force)]:
        cfg, mesh, bundle, model = _setup(config_dir, extra)
        fns = make_train_functions(model, bundle, mesh, cfg)
        variables = initialize_model(model, jax.random.key(0), bundle.pixels,
                                     bundle.channels)
        state = fns.init_state(variables)
        val = stage_validation(bundle, mesh, fns.num_devices,
                               bundle.batch_size, cfg_impl=cfg.impl)
        metrics[tag] = jax.device_get(
            fns.eval_step(state.params, state.batch_stats, *val))
    np.testing.assert_allclose(metrics["chunked"]["valid_loss"],
                               metrics["whole"]["valid_loss"], rtol=1e-6)
    np.testing.assert_allclose(metrics["chunked"]["valid_acc"],
                               metrics["whole"]["valid_acc"], rtol=1e-12)


def test_viz_snapshot_saves_pre_step_gradient(config_dir, tmp_path, monkeypatch):
    """analysis.save_model_every_nth_step writes one snapshot per step whose
    grads are the gradient THAT PRODUCED the step — evaluated at the
    pre-step parameters, as the reference's leftover p.grad is
    (training/utils.py:74) — not a post-step re-evaluation."""
    from flax import serialization

    from fullbatchtraining_tpu.training.training import (make_train_functions,
                                                         stage_epoch)

    monkeypatch.chdir(tmp_path)
    overrides = ["data.augmentations_train=", "hyp.steps=2",
                 "hyp.optim.weight_decay=0",
                 "analysis.save_model_every_nth_step=1"]
    cfg, mesh, bundle, model = _setup(config_dir, overrides)
    state, stats = train(model, bundle, mesh, cfg)
    files = sorted(tmp_path.glob(f"{cfg.name}_*_step_*.msgpack"))
    assert len(files) == 2

    # expected gradient at the INITIAL state, recomputed independently
    cfg2, mesh2, bundle2, model2 = _setup(config_dir, overrides)
    fns = make_train_functions(model2, bundle2, mesh2, cfg2)
    variables = initialize_model(model2, jax.random.key(cfg2.seed or 0),
                                 bundle2.pixels, bundle2.channels)
    state0 = fns.init_state(variables)
    images, labels = stage_epoch(bundle2, fns, mesh2, cfg2, 0, {})
    grads0, _, _ = fns.gradient_eval(state0, images, labels)

    payload = serialization.msgpack_restore(files[0].read_bytes())
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(payload["grads"]),
            jax.tree_util.tree_leaves_with_path(jax.device_get(grads0)),
            strict=True):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7,
                                   err_msg=f"{pa} vs {pb}")
