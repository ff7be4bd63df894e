"""Analysis-subsystem golden parity vs the reference's own analyze().

Drives /root/reference/fullbatch/analysis/analysis.py:analyze (read-only,
with the same stub-package loader the trajectory oracle uses) on a tiny
fp64 model with identical weights, gradients, and momentum buffers, and
asserts our analyze() reproduces every overlapping statistic: param/grad
norms, momentum distance/similarity, the per-chunk Welford gradient sweep
(Saxe mean/std stats + per-batch norms), and the McCandlish noise scale.

The reference's own SNR and noise-scale branches CRASH after writing their
stats (they read stats['grad_SNR']/'grad_noise_scale' instead of the
'analysis_'-prefixed keys they just wrote, inside eagerly-evaluated
f-strings — analysis.py:85-86, :96-97; our keys are consistent). The oracle
harvests what the reference wrote before each IndexError.
"""

import pathlib
import sys
from collections import defaultdict

import numpy as np
import pytest

REF = pathlib.Path("/root/reference/fullbatch")

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not REF.exists(), reason="reference repo not mounted"),
]

sys.path.insert(0, str(pathlib.Path(__file__).parent))
from test_trajectory_oracle import (  # noqa: E402
    _jax_model,
    _load,
    _load_reference_training,
    _torch_loader,
    _torch_model,
)


def _load_reference_analysis():
    _load_reference_training()  # builds the stub package tree
    ana_pkg = sys.modules["reftrain.analysis"]
    if not hasattr(ana_pkg, "welford"):
        _load("reftrain.analysis.welford", REF / "analysis/welford.py")
        _load("reftrain.analysis.rollouts", REF / "analysis/rollouts.py")
        ana = _load("reftrain.analysis.analysis", REF / "analysis/analysis.py")
        ana_pkg.welford = True
        ana_pkg.analysis = ana
    return sys.modules["reftrain.analysis.analysis"]


def test_analysis_matches_reference(config_dir):
    import jax
    import jax.numpy as jnp
    import torch

    from fullbatchtraining_tpu.analysis import analyze
    from fullbatchtraining_tpu.config import load_config
    from fullbatchtraining_tpu.data import construct_databundle
    from fullbatchtraining_tpu.models import initialize_model
    from fullbatchtraining_tpu.parallel import make_mesh
    from fullbatchtraining_tpu.training.optimizers import SGDState
    from fullbatchtraining_tpu.training.training import (
        TrainState,
        make_train_functions,
        stage_epoch,
    )

    overrides = [
        "model=linear", "hyp=fb1", "data.size=64",
        "data.path=/tmp/__traj_nodata__", "data.batch_size=16",
        "data.normalize=False", "data.augmentations_train=",
        "data.augmentations_val=", "hyp.sub_batch=8", "hyp.steps=2",
        "seed=0", "impl.dtype=float64", "impl.accumulation_dtype=float64",
        "impl.mixed_precision=False", "analysis=full",
        "analysis.measure_param_norm=True", "analysis.measure_grad_norm=True",
        "analysis.check_momentum=True", "analysis.internal_batch_size_chunks=2",
        "analysis.record_gradient_norm_per_batch=True", "name=anaoracle",
    ]
    cfg = load_config(config_dir, overrides=overrides)

    with jax.enable_x64(True):
        mesh = make_mesh(cfg.impl.setup, devices=np.asarray(jax.devices()[:1]))
        bundle = construct_databundle(cfg.data, cfg.impl, cfg.hyp, seed=0)
        model = _jax_model(bundle.classes)
        variables = initialize_model(model, jax.random.key(0), bundle.pixels,
                                     bundle.channels)
        params0 = jax.device_get(variables["params"])
        fns = make_train_functions(model, bundle, mesh, cfg)
        state = fns.init_state(variables)
        state = state.replace(step=np.asarray(0, np.int32))

        # the stale training gradient the reference would have in p.grad
        images, labels = stage_epoch(bundle, fns, mesh, cfg, 0, {})
        grads, _, _ = fns.gradient_eval(state, images, labels)
        # deterministic momentum buffers shared with the torch twin
        momentum = jax.tree.map(lambda p: 0.5 * p + 0.01, state.params)
        state = TrainState(step=state.step, params=state.params,
                           batch_stats=state.batch_stats,
                           opt_state=SGDState(momentum=momentum,
                                              count=np.asarray(1, np.int32)))

        ours = defaultdict(list)
        for flags in (["analysis.compute_gradient_SNR=True"],
                      ["analysis.compute_gradient_noise_scale=True"]):
            c = load_config(config_dir, overrides=overrides + flags)
            analyze(model, bundle, mesh, c, fns, state, ours, grads=grads)

    # ---- reference side ----------------------------------------------------
    ana = _load_reference_analysis()
    tmodel = _torch_model(params0, bundle.classes)
    tloader = _torch_loader(bundle.train.images, bundle.train.labels,
                            cfg.data.batch_size, drop_last=True)
    topt = torch.optim.SGD(tmodel.parameters(), lr=0.1, momentum=0.9)
    # map the grad pytree onto torch's named parameters
    gg = jax.device_get(grads)
    by_name = {"c1.weight": np.transpose(gg["c1"]["kernel"], (3, 2, 0, 1)),
               "c1.bias": gg["c1"]["bias"],
               "c2.weight": np.transpose(gg["c2"]["kernel"], (3, 2, 0, 1)),
               "c2.bias": gg["c2"]["bias"],
               "linear.weight": gg["linear"]["kernel"].T,
               "linear.bias": gg["linear"]["bias"]}
    for name, p in tmodel.named_parameters():
        p.grad = torch.tensor(np.asarray(by_name[name], np.float64))
        topt.state[p]["momentum_buffer"] = 0.5 * p.detach().clone() + 0.01

    setup = {"device": torch.device("cpu"), "dtype": torch.float64}
    ref = defaultdict(list)
    for flag in ("compute_gradient_SNR", "compute_gradient_noise_scale"):
        c = load_config(config_dir, overrides=overrides + [f"analysis.{flag}=True"])
        with pytest.raises(IndexError):
            # the reference crashes on its own stats-key mismatch right
            # after writing the values we want (analysis.py:85-86, :96-97)
            ana.analyze(tmodel, torch.nn.CrossEntropyLoss(), topt, tloader,
                        ref, setup, c)

    # ---- every overlapping statistic must coincide -------------------------
    keys = ["analysis_param_norm", "analysis_grad_norm",
            "analysis_momentum_dist", "analysis_momentum_sim",
            "analysis_grad_mean_mean", "analysis_grad_mean_norm",
            "analysis_grad_std_mean", "analysis_grad_std_norm",
            "analysis_grad_noise_scale"]
    keys += [f"analysis_grad_norm_{i}" for i in range(8)]
    for key in keys:
        assert len(ref[key]) > 0, key
        np.testing.assert_allclose(
            np.asarray(ours[key][:len(ref[key])]), np.asarray(ref[key]),
            rtol=1e-7, atol=1e-10, err_msg=key)
