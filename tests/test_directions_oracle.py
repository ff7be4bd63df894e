"""Direction-normalization golden parity vs the reference rollouts code.

The random draws themselves cannot match across frameworks (torch vs jax
PRNG), but the normalization math can: apply the reference's
normalize_direction (analysis/rollouts.py:103-139, from
tomgoldstein/loss-landscape) and ours to the SAME fixed direction/weight
tensors and compare, for every norm mode on conv (4D) and linear (2D)
leaves. Layouts: ours is HWIO/IO (filters along the LAST axis), torch is
OIHW/OI (filters along the first) — the oracle transposes accordingly.
"""

import pathlib
import sys
import zlib

import numpy as np
import pytest

REF = pathlib.Path("/root/reference/fullbatch")

pytestmark = pytest.mark.skipif(not REF.exists(),
                                reason="reference repo not mounted")

sys.path.insert(0, str(pathlib.Path(__file__).parent))


def _ref_rollouts():
    from test_trajectory_oracle import _load, _load_reference_training

    _load_reference_training()
    name = "reftrain.analysis.rollouts"
    if name not in sys.modules:
        _load(name, REF / "analysis/rollouts.py")
    return sys.modules[name]


@pytest.mark.parametrize("norm", ["filter", "layer", "weight", "dfilter", "dlayer"])
@pytest.mark.parametrize("shape", [(3, 3, 4, 6), (5, 7)])
def test_normalize_direction_matches_reference(norm, shape):
    import torch

    import jax.numpy as jnp

    from fullbatchtraining_tpu.analysis.directions import _normalize_leaf

    ro = _ref_rollouts()
    # hash() of a str is salted per process (PYTHONHASHSEED): crc32 keeps the
    # draw deterministic across pytest invocations
    rng = np.random.default_rng(zlib.crc32(f"{norm}{shape}".encode()))
    d = rng.normal(size=shape).astype(np.float32)
    w = rng.normal(size=shape).astype(np.float32)

    # torch layout: filters along the FIRST axis
    perm = (3, 2, 0, 1) if len(shape) == 4 else (1, 0)
    inv = np.argsort(perm)
    td = torch.tensor(d.transpose(perm).copy())
    tw = torch.tensor(w.transpose(perm).copy())
    ro.normalize_direction(td, tw, norm=norm)  # in place
    ref = td.numpy().transpose(inv)

    ours = _normalize_leaf(jnp.asarray(d), jnp.asarray(w), norm,
                           ignore="", key=None, entire_scale=None)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-5, atol=1e-7)
