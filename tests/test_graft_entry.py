"""Driver contracts (`__graft_entry__.py`) exercised inside the suite.

The driver compile-checks ``entry()`` single-chip and runs
``dryrun_multichip(n)`` on an n-device virtual CPU mesh at round end; this
module keeps a regression in either contract from surfacing only at driver
time. ``dryrun_multichip`` covers all five collective layouts (resident /
streamed / stochastic / closure / ZeRO-L-BFGS), so it is compile-heavy.
"""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy on the 1-core host

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def test_entry_compiles_and_runs():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (8, 10)
    assert out.dtype == jnp.float32
    assert bool(np.isfinite(jax.device_get(out)).all())


def test_dryrun_multichip_all_modes(capsys):
    import __graft_entry__ as g

    g.dryrun_multichip(8)  # raises / asserts internally on any failure
    tail = capsys.readouterr().out.strip().splitlines()[-1]
    assert "all modes OK" in tail, tail
    for mode in ("resident", "streamed", "stochastic", "closure", "zero-lbfgs"):
        assert mode in tail, (mode, tail)
