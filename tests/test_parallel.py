"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""
import numpy as np
import pytest

import jax


def test_dryrun_multichip_8dev():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import __graft_entry__ as graft

    graft.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__ as graft

    fn, ex = graft.entry()
    out = jax.jit(fn)(*ex)
    assert out.shape[0] == 3
    assert np.isfinite(np.asarray(out)).all()
