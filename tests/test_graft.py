"""Driver entry hooks: single-chip forward + multi-chip dry run on the
virtual 8-device CPU mesh."""

import sys

import numpy as np

import jax


def _load_graft():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    return g


def test_entry_compiles_and_runs():
    g = _load_graft()
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (2, 313)
    assert np.all(np.isfinite(np.asarray(out)))


def test_dryrun_multichip_8():
    g = _load_graft()
    g.dryrun_multichip(8)  # must not raise
