"""Driver-contract tests for __graft_entry__.py: single-chip compile check
and the multi-chip dry run on the virtual mesh."""

import sys

import jax
import pytest
import numpy as np

sys.path.insert(0, ".")

import __graft_entry__ as graft  # noqa: E402


@pytest.mark.slow
def test_entry_compiles_and_runs():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    out = np.asarray(out)
    assert out.shape == (128, 128, 3)
    assert np.isfinite(out).all()


@pytest.mark.slow
def test_dryrun_multichip():
    graft.dryrun_multichip(8)
