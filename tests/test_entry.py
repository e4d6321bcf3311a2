"""Driver-contract tests: entry() compiles; dryrun_multichip(8) executes."""

import sys

import jax
import numpy as np


def _load_entry():
    sys.path.insert(0, ".")
    import __graft_entry__

    return __graft_entry__


def test_entry_forward_compiles():
    mod = _load_entry()
    fn, (variables, scene) = mod.entry()
    head_outs, valid, rgb = jax.jit(fn)(variables, scene)
    assert len(head_outs) == 3
    assert np.isfinite(np.asarray(rgb)).all()


def test_dryrun_multichip_8():
    mod = _load_entry()
    assert len(jax.devices()) >= 8
    mod.dryrun_multichip(8)
