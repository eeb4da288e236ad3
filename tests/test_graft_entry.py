"""Validate the driver entry points: single-chip jittable forward and the
multi-chip dry run over the 8-device virtual CPU mesh."""

import sys

import jax
import numpy as np


def _load_entry_module():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as entry_mod

    return entry_mod


class TestGraftEntry:
    def test_entry_compiles_and_runs(self):
        mod = _load_entry_module()
        fn, args = mod.entry()
        out = jax.jit(fn)(*args)
        assert out.shape == (1, 128, 128, 3)
        assert bool(np.isfinite(np.asarray(out)).all())

    def test_dryrun_multichip_8(self):
        mod = _load_entry_module()
        mod.dryrun_multichip(8)

    def test_dryrun_multichip_4(self):
        mod = _load_entry_module()
        mod.dryrun_multichip(4)
