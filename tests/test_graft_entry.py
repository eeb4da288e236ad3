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

    def test_dryrun_multichip_driver_conditions(self):
        """Reproduce the driver's invocation: a fresh subprocess with NO
        conftest env (no JAX_PLATFORMS / XLA_FLAGS device-count overrides),
        so `__graft_entry__` must provision its own virtual devices.

        Round 1 failed this gate: `MULTICHIP_r01.json` recorded
        `ok=false` because nothing outside conftest provisioned the mesh.
        """
        import os
        import subprocess

        env = {
            k: v
            for k, v in os.environ.items()
            if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
        }
        # No platform override at all: dryrun_multichip itself must pin the
        # CPU platform (binding config update — the axon PJRT plugin ignores
        # the JAX_PLATFORMS env var, and enumerating a wedged tunneled TPU
        # blocks forever).
        res = subprocess.run(
            [
                sys.executable,
                "-c",
                "import __graft_entry__ as m; m.dryrun_multichip(8)",
            ],
            cwd="/root/repo",
            env=env,
            capture_output=True,
            text=True,
            timeout=600,
        )
        assert res.returncode == 0, f"stdout={res.stdout}\nstderr={res.stderr}"
        assert "dryrun_multichip(8) OK" in res.stdout
