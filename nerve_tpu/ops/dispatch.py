"""Pallas-vs-XLA dispatch policy shared by the fused ops.

The auto policy is "Pallas on the TPU backend" — but computations can be
*placed* on CPU devices even when the default backend is a TPU (the driver's
``dryrun_multichip`` falls back to an 8-device virtual CPU mesh when only one
real chip exists; the axon TPU PJRT plugin also ignores ``JAX_PLATFORMS``).
Mosaic kernels cannot lower for CPU, so those paths must force the XLA
formulations. Placement isn't visible from inside a traced op, so the
override is an explicit process-wide switch:

  * env var ``NERVE_TPU_FORCE_XLA=1``, or
  * :func:`force_xla` / the :func:`forced_xla` context manager.
"""

from __future__ import annotations

import contextlib
import os

import jax

_FORCE_XLA = False


def force_xla(enabled: bool = True) -> None:
    """Process-wide: route all fused-op dispatches to the XLA formulation."""
    global _FORCE_XLA
    _FORCE_XLA = enabled


@contextlib.contextmanager
def forced_xla():
    prev = _FORCE_XLA
    force_xla(True)
    try:
        yield
    finally:
        force_xla(prev)


def pallas_available() -> bool:
    """True when auto-dispatch may choose a Pallas TPU kernel."""
    if _FORCE_XLA or os.environ.get("NERVE_TPU_FORCE_XLA", "") not in ("", "0"):
        return False
    return jax.default_backend() == "tpu"
