"""Guard against the axon TPU tunnel's hung-backend-init failure mode.

The tunneled TPU platform has a failure mode where backend initialization
(the first ``jax.devices()`` / ``jax.default_backend()`` call in a process)
blocks FOREVER instead of failing (observed 2026-08-18 after a tunnel drop).
For unattended entry points (the driver's bench / compile gates) a hang is
worse than a CPU fallback: nothing gets recorded at all.

``guard_against_wedged_tunnel()`` probes backend init in a subprocess with a
timeout and, on hang or failure, pins ``jax_platforms=cpu`` for the calling
process. It must run BEFORE the caller's first jax computation — once a
process has entered the wedged init path, the lock is already held and
post-hoc pinning cannot help.
"""

from __future__ import annotations

import os
import subprocess
import sys

import jax

_checked: bool | None = None  # None = not probed; else the cached result


def guard_against_wedged_tunnel(timeout_s: float = 240.0) -> bool:
    """Pin the CPU backend if TPU-tunnel init would hang this process.

    Returns True if the real (TPU) backend initializes normally, False if
    the guard had to pin CPU. Idempotent per process; the subprocess probe
    costs one interpreter startup (~10-30 s on a loaded 1-CPU host), which
    is why it is opt-in per entry point rather than an import side effect.
    """
    global _checked
    if _checked is not None:
        return _checked
    # If the platform list already excludes the tunneled platforms (e.g.
    # tests/conftest.py pins "cpu"), the decision is made: no TPU, and no
    # 10-30 s subprocess probe. The site default here is "axon,cpu".
    plats = (jax.config.jax_platforms or "").split(",")
    if plats != [""] and not any(p in ("axon", "tpu") for p in plats):
        _checked = False
        return False
    _checked = True
    # The probe must EXECUTE a computation, not just initialize the backend:
    # a second observed wedge mode (2026-08-19) initializes fine — devices()
    # returns the chip — but the first dispatched program never completes.
    probe_src = (
        "import jax, jax.numpy as jnp;"
        "x = jnp.ones((128, 128));"
        "print(float((x @ x).sum()), jax.default_backend())"
    )
    # Two attempts with a settle pause: a client that connects within
    # seconds of another client's teardown can hang even on a healthy
    # tunnel (observed r4 — probe green, next process wedged <1 s later),
    # so one hung probe is not yet proof of a wedged tunnel.
    reason = ""
    for attempt in range(2):
        try:
            probe = subprocess.run(
                [sys.executable, "-c", probe_src],
                capture_output=True, timeout=timeout_s, text=True,
            )
            if probe.returncode == 0:
                # Settle before the CALLER connects: it would otherwise
                # land in the probe subprocess's teardown window. Only a
                # TUNNELED backend has a teardown window — on CPU-only or
                # direct-attached hosts (the probe prints the backend it
                # landed on) the sleep is 30 s of pure startup waste
                # (round-4 advisor finding). NERVE_SKIP_TUNNEL_SETTLE=1
                # also skips it (for orchestration that already settled).
                backend = probe.stdout.strip().rsplit(" ", 1)[-1]
                if backend in ("tpu", "axon") and not os.environ.get(
                    "NERVE_SKIP_TUNNEL_SETTLE"
                ):
                    import time

                    time.sleep(30.0)
                return True  # backend executes; use whatever jax picks.
            reason = f"probe rc={probe.returncode}: {probe.stderr.strip()[-200:]}"
        except subprocess.TimeoutExpired:
            reason = f"backend init/exec hung >{timeout_s:.0f}s (wedged tunnel)"
        if attempt == 0:
            import time

            print(f"# TPU probe attempt 1 failed ({reason}); settling 75 s "
                  "and retrying once", file=sys.stderr, flush=True)
            time.sleep(75.0)
    print(f"# TPU backend unavailable ({reason}); pinning CPU",
          file=sys.stderr, flush=True)
    jax.config.update("jax_platforms", "cpu")
    _checked = False
    return False
