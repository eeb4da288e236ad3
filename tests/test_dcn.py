"""Multi-host (DCN) federated mode: 2-process jax.distributed dryrun.

The reference's truly-distributed federation is a server process and client
processes over gRPC (nerve_cl/federated/server.py:113-138); the TPU-native
analogue is a multi-controller SPMD FedAvg (nerve_tpu/federated/dcn.py).
This test spawns the 2-process CPU dryrun (scripts/dryrun_dcn.py), which
asserts in-process that the cross-process psum aggregation matches an
exactly-recomputed single-host reference.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dcn_two_process_dryrun():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "dryrun_dcn.py")],
        capture_output=True, text=True, timeout=900, cwd=REPO,
        env={k: v for k, v in os.environ.items()
             if k not in ("XLA_FLAGS", "JAX_PLATFORMS")},
    )
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-2000:]
    assert "dcn dryrun OK" in proc.stdout, proc.stdout[-3000:]
