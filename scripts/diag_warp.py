"""Warp gather-formulation timing (docs/perf_notes.md).

The 4-tap patch gather is issue-rate-bound (~17 ns per contiguous run).
The default formulation gathers (2, 2, C) NHWC slices — 4 runs of C per
output pixel (2 rows x 2 pixels). `packed_gather=True` gathers the same
bytes as (2, 2*C) slices of a (B, H, W*C) view — 2 runs of 2*C — which
halves the run count IF the engine's cost is per run, not per element.

Not part of the package — a measurement harness. Small-shape CPU parity
lives in tests/test_ops.py::test_packed_gather_matches_default.
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from nerve_tpu.ops.warp import flow_warp  # noqa: E402
from nerve_tpu.utils.profiling import (  # noqa: E402
    measure_dispatch_overhead,
    timed_scan,
)


def main():
    key = jax.random.PRNGKey(0)
    b, h, w, c = 1, 1080, 1920, 64
    feat = jax.random.normal(key, (b, h, w, c), jnp.bfloat16)
    flow = jax.random.normal(jax.random.PRNGKey(1), (b, h, w, 2), jnp.bfloat16) * 4
    over = measure_dispatch_overhead()
    print(f"dispatch ~{over:.1f} ms   shape {feat.shape} {feat.dtype}")

    variants = {
        "default(2,2,C)": dict(packed_gather=False),
        "packed(2,2C)": dict(packed_gather=True),
    }
    outs = {}
    for name, kw in variants.items():
        for chunk in (128, 0):
            fn = lambda f, fl, kw=kw, chunk=chunk: flow_warp(  # noqa: E731
                f, fl, chunk_rows=chunk, **kw
            )
            r = timed_scan(fn, feat, flow, iters=6, dispatch_overhead_ms=over)
            print(f"{name:16s} chunk={chunk:4d}  {r['ms_per_call']:7.2f} ms")
            if chunk == 128:
                outs[name] = jax.jit(fn)(feat, flow)
    vals = list(outs.values())
    err = float(jnp.max(jnp.abs(vals[0].astype(jnp.float32) - vals[1].astype(jnp.float32))))
    print(f"packed vs default maxerr (hardware): {err:.2e}")


if __name__ == "__main__":
    main()
