#!/usr/bin/env python
"""Correlation-kernel layout shootout at the serving shape (540p, 64ch, d=4).

The NHWC kernel reduces over C on the LANE axis (≈log₂C shuffle-add passes
per displacement); the channel-planar kernel reduces over the MAJOR axis
(pure streaming FMAs). This times both (plus the layout transposes the
planar path needs) at the MotionEstimator's actual operating point —
SuperResolutionNet runs correlation on 540p features when
flow_downsample=2 (the benched serving config) and 1080p when exact.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from nerve_tpu.ops import correlation as corr  # noqa: E402


def timeit(fn, *args, n=20):
    fn(*args)[0].block_until_ready()
    # Fetch a scalar — block_until_ready over the tunnel does not reflect
    # device completion (docs/perf_notes.md gotchas).
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(fn(*args)[1])
        best = min(best, (time.perf_counter() - t0) / n)
    return best * 1000.0


def main():
    assert jax.default_backend() == "tpu"
    d = 4
    for (h, w, c, dtype) in (
        (540, 960, 64, jnp.bfloat16),
        (1080, 1920, 64, jnp.bfloat16),
    ):
        key = jax.random.PRNGKey(0)
        f1 = jax.random.normal(key, (1, h, w, c), jnp.float32).astype(dtype)
        f2 = jax.random.normal(key, (1, h, w, c), jnp.float32).astype(dtype)

        def make(planar):
            @jax.jit
            def run(a, b):
                def body(carry, _):
                    out = corr._correlation_tpu(carry, b, d, planar)
                    s = jnp.mean(out[0, :8, :8], dtype=jnp.float32)
                    bump = a[:1, :1, :1, :1] * 0 + (s * 1e-9).astype(a.dtype)
                    carry = jax.lax.dynamic_update_slice(
                        carry, carry[:1, :1, :1, :1] + bump, (0, 0, 0, 0)
                    )
                    return carry, s

                carry, ss = jax.lax.scan(body, a, None, length=20)
                return carry, ss.sum()

            return run

        for planar in (False, True):
            try:
                ms = timeit(make(planar), f1, f2)
                # Cross-check outputs once.
                ref = corr._correlation_tpu(f1, f2, d, False)
                got = corr._correlation_tpu(f1, f2, d, planar)
                err = float(jnp.max(jnp.abs(
                    ref.astype(jnp.float32) - got.astype(jnp.float32)
                )))
                print(f"{h}p c{c} {'planar' if planar else 'nhwc  '}: "
                      f"{ms:7.2f} ms  maxerr={err:.2e}", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"{h}p c{c} {'planar' if planar else 'nhwc  '}: FAILED "
                      f"{type(e).__name__}: {str(e)[:140]}", flush=True)


if __name__ == "__main__":
    main()
