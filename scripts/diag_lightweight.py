#!/usr/bin/env python
"""Lightweight-SR serving harness decomposition: where do the ms go?

Variants crossed: output layout (nhwc / planar / packed) × whether the scan
stacks (materialises) every output frame. Round-1 measured 28.5 ms/frame
(nhwc, no stacking); the planar epilogue should cut the ~13 ms d2s wall.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from nerve_tpu.models import LightweightSuperResolution  # noqa: E402


def main():
    assert jax.default_backend() == "tpu"
    h, w = 1080, 1920
    n = 32
    model = LightweightSuperResolution(scale_factor=2, dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    frame = jax.random.uniform(key, (1, h, w, 3), jnp.float32)
    variables = jax.jit(model.init)(key, frame)

    def make_run(layout: str, stack: bool):
        @jax.jit
        def run(v, x):
            def body(state, _):
                fr, acc = state
                out = model.apply(v, fr, False, layout)
                corner = out[0, 0, :64, :64] if layout == "planar" else (
                    out[0, :64, :64] if layout == "packed" else out[0, :64, :64, 0]
                )
                s = jnp.mean(corner, dtype=jnp.float32)
                bump = fr[:1, :1, :1, :1] + (s * 1e-12).astype(fr.dtype)
                fr = jax.lax.dynamic_update_slice(fr, bump, (0, 0, 0, 0))
                return (fr, acc + s), (out if stack else None)

            (_, acc), ys = jax.lax.scan(body, (x, jnp.float32(0)), None, length=n)
            if stack:
                acc = acc + jnp.float32(ys[-1].reshape(-1)[-1])
            return acc

        return run

    for layout in ("nhwc", "planar", "packed"):
        for stack in (False, True):
            run = make_run(layout, stack)
            float(run(variables, frame))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(run(variables, frame))
                best = min(best, time.perf_counter() - t0)
            print(
                f"{layout:7s} stack={stack}: {best / n * 1000:6.2f} ms/frame "
                f"({n / best:6.2f} fps)", flush=True,
            )


if __name__ == "__main__":
    main()
