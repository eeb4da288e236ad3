#!/usr/bin/env python
"""End-to-end lightweight serving: NHWC vs planar streaming carry.

scripts/diag_planar.py measured the 10-layer BN-folded body ALONE at
11.1 ms/frame when the frame enters as planar (B, C, H, W) vs 13.7 ms
NHWC — XLA fuses the transpose into the head conv's im2col and keeps W
minormost, where an NHWC frame pads its 3-channel minor dim to lanes.

This script decides whether that ~19 % body win survives the FULL serving
step (body + bicubic base + residual add + packed MXU depth-to-space,
every output frame materialised in HBM) — i.e. whether the headline bench
should carry frames planar. Planar is also the reference's native layout
(torch NCHW), so a planar carry is free at the facade boundary.

Variants (identical math; parity asserted on hardware first):
  nhwc    — round-2 production: carry (B, H, W, C).
  planar  — carry (B, C, H, W); one transpose feeds the NHWC graph.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from nerve_tpu.models import LightweightSuperResolution  # noqa: E402


def build(h, w):
    model = LightweightSuperResolution(scale_factor=2, dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    frame = jax.random.uniform(key, (1, h, w, 3), jnp.float32)
    variables = jax.jit(model.init)(key, frame)
    return model, variables, frame


def time_scan(step, x0, n=32):
    """bench.py methodology: scan n frames inside one jitted program with a
    real data dependence between steps; every packed output lands in HBM."""

    @jax.jit
    def run_n(x):
        def body(state, _):
            fr, acc = state
            out = step(fr)
            s = jnp.mean(out[0, :64, :64], dtype=jnp.float32)
            bump = fr[:1, :1, :1, :1] + (s * 1e-12).astype(fr.dtype)
            fr = jax.lax.dynamic_update_slice(fr, bump, (0, 0, 0, 0))
            return (fr, acc + s), out

        (_, acc), ys = jax.lax.scan(body, (x, jnp.float32(0)), None, length=n)
        return acc + jnp.float32(ys[-1, 0, -1, -1])

    float(run_n(x0))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run_n(x0))
        best = min(best, time.perf_counter() - t0)
    return best / n * 1000.0


def main():
    assert jax.default_backend() == "tpu"
    h, w = 1080, 1920
    model, variables, frame = build(h, w)

    def step_nhwc(fr):
        return model.apply(variables, fr, False, "packed")

    def step_planar(fr):
        return model.apply(
            variables, jnp.transpose(fr, (0, 2, 3, 1)), False, "packed"
        )

    fb = frame.astype(jnp.bfloat16)
    fp = jnp.transpose(fb, (0, 3, 1, 2))

    # Hardware parity: same packed bytes from both carries.
    a = jax.jit(step_nhwc)(fb)
    b = jax.jit(step_planar)(fp)
    err = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
    print(f"parity (packed output): maxerr={err:.3e}", flush=True)
    assert err == 0.0, "planar carry must be byte-identical"

    ms = time_scan(step_nhwc, fb)
    print(f"nhwc   carry: {ms:6.2f} ms/frame ({1000.0 / ms:5.1f} fps)", flush=True)
    ms = time_scan(step_planar, fp)
    print(f"planar carry: {ms:6.2f} ms/frame ({1000.0 / ms:5.1f} fps)", flush=True)


if __name__ == "__main__":
    main()
