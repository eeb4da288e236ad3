#!/usr/bin/env python
"""NERVE-TPU headline benchmark.

Measures the flagship serving path from BASELINE.json: SuperResolutionNet
2× SR at 1080p→2160p, 64 features, 8 residual dense blocks,
temporal_window=1 (3-frame window), bf16 compute, single chip. The serving
config uses coarse-level flow (flow_downsample=2, the LiteFlowNet-pyramid
style optimisation); the reference-exact full-res flow path is covered by
parity tests instead.

The measured path is the STREAMING video pipeline
(nerve_tpu.models.streaming): one scan step per video frame, with the
sliding window's shared feature maps carried between steps — each frame is
feature-extracted once, not 2w+1 times. This is how the framework actually
serves video (enhance_video_streaming), and the carry is a genuine
frame-to-frame data dependence, so nothing can be elided.

Timing methodology: the per-dispatch tunnel/host round-trip on this setup is
~30 ms, so a naive dispatch-per-frame loop would measure the tunnel, not the
chip. We scan N frames inside ONE jitted program and report N / wall-time —
dispatch overhead is amortised into the figure, making it slightly
conservative.

Prints ONE JSON line:
  {"metric": "sr_1080p_2x_fps", "value": N, "unit": "frames/sec/chip",
   "vs_baseline": N}

``vs_baseline`` is fps / 60 — the fraction of the BASELINE.json north-star
(≥60 fps 1080p→2160p per chip). The PyTorch reference has no 1080p number
(its README benchmarks 64×64 synthetic patches on an M1), so the target, not
the reference hardware, is the denominator.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

from nerve_tpu.models import SuperResolutionNet
from nerve_tpu.models.streaming import streaming_prime, streaming_step


def main() -> None:
    on_tpu = jax.default_backend() == "tpu"
    h, w = (1080, 1920) if on_tpu else (72, 128)
    n_frames = 16 if on_tpu else 2

    model = SuperResolutionNet(
        scale_factor=2,
        num_features=64,
        num_residual_blocks=8,
        temporal_window=1,
        flow_downsample=2,
        dtype=jnp.bfloat16,
    )
    key = jax.random.PRNGKey(0)
    frames = jax.random.uniform(key, (1, 3, h, w, 3), jnp.float32)
    variables = jax.jit(model.init)(key, frames)

    @jax.jit
    def run_n(v, x):
        """Stream n_frames through the serving pipeline; returns a scalar.

        The streaming carry (cached neighbour features) chains every step to
        the previous one. Each step derives its "new frame" from the last
        output's corner statistic — a real data dependence at negligible
        cost, so the scan cannot be collapsed.
        """
        carry0 = streaming_prime(model, v, x[:, 0])

        def body(state, _):
            carry, frame, acc = state
            carry, out = streaming_step(model, v, carry, frame)
            s = jnp.mean(out[0, :64, :64, 0], dtype=jnp.float32)
            bump = frame[:1, :1, :1, :1] + (s * 1e-12).astype(frame.dtype)
            frame = jax.lax.dynamic_update_slice(frame, bump, (0, 0, 0, 0))
            return (carry, frame, acc + s), None

        (_, _, acc), _ = jax.lax.scan(
            body, (carry0, x[:, 1], jnp.float32(0)), None, length=n_frames
        )
        return acc

    # Warmup / compile (forces full execution via the scalar fetch).
    float(run_n(variables, frames))

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run_n(variables, frames))
        best = min(best, time.perf_counter() - t0)

    fps = n_frames / best
    result = {
        "metric": "sr_1080p_2x_fps" if on_tpu else "sr_proxy_fps_cpu",
        "value": round(fps, 3),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / 60.0, 4),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
