#!/usr/bin/env python
"""Round-4 lightweight headroom: layouts, batching, stage budget.

VERDICT r3 item #5: the headline (63.5 fps packed-NHWC) sits 6 % over the
60 fps north star with ~3 ms of identified epilogue slack. Candidates:

  packed       — production baseline: NHWC carry, packed (B, sH, sW·C) out.
  planar_out   — NHWC carry, PLANAR (B, C, sH, sW) output: the reference's
                 native NCHW contract; the planar d2s measured 0.14-0.45 ms
                 vs 0.40 packed (docs/perf_notes.md round 2).
  planar_full  — planar (B, C, H, W) carry + planar output. Round 3 found
                 the body alone runs 11.1 vs 13.7 ms with a planar frame
                 but the PACKED epilogue re-anchored the layouts (e2e wash);
                 a planar epilogue removes the anchor.
  b2 / b4      — production step at batch 2/4: thin-channel convs waste
                 lanes at B=1; batching multiplies matmul M for the same
                 weights (throughput serving; latency +B-1 frames).
  stages       — body-only / +bicubic+add / full, attributing the epilogue.

Run on a healthy tunnel: python -u scripts/diag_lightweight2.py [variants]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from nerve_tpu import ops  # noqa: E402
from nerve_tpu.models import LightweightSuperResolution  # noqa: E402

H, W = 1080, 1920
N = 32


def build(batch=1):
    model = LightweightSuperResolution(scale_factor=2, dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    frame = jax.random.uniform(key, (batch, H, W, 3), jnp.float32)
    variables = jax.jit(model.init)(key, frame[:1])
    return model, variables, frame.astype(jnp.bfloat16)


def time_scan(step, x0, n=N, frames_per_step=1):
    @jax.jit
    def run_n(x):
        def body(state, _):
            fr, acc = state
            out = step(fr)
            flat = out.reshape(-1)
            s = jnp.sum(flat[:1024], dtype=jnp.float32) * (1.0 / 1024)
            bump = (s * 1e-12).astype(fr.dtype)
            fr = fr.at[(0,) * fr.ndim].add(bump)
            return (fr, acc + s), out

        (_, acc), ys = jax.lax.scan(body, (x, jnp.float32(0)), None, length=n)
        return acc + jnp.float32(ys[-1].reshape(-1)[-1])

    float(run_n(x0))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run_n(x0))
        best = min(best, time.perf_counter() - t0)
    ms = best / n * 1000.0
    fps = 1000.0 / ms * frames_per_step
    return ms, fps


def main():
    assert jax.default_backend() == "tpu", "run on the chip"
    names = sys.argv[1:] or ["packed", "planar_out", "planar_full", "b2", "b4",
                             "stages"]
    model, variables, fb = build()
    fp = jnp.transpose(fb, (0, 3, 1, 2))

    if "packed" in names:
        ms, fps = time_scan(lambda fr: model.apply(variables, fr, False, "packed"), fb)
        print(f"packed      : {ms:6.2f} ms/frame  {fps:5.1f} fps", flush=True)
    if "planar_out" in names:
        # Parity vs packed first (planar bytes are a pure permutation).
        a = jax.jit(lambda fr: model.apply(variables, fr, False, "packed"))(fb)
        p = jax.jit(lambda fr: model.apply(variables, fr, False, "planar"))(fb)
        pp = jnp.transpose(
            p.reshape(1, 3, 2 * H, 2 * W), (0, 2, 3, 1)
        ).reshape(1, 2 * H, 2 * W * 3)
        err = float(jnp.max(jnp.abs(a.astype(jnp.float32) - pp.astype(jnp.float32))))
        print(f"planar_out parity vs packed: maxerr={err:.3e}", flush=True)
        ms, fps = time_scan(lambda fr: model.apply(variables, fr, False, "planar"), fb)
        print(f"planar_out  : {ms:6.2f} ms/frame  {fps:5.1f} fps", flush=True)
    if "planar_full" in names:
        step = lambda fr: model.apply(  # noqa: E731
            variables, jnp.transpose(fr, (0, 2, 3, 1)), False, "planar"
        )
        ms, fps = time_scan(step, fp)
        print(f"planar_full : {ms:6.2f} ms/frame  {fps:5.1f} fps", flush=True)
    for nm, b in (("b2", 2), ("b4", 4)):
        if nm in names:
            _, v_b, fbb = build(batch=b)
            ms, fps = time_scan(
                lambda fr: model.apply(v_b, fr, False, "packed"), fbb,
                frames_per_step=b,
            )
            print(f"{nm}_packed   : {ms:6.2f} ms/step   {fps:5.1f} fps "
                  f"({ms / b:.2f} ms/frame)", flush=True)
    if "stages" in names:
        # Rebuild the serving graph piecewise (mirrors the model's __call__).
        hk = variables["params"]["head"]["kernel"]
        # Use the model to fold BN once: easiest exact body = apply with a
        # tail-less surrogate is intrusive; instead time the public pieces:
        def body_only(fr):
            # Full forward but NHWC epilogue dropped: emit the residual y by
            # subtracting the bicubic base from the nhwc output pre-shuffle
            # is not accessible — so time full nhwc as the closest proxy.
            return model.apply(variables, fr, False, "nhwc")

        ms, _ = time_scan(body_only, fb)
        print(f"full_nhwc   : {ms:6.2f} ms/frame (rank-4 epilogue)", flush=True)

        def bicubic_only(fr):
            return ops.upsample_bicubic_channels(fr, 2)

        ms, _ = time_scan(bicubic_only, fb)
        print(f"bicubic_ch  : {ms:6.2f} ms/frame", flush=True)

        def d2s_only(fr):
            x12 = ops.upsample_bicubic_channels(fr, 2)
            return ops.depth_to_space_packed(x12.astype(jnp.bfloat16), 2)

        ms, _ = time_scan(d2s_only, fb)
        print(f"bicubic+d2s : {ms:6.2f} ms/frame", flush=True)


if __name__ == "__main__":
    main()
