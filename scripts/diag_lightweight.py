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


def tile_sweep(model, variables, frame, n=32):
    """Whole-body fused chain (head + 4×DWSep + tail, halo 6) across tiles.

    Larger tiles amortise the 6-pixel halo recompute (interior fraction
    (th·tw)/((th+14)(tw+14)-ish)) against VMEM pressure."""
    from nerve_tpu import ops

    x = frame.astype(jnp.bfloat16)

    def chain_for(v):
        # Same folding as the model's serving path.
        p, st = v["params"], v["batch_stats"]
        chain = [(p["head"]["kernel"], p["head"]["bias"], "relu")]
        for i in range(4):
            b = p[f"body{i}"]
            bn, bs = b["BatchNorm_0"], st[f"body{i}"]["BatchNorm_0"]
            inv = bn["scale"] / jnp.sqrt(bs["var"] + 1e-5)
            chain.append((b["depthwise"]["kernel"][:, :, 0, :],
                          jnp.zeros((32,), jnp.float32), "none"))
            chain.append((b["pointwise"]["kernel"] * inv[None, None, None, :],
                          bn["bias"] - bs["mean"] * inv, "relu"))
        chain.append((p["tail"]["kernel"], p["tail"]["bias"], "none"))
        return chain

    chain = chain_for(variables)
    ref = None
    # Tiles bounded by the Mosaic register-spill wall: the 10-layer flat
    # unroll does NOT share stack slots across stages (measured 85 MB of
    # spill slots at (64,240) → VMEM OOM at the 128 MB ceiling), so the
    # sweep stays in the small-tile regime.
    for th, tw in ((32, 120), (32, 240), (64, 120), (64, 240)):
        try:
            @jax.jit
            def run(xx, chain=chain, tile=(th, tw)):
                def body(fr, _):
                    # Exact-tile sweep: bypass the production VMEM auto-fit.
                    out = ops.conv_chain_apply(fr, chain, tile=tile,
                                               fit_vmem=False)
                    s = jnp.mean(out[0, :8, :8], dtype=jnp.float32)
                    bump = fr[:1, :1, :1, :1] + (s * 1e-9).astype(fr.dtype)
                    return jax.lax.dynamic_update_slice(fr, bump, (0, 0, 0, 0)), s

                fr, ss = jax.lax.scan(body, xx, None, length=n)
                return ss.sum() + jnp.float32(fr.reshape(-1)[-1])

            float(run(x))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                got = float(run(x))
                best = min(best, time.perf_counter() - t0)
            if ref is None:
                ref = got
            ok = "ok" if abs(got - ref) < 1e-2 * max(1.0, abs(ref)) else "MISMATCH"
            print(f"tile ({th:3d},{tw:3d}): {best / n * 1000:6.2f} ms/frame {ok}",
                  flush=True)
        except Exception as e:  # noqa: BLE001 — sweep survives OOM tiles
            print(f"tile ({th:3d},{tw:3d}): FAILED {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)
    # XLA module-path reference timing for the same body.
    @jax.jit
    def run_xla(xx):
        def body(fr, _):
            out = ops.conv_chain_apply(fr, chain, use_pallas=False)
            s = jnp.mean(out[0, :8, :8], dtype=jnp.float32)
            bump = fr[:1, :1, :1, :1] + (s * 1e-9).astype(fr.dtype)
            return jax.lax.dynamic_update_slice(fr, bump, (0, 0, 0, 0)), s

        fr, ss = jax.lax.scan(body, xx, None, length=n)
        return ss.sum() + jnp.float32(fr.reshape(-1)[-1])

    float(run_xla(x))
    t0 = time.perf_counter()
    float(run_xla(x))
    print(f"XLA chain       : {(time.perf_counter() - t0) / n * 1000:6.2f} "
          f"ms/frame", flush=True)


def main():
    assert jax.default_backend() == "tpu"
    if "--pet" in sys.argv:
        # Native-dtype matmul emission in the fused chains (exact math;
        # tests/test_conv_chain.py) — compare ms/frame against the default.
        from nerve_tpu.ops import conv_chain

        conv_chain.PET_CHUNKS = True
        print("PET_CHUNKS=True")
    h, w = 1080, 1920
    n = 32
    model = LightweightSuperResolution(scale_factor=2, dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    frame = jax.random.uniform(key, (1, h, w, 3), jnp.float32)
    variables = jax.jit(model.init)(key, frame)

    if "--tiles" in sys.argv:
        tile_sweep(model, variables, frame, n)
        return

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
