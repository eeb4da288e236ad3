#!/usr/bin/env python
"""Planar fused chain vs XLA for the lightweight body — hardware timing.

The decision this script feeds: LightweightSuperResolution's serving body
is currently the XLA BN-folded chain (~14 ms/frame of the 15.7 ms total at
1080p). The planar kernel (nerve_tpu.ops.planar_chain) keeps all 10 layers
in VMEM with full-lane-width tap work; if it lands near its ~4-6 ms
roofline the headline goes from ~63 fps toward ~100 fps.

Parity is asserted on hardware before any timing is reported.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from nerve_tpu.models import LightweightSuperResolution  # noqa: E402
from nerve_tpu.ops import planar_chain as pc  # noqa: E402


def chain_for(v):
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
    return [(w.astype(jnp.bfloat16), b.astype(jnp.bfloat16), a)
            for w, b, a in chain]


def time_run(fn, x, n=32):
    @jax.jit
    def run(xx):
        def body(fr, _):
            out = fn(fr)
            s = jnp.mean(out[0, :, :8, :8], dtype=jnp.float32)
            bump = fr[:1, :1, :1, :1] + (s * 1e-9).astype(fr.dtype)
            return jax.lax.dynamic_update_slice(fr, bump, (0, 0, 0, 0)), s

        fr, ss = jax.lax.scan(body, x, None, length=n)
        return ss.sum() + jnp.float32(fr.reshape(-1)[-1])

    float(run(x))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(x))
        best = min(best, time.perf_counter() - t0)
    return best / n * 1000.0


def main():
    assert jax.default_backend() == "tpu"
    h, w = 1080, 1920
    model = LightweightSuperResolution(scale_factor=2, dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    frame = jax.random.uniform(key, (1, h, w, 3), jnp.float32)
    variables = jax.jit(model.init)(key, frame)
    chain = chain_for(variables)
    xp = jnp.transpose(frame, (0, 3, 1, 2)).astype(jnp.bfloat16)

    # Hardware parity first (maxerr vs the XLA planar formulation).
    ws = tuple(c[0] for c in chain)
    bs = tuple(c[1] for c in chain)
    acts = tuple(c[2] for c in chain)
    small = xp[:, :, :216, :512]
    ref = pc._planar_xla(small, ws, bs, acts).astype(jnp.float32)
    got = jax.jit(
        lambda xx: pc._planar_pallas(xx, ws, bs, acts, th=32, tw=256,
                                     fit_vmem=False)
    )(small).astype(jnp.float32)
    scale = float(jnp.max(jnp.abs(ref))) or 1.0
    err = float(jnp.max(jnp.abs(got - ref))) / scale
    print(f"hardware parity (216x512): relerr={err:.3e}", flush=True)
    assert err < 3e-2, "planar kernel diverges on hardware"

    # Tile widths must be multiples of 128 (BlockSpec divisibility); keep
    # tiles modest — remote-compile time grows superlinearly in tile area
    # (a (32,1920) tile sat >18 min in the AOT service, 2026-08-19).
    for th, tw in ((32, 256), (32, 384), (32, 640), (48, 384), (16, 384)):
        try:
            ms = time_run(
                lambda xx, t=(th, tw): pc.planar_chain_apply(
                    xx, chain, use_pallas=True, tile=t, fit_vmem=False
                ),
                xp,
            )
            print(f"planar tile ({th:3d},{tw:4d}): {ms:6.2f} ms/frame", flush=True)
        except Exception as e:  # noqa: BLE001 — sweep survives bad tiles
            print(f"planar tile ({th:3d},{tw:4d}): FAILED {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)

    ms = time_run(lambda xx: pc._planar_xla(xx, ws, bs, acts), xp)
    print(f"XLA planar chain  : {ms:6.2f} ms/frame", flush=True)

    from nerve_tpu.ops import conv_chain as cc

    xn = frame.astype(jnp.bfloat16)
    ms = time_run(
        lambda xx: cc.conv_chain_apply(xx, chain, use_pallas=False), xn
    )
    print(f"XLA NHWC chain    : {ms:6.2f} ms/frame", flush=True)


if __name__ == "__main__":
    main()
