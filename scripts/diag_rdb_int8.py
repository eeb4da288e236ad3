#!/usr/bin/env python
"""On-TPU int8 RDB chain: timing vs the bf16 fused kernel + exactness check.

Measures the serving-shape chain (1080p, 64 features, 8 blocks) and checks
the Pallas int8 kernel against the bit-faithful XLA int8 formulation on a
small shape (real-hardware Mosaic lowering check, not just interpret mode).

Run on the TPU host: python scripts/diag_rdb_int8.py [--th 40 --tw 240]
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from nerve_tpu.ops import rdb as rdb_ops
from nerve_tpu.ops import rdb_int8


def make_params(key, features=64):
    params = []
    cin = features
    for _ in range(5):
        key, k1, k2 = jax.random.split(key, 3)
        params.append(jax.random.normal(k1, (3, 3, cin, 32)) * 0.08)
        params.append(jax.random.normal(k2, (32,)) * 0.02)
        cin += 32
    key, k1, k2 = jax.random.split(key, 3)
    params.append(jax.random.normal(k1, (cin, features)) * 0.08)
    params.append(jax.random.normal(k2, (features,)) * 0.02)
    return params


def timed(fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--th", type=int, default=64)
    p.add_argument("--tw", type=int, default=240)
    p.add_argument("--blocks", type=int, default=8)
    p.add_argument("--h", type=int, default=1080)
    p.add_argument("--w", type=int, default=1920)
    p.add_argument("--skip-bf16", action="store_true")
    p.add_argument("--skip-check", action="store_true")
    p.add_argument("--dx-major", action="store_true",
                   help="A/B the dx-major chunk schedule (see ops/rdb_int8)")
    p.add_argument("--per-channel", action="store_true",
                   help="per-channel (tap-shared) scales + int32 tap "
                        "accumulation: one dequant per layer instead of "
                        "per 96-lane chunk (round-4 VPU-work experiment)")
    args = p.parse_args()

    key = jax.random.PRNGKey(0)
    feats = 64

    # ---- correctness on a small real-hardware shape ---------------------- #
    if args.skip_check:
        params_small = []
    else:
        params_small = [make_params(jax.random.fold_in(key, b)) for b in range(2)]
    if not args.skip_check:
        xs = jax.random.normal(jax.random.fold_in(key, 9), (1, 64, 256, feats)) * 0.5
        scales = rdb_int8.calibrate_rdb_chain(xs, params_small)
        qchain = rdb_int8.quantize_rdb_chain(
            params_small, scales, per_channel=args.per_channel
        )
        ref = rdb_int8.rdb_chain_int8_xla(xs, qchain, int32_taps=args.per_channel)
        out = rdb_int8.rdb_chain_int8_pallas(
            xs, qchain, th=32, tw=128, dx_major=args.dx_major,
            int32_taps=args.per_channel,
        )
        err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))
        print(f"small-shape kernel vs XLA-int8 max|err| = {err:.2e}")
        fref = xs
        for prm in params_small:
            fref = rdb_ops._rdb_xla(fref, [jnp.asarray(t) for t in prm])
        qerr = float(jnp.max(jnp.abs(ref - fref))) / float(jnp.max(jnp.abs(fref)))
        print(f"int8 vs f32 chain relative max err = {qerr:.4f}")

    # ---- serving-shape timing ------------------------------------------- #
    params_list = [make_params(jax.random.fold_in(key, 100 + b)) for b in range(args.blocks)]
    xcal = jax.random.normal(jax.random.fold_in(key, 7), (1, 128, 256, feats)) * 0.5
    scales = rdb_int8.calibrate_rdb_chain(xcal, params_list)
    qchain = jax.tree.map(
        lambda a: a,
        rdb_int8.quantize_rdb_chain(
            params_list, scales, per_channel=args.per_channel
        ),
    )
    x = (jax.random.normal(jax.random.fold_in(key, 8), (1, args.h, args.w, feats)) * 0.5
         ).astype(jnp.bfloat16)

    bf16_params = [[jnp.asarray(t, jnp.bfloat16) for t in prm] for prm in params_list]

    @jax.jit
    def run_bf16(x):
        return rdb_ops.rdb_chain_fused(
            x, tuple(tuple(p) for p in bf16_params)
        )

    @jax.jit
    def run_int8(x):
        return rdb_int8.rdb_chain_int8_pallas(
            x, qchain, out_dtype=jnp.bfloat16, th=args.th, tw=args.tw,
            dx_major=args.dx_major, int32_taps=args.per_channel,
        )

    t_bf16 = None
    if not args.skip_bf16:
        t_bf16, _ = timed(run_bf16, x)
        print(f"bf16 fused chain  ({args.blocks} blocks @ {args.h}x{args.w}): "
              f"{t_bf16 * 1e3:.1f} ms  ({t_bf16 / args.blocks * 1e3:.1f} ms/block)")
    t_int8, _ = timed(run_int8, x)
    rel = f" [{t_bf16 / t_int8:.2f}x]" if t_bf16 else ""
    print(f"int8 fused chain  ({args.blocks} blocks @ {args.h}x{args.w}): "
          f"{t_int8 * 1e3:.1f} ms  ({t_int8 / args.blocks * 1e3:.1f} ms/block)"
          f"{rel}")


if __name__ == "__main__":
    main()
