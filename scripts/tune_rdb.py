#!/usr/bin/env python
"""Tile-size sweep for the fused RDB kernel at the serving resolution."""

from __future__ import annotations

import argparse
import functools

import jax
import jax.numpy as jnp

from nerve_tpu.ops import rdb
from nerve_tpu.utils.profiling import measure_dispatch_overhead, timed_scan


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--h", type=int, default=1080)
    p.add_argument("--w", type=int, default=1920)
    p.add_argument("--feats", type=int, default=64)
    p.add_argument("--iters", type=int, default=6)
    p.add_argument("--tiles", type=str,
                   default="16x120,22x216,16x216,24x120,32x120,16x240,12x240,8x240,22x120")
    args = p.parse_args()

    key = jax.random.PRNGKey(0)
    c = args.feats
    x = jax.random.normal(key, (1, args.h, args.w, c), jnp.bfloat16)
    params = []
    k = c
    for i in range(5):
        params.append(jax.random.normal(key, (3, 3, k, 32), jnp.bfloat16) * 0.05)
        params.append(jnp.zeros((32,), jnp.bfloat16))
        k += 32
    params.append(jax.random.normal(key, (k, c), jnp.bfloat16) * 0.05)
    params.append(jnp.zeros((c,), jnp.bfloat16))
    params = tuple(params)

    over = measure_dispatch_overhead()
    print(f"dispatch ~{over:.1f} ms")

    for spec in args.tiles.split(","):
        th, tw = (int(v) for v in spec.split("x"))
        fn = functools.partial(rdb._rdb_pallas_nhwc, th=th, tw=tw)
        try:
            r = timed_scan(lambda xx, pp: fn(xx, pp), x, params,
                           iters=args.iters, dispatch_overhead_ms=over)
            print(f"th={th:3d} tw={tw:3d}  {r['ms_per_call']:7.2f} ms/block")
        except Exception as e:  # noqa: BLE001
            print(f"th={th:3d} tw={tw:3d}  FAILED: {str(e)[:120]}")


if __name__ == "__main__":
    main()
