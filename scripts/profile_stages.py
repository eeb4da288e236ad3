#!/usr/bin/env python
"""Per-stage device-time attribution for the flagship SR serving path.

Times each pipeline stage of SuperResolutionNet (bench.py config: 1080p,
64 feats, 8 RDBs, tw=1, bf16, flow_downsample=2) in isolation with the
dispatch-amortised ``timed_scan`` harness, then the full forward, so the
frame budget in docs/perf_notes.md can be kept honest.

Usage:  python scripts/profile_stages.py [--h 1080 --w 1920 --iters 8]
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp

from nerve_tpu import ops
from nerve_tpu.models.super_resolution import (
    FeatureExtractor,
    MotionEstimator,
    RDBStack,
    SuperResolutionNet,
    TemporalAggregator,
)
from nerve_tpu.utils.profiling import measure_dispatch_overhead, timed_scan

import flax.linen as nn


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--h", type=int, default=1080)
    p.add_argument("--w", type=int, default=1920)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--feats", type=int, default=64)
    p.add_argument("--blocks", type=int, default=8)
    p.add_argument("--ds", type=int, default=2, help="flow downsample")
    args = p.parse_args()

    h, w, f = args.h, args.w, args.feats
    dtype = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    over = measure_dispatch_overhead()
    print(f"dispatch overhead ~{over:.1f} ms")

    def bench(name, module, *xs, method=None):
        variables = jax.jit(module.init)(key, *xs)
        fn = (lambda x0, v, *rest: module.apply(v, x0, *rest))
        r = timed_scan(fn, xs[0], variables, *xs[1:], iters=args.iters,
                       dispatch_overhead_ms=over)
        print(f"{name:28s} {r['ms_per_call']:8.2f} ms")
        return r["ms_per_call"]

    # Inputs
    frames = jax.random.uniform(key, (1, 3, h, w, 3), jnp.float32)
    feat = jax.random.normal(key, (1, h, w, f), dtype)
    feat2 = jax.random.normal(jax.random.PRNGKey(1), (1, h, w, f), dtype)
    featx2 = jnp.concatenate([feat, feat2], 0)  # (2, h, w, f): the 2 neighbours
    flow = jax.random.normal(jax.random.PRNGKey(2), (2, h, w, 2), dtype) * 3.0

    total = 0.0
    total += bench("feature_extractor (3 fr)", FeatureExtractor(f, dtype=dtype),
                   jax.random.uniform(key, (3, h, w, 3), dtype))
    total += bench("motion_estimator (2 pair)",
                   MotionEstimator(downsample=args.ds, dtype=dtype), featx2,
                   jnp.concatenate([feat, feat], 0))
    r = timed_scan(lambda x, fl: ops.flow_warp(x, fl), featx2, flow,
                   iters=args.iters, dispatch_overhead_ms=over)
    print(f"{'flow_warp (2 frames)':28s} {r['ms_per_call']:8.2f} ms")
    total += r["ms_per_call"]
    total += bench("aggregator", TemporalAggregator(f, 3, dtype=dtype),
                   jnp.stack([feat, feat2, feat], axis=1))
    total += bench("rdb_stack (8)", RDBStack(f, args.blocks, dtype=dtype), feat)
    total += bench("gff conv", nn.Conv(f, (3, 3), padding=1, dtype=dtype), feat)

    from nerve_tpu.models.layers import PixelShuffleUpsampler
    total += bench("upsampler", PixelShuffleUpsampler(2, 3, dtype=dtype), feat)
    r = timed_scan(lambda x: ops.upsample_bicubic(x, 2), frames[:, 0],
                   iters=args.iters, dispatch_overhead_ms=over)
    print(f"{'bicubic 2x':28s} {r['ms_per_call']:8.2f} ms")
    total += r["ms_per_call"]

    print(f"{'--- sum of stages':28s} {total:8.2f} ms")

    model = SuperResolutionNet(
        scale_factor=2, num_features=f, num_residual_blocks=args.blocks,
        temporal_window=1, flow_downsample=args.ds, dtype=dtype)
    variables = jax.jit(model.init)(key, frames)
    r = timed_scan(lambda x, v: model.apply(v, x), frames, variables,
                   iters=args.iters, dispatch_overhead_ms=over)
    print(f"{'FULL forward':28s} {r['ms_per_call']:8.2f} ms "
          f"({1000.0 / r['ms_per_call']:.2f} fps)")


if __name__ == "__main__":
    main()
