#!/usr/bin/env python
"""Hardware A/B: bf16 vs int8 fused conv chains at the REAL serving shapes.

VERDICT r3 item #2: extend int8 past the RDB chain. This times every
conv-chain site on SuperResolutionNet's 1080p serving path:

  head   — feature extractor head, 3→64 relu @1080p (super_resolution.py:51)
  gff    — global feature fusion, 64→64 relu @1080p (:365)
  up     — upsampler conv, 64→12 @1080p (layers.py:205)
  attn   — aggregator attention, [3×64]→64→64→3 @1080p (:151, fused concat)
  flow   — flow head @540p, 81→128→64→32→2 (:111, downsample-2 serving)

For each: XLA-f32 oracle err + ms/frame of the production bf16 fused chain
vs the int8 fused chain (ops.conv_chain_int8). Run on a healthy tunnel:
    python -u scripts/diag_chain_int8.py [sites...]
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp

from nerve_tpu.ops import conv_chain as cc
from nerve_tpu.ops import conv_chain_int8 as cc8
from nerve_tpu.utils.profiling import timed_scan

H, W = 1080, 1920


def _chain(key, shapes, last_act="none"):
    params = []
    n = len(shapes)
    for i, (kh, cin, cout) in enumerate(shapes):
        key, k1, k2 = jax.random.split(key, 3)
        act = "relu" if i < n - 1 else last_act
        params.append((
            jax.random.normal(k1, (kh, kh, cin, cout)) * (1.5 / (kh * (cin ** 0.5))),
            jax.random.normal(k2, (cout,)) * 0.02,
            act,
        ))
    return params


SITES = {
    # name: (input shapes [(h, w, c), ...], layer shapes [(k, cin, cout)])
    "head": ([(H, W, 3)], [(3, 3, 64)], "relu"),
    "gff": ([(H, W, 64)], [(3, 64, 64)], "relu"),
    "up": ([(H, W, 64)], [(3, 64, 12)], "none"),
    "attn": ([(H, W, 64)] * 3, [(3, 192, 64), (3, 64, 64), (3, 64, 3)], "none"),
    "flow": ([(H // 2, W // 2, 81)],
             [(3, 81, 128), (3, 128, 64), (3, 64, 32), (3, 32, 2)], "none"),
}


def run_site(name: str) -> None:
    in_shapes, layer_shapes, last_act = SITES[name]
    key = jax.random.PRNGKey(hash(name) % 2**31)
    params = _chain(jax.random.fold_in(key, 1), layer_shapes, last_act)
    xs = [
        (jax.random.normal(jax.random.fold_in(key, 10 + i), (1, h, w, c)) * 0.5)
        for i, (h, w, c) in enumerate(in_shapes)
    ]
    xs_b = [x.astype(jnp.bfloat16) for x in xs]
    x_arg = xs_b if len(xs_b) > 1 else xs_b[0]
    cout = layer_shapes[-1][2]

    # Correctness on a small crop first (cheap; full-frame oracle is slow).
    crop = [x[:, :96, :128] for x in xs]
    crop_b = [x.astype(jnp.bfloat16) for x in crop]
    ref = cc.conv_chain_apply(
        crop if len(crop) > 1 else crop[0],
        [(w.astype(jnp.float32), b.astype(jnp.float32), a) for w, b, a in params],
        use_pallas=False,
    )
    scales = cc8.calibrate_conv_chain(crop if len(crop) > 1 else crop[0], params)
    qchain = cc8.quantize_conv_chain(params, scales)
    got8 = cc8.conv_chain_int8_apply(
        crop_b if len(crop_b) > 1 else crop_b[0], qchain, cout,
        out_dtype=jnp.float32,
    )
    scale = float(jnp.max(jnp.abs(ref))) + 1e-6
    rel8 = float(jnp.max(jnp.abs(got8 - ref))) / scale
    print(f"{name}: int8 vs f32 rel err {rel8:.4f}", flush=True)

    params_b = [(w.astype(jnp.bfloat16), b.astype(jnp.bfloat16), a)
                for w, b, a in params]

    def bf16_fused(x0, *rest):
        allx = (x0,) + rest if rest else x0
        return cc.conv_chain_apply(allx, params_b, use_pallas=True)

    def int8_fused(x0, *rest):
        allx = (x0,) + rest if rest else x0
        return cc8.conv_chain_int8_apply(allx, qchain, cout)

    def xla_bf16(x0, *rest):
        allx = (x0,) + rest if rest else x0
        return cc.conv_chain_apply(allx, params_b, use_pallas=False)

    a0, rest = xs_b[0], tuple(xs_b[1:])
    for label, fn in (("bf16_fused", bf16_fused), ("int8_fused", int8_fused),
                      ("xla_bf16", xla_bf16)):
        try:
            t = timed_scan(fn, a0, *rest, iters=8, warmup=1)
            print(f"{name}/{label}: {t['ms_per_call']:.2f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name}/{label}: FAILED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)


def main():
    names = _sys.argv[1:] or list(SITES)
    for n in names:
        run_site(n)


if __name__ == "__main__":
    main()
