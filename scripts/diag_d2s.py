#!/usr/bin/env python
"""Depth-to-space formulations shootout at 1080p→2160p.

The serving epilogue's d2s is the documented layout wall (~13-26 ms at 2160p;
half of LightweightSR's frame time). Direct Mosaic shape-cast interleaves are
unsupported ("(tw, s·c) → tw·s·c lane interleave"), so this experiment
reformulates the interleave as MXU matmuls with 0/1 scatter matrices — every
step is an op Mosaic definitely lowers:

  per input tile (8 rows, 128 px, 12 phase-ch), for each of the 6 output
  column phases u = 3·sx + c and each row phase sy:
    plane_{sy,u} = Σ_c x·δ(c == c·4+2sy+sx)          (VPU lane-reduce)
    rows_sy     += plane_{sy,u} @ S_u  (128×768 0/1)  (MXU col scatter m=6x+u)
  O(16, 768)    = L_0 @ rows_0 + L_1 @ rows_1         (MXU row interleave)

Output is (B, sH, sW·C) packed rows — byte-identical to row-major
(B, sH, sW, C).

Candidates:
  A. XLA pixel_shuffle → rank-4 (baseline, the current epilogue)
  B. XLA pixel_shuffle + reshape → rank-3 packed
  C. XLA channel-planar transpose (B, 12, H, W)
  D. Pallas matmul-interleave → rank-3 packed   (the new kernel)
  E. D with a concat+aligned-reshape row interleave instead of the L matmul
"""

from __future__ import annotations

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from nerve_tpu.ops.pixel_shuffle import pixel_shuffle  # noqa: E402
from nerve_tpu.utils.profiling import measure_dispatch_overhead, timed_scan  # noqa: E402

S = 2
C = 3
PH = S * S * C  # 12 phase channels, torch order: ch = c*4 + sy*2 + sx
TH, TW = 8, 128
OW = TW * S * C  # 768 packed output cols per tile


def _scatter_mats(dtype):
    """S_u (6, TW, OW): S_u[x, m] = 1 iff m == 6x + u."""
    x = np.arange(TW)[:, None]
    m = np.arange(OW)[None, :]
    mats = np.stack([(m == 6 * x + u) for u in range(6)]).astype(np.float32)
    return jnp.asarray(mats, dtype)


def _row_interleave_mats(dtype):
    """L_sy (2, 2·TH, TH): L_sy[r, q] = 1 iff r == 2q + sy."""
    r = np.arange(2 * TH)[:, None]
    q = np.arange(TH)[None, :]
    mats = np.stack([(r == 2 * q + sy) for sy in range(2)]).astype(np.float32)
    return jnp.asarray(mats, dtype)


def _kernel(x_ref, s_ref, l_ref, o_ref, *, use_reshape: bool):
    x = x_ref[0]  # (TH, TW, 12)
    rows = []
    for sy in range(S):
        acc = jnp.zeros((TH, OW), jnp.float32)
        for sx in range(S):
            for c in range(C):
                u = 3 * sx + c
                ch = c * 4 + sy * 2 + sx
                plane = x[:, :, ch]  # (TH, TW) lane-select
                acc += jax.lax.dot_general(
                    plane, s_ref[u],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
        rows.append(acc.astype(x.dtype))
    if use_reshape:
        # lanes [sy*OW + m] then aligned split (TH, 2·OW) → (2·TH, OW)
        both = jnp.concatenate(rows, axis=1)
        o_ref[0] = both.reshape(2 * TH, OW)
    else:
        o = jax.lax.dot_general(
            l_ref[0], rows[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + jax.lax.dot_general(
            l_ref[1], rows[1], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0] = o.astype(x.dtype)


def d2s_packed_mxu(x: jnp.ndarray, use_reshape: bool = False) -> jnp.ndarray:
    """(B, H, W, 12) → (B, 2H, 6W) packed rows via the matmul interleave."""
    b, h, w, ph = x.shape
    assert ph == PH and h % TH == 0 and w % TW == 0
    smats = _scatter_mats(x.dtype)
    lmats = _row_interleave_mats(x.dtype)
    kernel = functools.partial(_kernel, use_reshape=use_reshape)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, S * h, S * C * w), x.dtype),
        grid=(b, h // TH, w // TW),
        in_specs=[
            pl.BlockSpec((1, TH, TW, PH), lambda bi, i, j: (bi, i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((6, TW, OW), lambda bi, i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, S * TH, TH), lambda bi, i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, S * TH, OW), lambda bi, i, j: (bi, i, j),
                               memory_space=pltpu.VMEM),
    )(x, smats, lmats)


def _kernel_planar(x_ref, s_ref, o_ref, *, th: int):
    """Planar input (12, th, TW): plane slices are free tile selects."""
    x = x_ref[0]
    rows = []
    for sy in range(S):
        acc = jnp.zeros((th, OW), jnp.float32)
        for sx in range(S):
            for c in range(C):
                u = 3 * sx + c
                ch = c * 4 + sy * 2 + sx
                acc += jax.lax.dot_general(
                    x[ch], s_ref[u],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
        rows.append(acc.astype(o_ref.dtype))
    both = jnp.concatenate(rows, axis=1)  # (th, 2·OW), lanes [sy*OW + m]
    o_ref[0] = both.reshape(2 * th, OW)


def d2s_packed_planar(x: jnp.ndarray, th: int = 32) -> jnp.ndarray:
    """(B, 12, H, W) planar phases → (B, 2H, 6W) packed rows."""
    b, ph, h, w = x.shape
    assert ph == PH and h % th == 0 and w % TW == 0
    smats = _scatter_mats(x.dtype)
    kernel = functools.partial(_kernel_planar, th=th)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, S * h, S * C * w), x.dtype),
        grid=(b, h // th, w // TW),
        in_specs=[
            pl.BlockSpec((1, PH, th, TW), lambda bi, i, j: (bi, 0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((6, TW, OW), lambda bi, i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, S * th, OW), lambda bi, i, j: (bi, i, j),
                               memory_space=pltpu.VMEM),
    )(x, smats)


def main():
    on_tpu = jax.default_backend() == "tpu"
    h, w = (1080, 1920) if on_tpu else (16, 128)
    key = jax.random.PRNGKey(0)
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    x = jax.random.uniform(key, (1, h, w, PH), jnp.float32).astype(dtype)

    # ---- correctness ----------------------------------------------------- #
    ref = np.asarray(
        pixel_shuffle(x.astype(jnp.float32), S).reshape(1, S * h, S * C * w)
    )
    for use_reshape in ([False, True] if on_tpu else [False]):
        if on_tpu:
            got = np.asarray(d2s_packed_mxu(x, use_reshape), np.float32)
        else:
            got = np.asarray(
                pl.pallas_call(
                    functools.partial(_kernel, use_reshape=use_reshape),
                    out_shape=jax.ShapeDtypeStruct((1, S * h, S * C * w), x.dtype),
                    grid=(1, h // TH, w // TW),
                    in_specs=[
                        pl.BlockSpec((1, TH, TW, PH), lambda bi, i, j: (bi, i, j, 0)),
                        pl.BlockSpec((6, TW, OW), lambda bi, i, j: (0, 0, 0)),
                        pl.BlockSpec((2, S * TH, TH), lambda bi, i, j: (0, 0, 0)),
                    ],
                    out_specs=pl.BlockSpec((1, S * TH, OW), lambda bi, i, j: (bi, i, j)),
                    interpret=True,
                )(x, _scatter_mats(x.dtype), _row_interleave_mats(x.dtype)),
                np.float32,
            )
        err = np.max(np.abs(got - ref))
        print(f"parity use_reshape={use_reshape}: max abs err {err}")
        assert err < (1e-2 if dtype == jnp.bfloat16 else 1e-6)

    if not on_tpu:
        print("CPU parity OK (timings need TPU)")
        return

    # ---- timings ---------------------------------------------------------- #
    disp = measure_dispatch_overhead()
    print(f"dispatch overhead {disp:.1f} ms")

    # planar-input parity (small size, real TPU)
    xs = jax.random.uniform(key, (1, 64, TW * 2, PH), jnp.float32).astype(dtype)
    refs = np.asarray(
        pixel_shuffle(xs.astype(jnp.float32), S).reshape(1, 128, S * C * TW * 2)
    )
    for th in (8, 32):
        got = np.asarray(
            d2s_packed_planar(jnp.transpose(xs, (0, 3, 1, 2)), th), np.float32
        )
        err = np.max(np.abs(got - refs))
        print(f"planar parity th={th}: max abs err {err}")
        assert err < 1e-2

    cands = {
        "A_xla_rank4": lambda t: pixel_shuffle(t, S),
        "B_xla_rank3": lambda t: pixel_shuffle(t, S).reshape(1, S * h, S * C * w),
        "C_xla_planar": lambda t: jnp.transpose(t, (0, 3, 1, 2)),
        "D_mxu_packed": lambda t: d2s_packed_mxu(t, False),
        "E_mxu_reshape": lambda t: d2s_packed_mxu(t, True),
        "P8_planar_mxu": lambda t: d2s_packed_planar(jnp.transpose(t, (0, 3, 1, 2)), 8),
        "P32_planar_mxu": lambda t: d2s_packed_planar(jnp.transpose(t, (0, 3, 1, 2)), 32),
        "P120_planar_mxu": lambda t: d2s_packed_planar(jnp.transpose(t, (0, 3, 1, 2)), 120),
        # planar OUTPUT (the facade's channel-first contract) via pure XLA
        "F_xla_planar_out": lambda t: jnp.transpose(pixel_shuffle(t, S), (0, 3, 1, 2)),
        "G_xla_planar2planar": lambda t: (
            jnp.transpose(t, (0, 3, 1, 2))
            .reshape(1, C, S, S, h, w)
            .transpose(0, 1, 4, 2, 5, 3)
            .reshape(1, C, S * h, S * w)
        ),
    }
    for name, fn in cands.items():
        try:
            r = timed_scan(fn, x, iters=20, dispatch_overhead_ms=disp)
            print(f"{name}: {r['ms_per_call']:.2f} ms")
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}")

    # u8 output variants (serving output doesn't need bf16)
    for name, fn in {
        "D_mxu_packed_u8": lambda t: (
            d2s_packed_mxu(t, False) * 255.0
        ).astype(jnp.uint8),
        "A_xla_rank4_u8": lambda t: (pixel_shuffle(t, S) * 255.0).astype(jnp.uint8),
    }.items():
        try:
            r = timed_scan(fn, x, iters=20, dispatch_overhead_ms=disp)
            print(f"{name}: {r['ms_per_call']:.2f} ms")
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
