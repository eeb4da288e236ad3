"""Sub-pixel (pixel-shuffle) upsampling in NHWC layout.

TPU-native replacement for ``torch.nn.PixelShuffle`` as used by the reference's
``PixelShuffleUpsampler`` (nerve_cl/models/layers/efficient_layers.py:70-106).
Implemented as a pure reshape/transpose, which XLA fuses into neighbouring ops
(no materialised intermediate).

For the SERVING epilogue at 2160p the rank-4 NHWC form is a layout trap: a
(B, sH, sW, 3) result has a 3-lane minor dim, and XLA's tiled layouts turn
the final depth-to-space into ~100 MB layout copies (measured 10-26 ms at
2160p). Two fast exact alternatives (scripts/diag_d2s.py, TPU v5e, 2160p
bf16; XLA rank-4 baseline 10.15 ms):

  * :func:`pixel_shuffle_planar` — CHANNEL-FIRST (B, C, sH, sW) output, the
    reference's native contract (nerve_cl works in NCHW). Planar phases →
    planar output is a clean-layout copy on both sides; pure XLA, ~0.1-0.5 ms.
  * :func:`depth_to_space_packed` — rank-3 (B, sH, sW·C) "packed rows",
    byte-identical to row-major interleaved RGB, for raw-frame consumers.
    Mosaic cannot lower the (tw, s·c)→(tw·s·c) lane-interleave shape cast
    directly, so the Pallas kernel reformulates the interleave as MXU
    matmuls against 0/1 column-scatter matrices on channel-planar input
    tiles (every step a guaranteed-lowerable op): measured 0.40 ms — 25×
    the XLA formulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pixel_shuffle(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """Rearrange channels into spatial pixels (depth-to-space).

    Channel ordering matches torch.nn.PixelShuffle: input channel
    ``c * scale**2 + i * scale + j`` maps to output channel ``c`` at spatial
    offset ``(i, j)`` — so parameters trained here are layout-compatible with
    the reference's conv-then-shuffle head.

    Args:
        x: (B, H, W, C*scale²) NHWC input.
        scale: upscaling factor.

    Returns:
        (B, H*scale, W*scale, C).
    """
    b, h, w, c_in = x.shape
    if c_in % (scale * scale) != 0:
        raise ValueError(f"channels {c_in} not divisible by scale²={scale*scale}")
    c = c_in // (scale * scale)
    x = x.reshape(b, h, w, c, scale, scale)
    # (B, H, rh, W, rw, C)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(b, h * scale, w * scale, c)


def pixel_shuffle_planar(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """Depth-to-space emitting CHANNEL-FIRST (B, C, H·s, W·s).

    The reference's native output layout (nerve_cl is NCHW end-to-end). On
    TPU this is the fastest exact d2s: the NHWC phase tensor's transpose to
    channel-planar is a layout no-op, and planar→planar shuffling has clean
    (8, 128) tiling on both sides — measured ~0.1-0.5 ms at 2160p vs ~10 ms
    for the rank-4 NHWC form (scripts/diag_d2s.py).
    """
    b, h, w, c_in = x.shape
    s = scale
    if c_in % (s * s) != 0:
        raise ValueError(f"channels {c_in} not divisible by scale²={s*s}")
    c = c_in // (s * s)
    p = jnp.transpose(x, (0, 3, 1, 2))  # (B, C·s², H, W) — layout no-op
    p = p.reshape(b, c, s, s, h, w)
    p = p.transpose(0, 1, 4, 2, 5, 3)  # (B, C, H, sy, W, sx)
    return p.reshape(b, c, h * s, w * s)


_TW = 128  # lane-tile width the scatter matmuls are built around


def _d2s_scatter_mats(scale: int, c: int, dtype) -> jnp.ndarray:
    """S_u (s·c, TW, TW·s·c): S_u[x, m] = 1 iff m == s·c·x + u."""
    import numpy as np

    sc = scale * c
    x = np.arange(_TW)[:, None]
    m = np.arange(_TW * sc)[None, :]
    mats = np.stack([(m == sc * x + u) for u in range(sc)]).astype(np.float32)
    return jnp.asarray(mats, dtype)


def _d2s_packed_kernel(x_ref, s_ref, o_ref, *, scale: int, c: int, th: int):
    """Planar (C·s², th, TW) block → (th·s, TW·s·C) packed-row block.

    The (tw, s·c)→(tw·s·c) lane interleave is not a lowerable shape cast, so
    each output column phase u = sx·c + ch is produced by an MXU matmul
    against a 0/1 column-scatter matrix (m = s·c·x + u); the s row phases
    are then interleaved by a lane-aligned (th, s·OW)→(th·s, OW) split —
    every step an op Mosaic lowers. Exact: each output element is a single
    pass-through product.
    """
    x = x_ref[0]  # (C·s², th, TW) channel-planar
    ow = _TW * scale * c
    rows = []
    for sy in range(scale):
        acc = jnp.zeros((th, ow), jnp.float32)
        for sx in range(scale):
            for ch in range(c):
                u = sx * c + ch
                plane = x[ch * scale * scale + sy * scale + sx]  # (th, TW)
                acc += jax.lax.dot_general(
                    plane, s_ref[u],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
        rows.append(acc.astype(o_ref.dtype))
    both = jnp.concatenate(rows, axis=1)  # (th, s·OW), lanes [sy·OW + m]
    o_ref[0] = both.reshape(th * scale, ow)


def _mxu_row_tile(h: int) -> int | None:
    """Largest row-tile (≤128, ≥8, mult of 8) dividing h, or None."""
    for th in range(128, 7, -8):
        if h % th == 0:
            return th
    return None


def depth_to_space_packed(
    x: jnp.ndarray, scale: int, use_pallas: bool | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Depth-to-space emitting (B, H·s, W·s·C) packed rows (see module doc).

    The result is byte-identical to row-major (B, H·s, W·s, C): callers that
    need the rank-4 view can reshape for free on host after transfer (or pay
    the XLA layout copy on device via ``.reshape``).
    """
    b, h, w, c_in = x.shape
    s = scale
    if c_in % (s * s) != 0:
        raise ValueError(f"channels {c_in} not divisible by scale²={s*s}")
    c = c_in // (s * s)
    th = _mxu_row_tile(h)
    if use_pallas is None:
        from nerve_tpu.ops.dispatch import pallas_available

        # Scatter matrices grow as (s·c)²·TW²; s ≤ 3 keeps them ≤ 2.7 MB.
        use_pallas = (
            pallas_available() and s <= 3 and s * c <= 12
            and w % _TW == 0 and th is not None
        )
    if not use_pallas:
        return pixel_shuffle(x, s).reshape(b, h * s, w * s * c)
    if th is None or w % _TW != 0:
        raise ValueError(
            f"MXU path needs H divisible by a tile in [8,128] and W%{_TW}==0; "
            f"got H={h}, W={w} (use use_pallas=False)"
        )

    planar = jnp.transpose(x, (0, 3, 1, 2))  # layout no-op on TPU
    smats = _d2s_scatter_mats(s, c, x.dtype)
    kernel = functools.partial(_d2s_packed_kernel, scale=s, c=c, th=th)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, h * s, w * s * c), x.dtype),
        grid=(b, h // th, w // _TW),
        in_specs=[
            pl.BlockSpec(
                (1, c_in, th, _TW),
                lambda bi, hi, wi: (bi, 0, hi, wi),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (s * c, _TW, _TW * s * c),
                lambda bi, hi, wi: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, th * s, _TW * s * c),
            lambda bi, hi, wi: (bi, hi, wi),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
    )(planar, smats)
