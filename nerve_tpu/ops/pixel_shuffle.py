"""Sub-pixel (pixel-shuffle) upsampling in NHWC layout.

TPU-native replacement for ``torch.nn.PixelShuffle`` as used by the reference's
``PixelShuffleUpsampler`` (nerve_cl/models/layers/efficient_layers.py:70-106).
Implemented as a pure reshape/transpose, which XLA fuses into neighbouring ops
(no materialised intermediate).

For the SERVING epilogue at 2160p the reshape/transpose form is a layout
trap: the rank-4 (B, sH, sW, 3) result has a 3-lane minor dim, and XLA's
tiled layouts turn the final depth-to-space into ~100 MB layout copies
(measured 14-26 ms at 2160p f32). ``depth_to_space_packed`` emits rank-3
(B, sH, sW·C) "packed rows" (memory-identical to row-major interleaved RGB)
— clean (8, 128) tiling. CURRENT STATUS: the Pallas kernel only runs in
interpret mode — real Mosaic cannot lower the (tw, s·c)→(tw·s·c) lane
interleave ("unsupported shape cast"), and every alternative formulation
hits the same wall (strided stores unsupported; any rank-k output with a
3/6/12-lane minor re-creates the bad layout; u8/bf16 d2s measured 13/9.7 ms
— not materially better). Revisit if Mosaic grows minor-dim-merge support.
The function is correct everywhere via its XLA fallback (use_pallas=False /
non-TPU backends).
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


def _d2s_packed_kernel(x_ref, out_ref, *, scale: int, c: int, tw: int):
    """(1, th, tw, C·s²) block → (1, th·s, tw·s·C) packed-row block."""
    xb = x_ref[0]  # (th, tw, C*s*s)
    th = xb.shape[0]
    # Output flat column (s·x + px)·C + ch ← input channel ch·s² + py·s + px.
    rows = []
    for py in range(scale):
        # (th, tw, s, C): slot (px, ch) ← channel ch*s*s + py*s + px
        sel = jnp.stack(
            [
                jnp.stack(
                    [xb[:, :, ch * scale * scale + py * scale + px] for ch in range(c)],
                    axis=-1,
                )
                for px in range(scale)
            ],
            axis=-2,
        )  # (th, tw, s, C)
        rows.append(sel.reshape(th, tw * scale * c))
    # Interleave the s phase-row tensors along the row axis.
    stacked = jnp.stack(rows, axis=1)  # (th, s, tw·s·C)
    out_ref[0] = stacked.reshape(th * scale, tw * scale * c)


def depth_to_space_packed(
    x: jnp.ndarray, scale: int, use_pallas: bool | None = None
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
    if use_pallas is None:
        use_pallas = False  # Mosaic cannot lower the lane interleave yet
    if not use_pallas:
        return pixel_shuffle(x, s).reshape(b, h * s, w * s * c)

    th, tw = 64, 256
    th = min(th, h)
    tw = min(tw, w)
    nh = -(-h // th)
    nw = -(-w // tw)
    pad_h = nh * th - h
    pad_w = nw * tw - w
    xp = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))

    kernel = functools.partial(_d2s_packed_kernel, scale=s, c=c, tw=tw)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, nh * th * s, nw * tw * s * c), x.dtype),
        grid=(b, nh, nw),
        in_specs=[
            pl.BlockSpec(
                (1, th, tw, c_in),
                lambda bi, hi, wi: (bi, hi, wi, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (1, th * s, tw * s * c),
            lambda bi, hi, wi: (bi, hi, wi),
            memory_space=pltpu.VMEM,
        ),
    )(xp)
    return out[:, : h * s, : w * s * c]
