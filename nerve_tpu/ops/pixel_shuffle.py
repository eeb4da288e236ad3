"""Sub-pixel (pixel-shuffle) upsampling in NHWC layout.

TPU-native replacement for ``torch.nn.PixelShuffle`` as used by the reference's
``PixelShuffleUpsampler`` (nerve_cl/models/layers/efficient_layers.py:70-106).
Implemented as a pure reshape/transpose, which XLA fuses into neighbouring ops
(no materialised intermediate).
"""

from __future__ import annotations

import jax.numpy as jnp


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
