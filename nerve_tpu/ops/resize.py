"""Image resizing (bicubic / bilinear) in NHWC layout.

Replaces the reference's ``nn.Upsample(mode='bicubic', align_corners=False)``
(nerve_cl/models/super_resolution.py:321-325) and
``F.interpolate(mode='bilinear', align_corners=False)``
(nerve_cl/models/frame_recovery.py:434-438).

Bicubic is implemented from scratch as a separable 4-tap interpolation with
the Catmull-Rom-style cubic kernel at A = -0.75 — PyTorch's convention
(jax.image.resize uses the Keys kernel A = -0.5, which does NOT match torch;
verified numerically). Half-pixel centres (align_corners=False), border
replication at edges, exactly like torch. The 4 taps per axis are static
gathers + weighted sums which XLA fuses; for integer upscales the gather
indices are a repeating pattern the compiler vectorises well.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


_A = -0.75  # torch / OpenCV bicubic coefficient


def _cubic_contribs(in_size: int, out_size: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-output-pixel 4-tap indices and weights along one axis.

    Returns:
        idx: (out_size, 4) int32 clamped source indices.
        w:   (out_size, 4) float32 kernel weights (sum to 1).
    """
    scale = in_size / out_size
    x = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) * scale - 0.5
    x0 = jnp.floor(x)
    t = x - x0  # fractional phase in [0, 1)

    # Distances of the 4 taps (x0-1, x0, x0+1, x0+2) from the sample point.
    d = jnp.stack([t + 1.0, t, 1.0 - t, 2.0 - t], axis=-1)

    a = _A
    ad = jnp.abs(d)
    w_near = (a + 2.0) * ad**3 - (a + 3.0) * ad**2 + 1.0  # |d| <= 1
    w_far = a * ad**3 - 5.0 * a * ad**2 + 8.0 * a * ad - 4.0 * a  # 1 < |d| < 2
    w = jnp.where(ad <= 1.0, w_near, w_far)

    idx = x0[:, None].astype(jnp.int32) + jnp.array([-1, 0, 1, 2], jnp.int32)[None, :]
    idx = jnp.clip(idx, 0, in_size - 1)
    return idx, w


def _interp_axis(x: jnp.ndarray, axis: int, out_size: int) -> jnp.ndarray:
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    idx, w = _cubic_contribs(in_size, out_size)
    taps = jnp.take(x, idx.reshape(-1), axis=axis)
    new_shape = list(x.shape)
    new_shape[axis : axis + 1] = [out_size, 4]
    taps = taps.reshape(new_shape)
    wshape = [1] * taps.ndim
    wshape[axis] = out_size
    wshape[axis + 1] = 4
    return jnp.sum(taps * w.reshape(wshape), axis=axis + 1)


def resize_bicubic(x: jnp.ndarray, out_hw: Sequence[int]) -> jnp.ndarray:
    """Bicubic (A=-0.75, torch-parity) resize of (B, H, W, C) to (B, oh, ow, C)."""
    oh, ow = out_hw
    dtype = x.dtype
    y = x.astype(jnp.float32)
    y = _interp_axis(y, 1, oh)
    y = _interp_axis(y, 2, ow)
    return y.astype(dtype)


def upsample_bicubic(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """Bicubic upsampling by an integer factor (the SR residual-learning base)."""
    b, h, w, c = x.shape
    return resize_bicubic(x, (h * scale, w * scale))


def resize_bilinear(x: jnp.ndarray, out_hw: Sequence[int]) -> jnp.ndarray:
    """Bilinear resize of (B, H, W, C), half-pixel centres (align_corners=False)."""
    b, h, w, c = x.shape
    oh, ow = out_hw
    out = jax.image.resize(x.astype(jnp.float32), (b, oh, ow, c), method="linear", antialias=False)
    return out.astype(x.dtype)
