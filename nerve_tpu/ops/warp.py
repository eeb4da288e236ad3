"""Backward warping of feature maps by optical flow (NHWC).

TPU-native replacement for the reference's ``warp_features``
(nerve_cl/models/super_resolution.py:104-143), which builds a normalised grid
and calls ``F.grid_sample(mode='bilinear', padding_mode='zeros',
align_corners=True)``. The reference normalises pixel+flow coordinates to
[-1, 1] and grid_sample denormalises with align_corners=True — the composition
is exactly "sample at (x + flow_x, y + flow_y) in pixel coordinates", so we
implement that directly: a 4-tap bilinear gather with per-tap zero padding
(each out-of-bounds corner contributes zero, matching grid_sample's
padding_mode='zeros').

The gather is expressed with ``jnp.take_along_axis`` over a flattened H*W
axis, which XLA lowers to TPU gathers; a fused Pallas variant lives behind
the same API for the hot serving path.
"""

from __future__ import annotations

import jax.numpy as jnp


def flow_warp(features: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Warp features backward along a flow field.

    Args:
        features: (B, H, W, C) feature maps to sample from.
        flow: (B, H, W, 2) flow in pixels; flow[..., 0] = dx, flow[..., 1] = dy
            (same channel order as the reference: grid_x+flow[:,0],
            grid_y+flow[:,1], super_resolution.py:126-133).

    Returns:
        (B, H, W, C): features sampled at (x + dx, y + dy), bilinear,
        zeros outside the image.
    """
    b, h, w, c = features.shape
    compute_dtype = jnp.promote_types(features.dtype, jnp.float32)

    gx = jnp.arange(w, dtype=compute_dtype)[None, None, :]
    gy = jnp.arange(h, dtype=compute_dtype)[None, :, None]
    x = gx + flow[..., 0].astype(compute_dtype)
    y = gy + flow[..., 1].astype(compute_dtype)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    feat_flat = features.reshape(b, h * w, c)

    def tap(xi: jnp.ndarray, yi: jnp.ndarray, weight: jnp.ndarray) -> jnp.ndarray:
        valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        idx = (yc * w + xc).reshape(b, h * w, 1)
        vals = jnp.take_along_axis(feat_flat, idx, axis=1).reshape(b, h, w, c)
        weight = jnp.where(valid, weight, 0.0).astype(compute_dtype)
        return vals.astype(compute_dtype) * weight[..., None]

    out = (
        tap(x0, y0, (1 - wx) * (1 - wy))
        + tap(x0 + 1, y0, wx * (1 - wy))
        + tap(x0, y0 + 1, (1 - wx) * wy)
        + tap(x0 + 1, y0 + 1, wx * wy)
    )
    return out.astype(features.dtype)
