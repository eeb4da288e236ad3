"""Pooling primitives in NHWC / NTHWC layout.

TPU-native equivalents for the torch pooling the reference uses:
``nn.MaxPool2d(3, 2, 1)`` (nerve_cl/models/frame_recovery.py:48),
``F.max_pool3d(x, (1, 2, 2))`` (frame_recovery.py:156-159),
``nn.AdaptiveAvgPool2d`` (efficient_layers.py:168, enhancement_engine.py:311),
``nn.AdaptiveAvgPool3d((1, None, None))`` (frame_recovery.py:140).
All are reduce-window ops that XLA maps directly onto the VPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def max_pool2d(
    x: jnp.ndarray, window: int = 3, stride: int = 2, padding: int = 1
) -> jnp.ndarray:
    """Max pool over H, W of an NHWC tensor (torch MaxPool2d semantics)."""
    neg_inf = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    return lax.reduce_window(
        x,
        neg_inf,
        lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (padding, padding), (padding, padding), (0, 0)),
    )


def max_pool3d_spatial(x: jnp.ndarray) -> jnp.ndarray:
    """Spatial-only 3D max pool, kernel (1, 2, 2): (B, T, H, W, C) → (B, T, H/2, W/2, C).

    Equivalent of ``F.max_pool3d(x, (1, 2, 2))`` at frame_recovery.py:156-159
    (the reference's NCTHW becomes our NTHWC).
    """
    neg_inf = -jnp.inf
    return lax.reduce_window(
        x,
        neg_inf,
        lax.max,
        window_dimensions=(1, 1, 2, 2, 1),
        window_strides=(1, 1, 2, 2, 1),
        padding="VALID",
    )


def global_avg_pool(x: jnp.ndarray) -> jnp.ndarray:
    """Global average over H, W: (B, H, W, C) → (B, C). (AdaptiveAvgPool2d(1))."""
    return jnp.mean(x, axis=(1, 2))


def adaptive_avg_pool2d(x: jnp.ndarray, output_size: int) -> jnp.ndarray:
    """Adaptive average pooling to (output_size, output_size), NHWC.

    Matches torch AdaptiveAvgPool2d bin boundaries:
    bin i spans [floor(i*H/o), ceil((i+1)*H/o)).
    """
    b, h, w, c = x.shape
    o = output_size
    if h % o == 0 and w % o == 0:
        kh, kw = h // o, w // o
        return lax.reduce_window(
            x,
            0.0,
            lax.add,
            window_dimensions=(1, kh, kw, 1),
            window_strides=(1, kh, kw, 1),
            padding="VALID",
        ) / (kh * kw)
    # General (uneven) case: matmul with per-axis averaging matrices. Static
    # shapes → built at trace time with numpy-style jnp ops.
    def pool_matrix(size: int, out: int) -> jnp.ndarray:
        starts = (jnp.arange(out) * size) // out
        ends = -((-(jnp.arange(out) + 1) * size) // out)  # ceil
        idx = jnp.arange(size)[None, :]
        mask = (idx >= starts[:, None]) & (idx < ends[:, None])
        m = mask.astype(x.dtype)
        return m / jnp.sum(m, axis=1, keepdims=True)

    mh = pool_matrix(h, o)  # (o, h)
    mw = pool_matrix(w, o)  # (o, w)
    out = jnp.einsum("oh,bhwc->bowc", mh, x)
    out = jnp.einsum("pw,bowc->bopc", mw, out)
    return out
