"""Jit-compatible image/video quality metrics.

The reference keeps ad-hoc PSNR helpers in scripts
(experiments/train_baseline.py:27-32) and a global-statistics SSIM in its
README (README.md:340-351); its declared metric suite
(nerve_cl/config/default.yaml:194-207) is never implemented. Here the metrics
are a real module: pure jnp functions usable inside jitted eval loops.

All functions accept NHWC (or any trailing-spatial layout noted per function)
and assume pixel range [0, 1] unless ``data_range`` says otherwise.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def mse(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2)


def mae(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(pred.astype(jnp.float32) - target.astype(jnp.float32)))


def psnr(pred: jnp.ndarray, target: jnp.ndarray, data_range: float = 1.0) -> jnp.ndarray:
    """Peak signal-to-noise ratio in dB (matches train_baseline.py:27-32)."""
    err = mse(pred, target)
    return 10.0 * jnp.log10((data_range**2) / jnp.maximum(err, 1e-12))


def _gaussian_kernel(size: int, sigma: float) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(x**2) / (2.0 * sigma**2))
    return g / jnp.sum(g)


def ssim(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    data_range: float = 1.0,
    kernel_size: int = 11,
    sigma: float = 1.5,
) -> jnp.ndarray:
    """Structural similarity (windowed, per the standard Wang et al. formulation).

    Uses a separable 11×11 Gaussian window — a proper local SSIM, unlike the
    reference README's global-statistics shortcut (README.md:340-351).

    Args:
        pred, target: (B, H, W, C) in [0, data_range].

    Returns:
        scalar mean SSIM.
    """
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    p = pred.astype(jnp.float32)
    t = target.astype(jnp.float32)

    g = _gaussian_kernel(kernel_size, sigma)
    c = p.shape[-1]

    # Separable depthwise Gaussian blur (H pass then W pass), VALID padding.
    def dwconv(x: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
        kh_, kw_ = k.shape[0], k.shape[1]
        kernel = jnp.broadcast_to(k[:, :, None, None], (kh_, kw_, 1, c))
        dn = lax.conv_dimension_numbers(
            x.shape, (kh_, kw_, 1, c), ("NHWC", "HWIO", "NHWC")
        )
        return lax.conv_general_dilated(
            x, kernel, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c
        )

    def gblur(x: jnp.ndarray) -> jnp.ndarray:
        return dwconv(dwconv(x, g.reshape(-1, 1)), g.reshape(1, -1))

    mu_p = gblur(p)
    mu_t = gblur(t)
    mu_pp = mu_p * mu_p
    mu_tt = mu_t * mu_t
    mu_pt = mu_p * mu_t
    # Clamp variances at 0: for near-constant patches the blur(x²)−mu²
    # cancellation can go slightly negative in f32, which pushes SSIM > 1.
    sigma_pp = jnp.maximum(gblur(p * p) - mu_pp, 0.0)
    sigma_tt = jnp.maximum(gblur(t * t) - mu_tt, 0.0)
    sigma_pt = gblur(p * t) - mu_pt

    num = (2 * mu_pt + c1) * (2 * sigma_pt + c2)
    den = (mu_pp + mu_tt + c1) * (sigma_pp + sigma_tt + c2)
    return jnp.mean(num / den)


def temporal_of(pred_video: jnp.ndarray, target_video: jnp.ndarray) -> jnp.ndarray:
    """tOF proxy: mean abs difference of temporal gradients.

    Measures temporal-consistency error between consecutive frames —
    the 'tOF' entry of the reference's declared metric suite
    (default.yaml:201-203). Inputs: (B, T, H, W, C).
    """
    dp = pred_video[:, 1:] - pred_video[:, :-1]
    dt = target_video[:, 1:] - target_video[:, :-1]
    return jnp.mean(jnp.abs(dp.astype(jnp.float32) - dt.astype(jnp.float32)))
