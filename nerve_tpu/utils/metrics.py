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


def _ssim_and_cs(
    pred: jnp.ndarray, target: jnp.ndarray, data_range: float,
    kernel_size: int, sigma: float,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Mean SSIM and mean contrast-structure term (for MS-SSIM levels)."""
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    p = pred.astype(jnp.float32)
    t = target.astype(jnp.float32)
    g = _gaussian_kernel(kernel_size, sigma)
    c = p.shape[-1]

    def dwconv(x, k):
        kh_, kw_ = k.shape
        kernel = jnp.broadcast_to(k[:, :, None, None], (kh_, kw_, 1, c))
        dn = lax.conv_dimension_numbers(
            x.shape, (kh_, kw_, 1, c), ("NHWC", "HWIO", "NHWC"))
        return lax.conv_general_dilated(
            x, kernel, (1, 1), "VALID", dimension_numbers=dn,
            feature_group_count=c)

    def gblur(x):
        return dwconv(dwconv(x, g.reshape(-1, 1)), g.reshape(1, -1))

    mu_p, mu_t = gblur(p), gblur(t)
    sigma_pp = jnp.maximum(gblur(p * p) - mu_p * mu_p, 0.0)
    sigma_tt = jnp.maximum(gblur(t * t) - mu_t * mu_t, 0.0)
    sigma_pt = gblur(p * t) - mu_p * mu_t
    cs = (2 * sigma_pt + c2) / (sigma_pp + sigma_tt + c2)
    lum = (2 * mu_p * mu_t + c1) / (mu_p * mu_p + mu_t * mu_t + c1)
    return jnp.mean(lum * cs), jnp.mean(cs)


# Wang et al. (2003) per-scale exponents.
_MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def ms_ssim(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    data_range: float = 1.0,
    levels: int = 5,
    kernel_size: int = 11,
    sigma: float = 1.5,
) -> jnp.ndarray:
    """Multi-scale SSIM (Wang et al. 2003), NHWC, range [0, data_range].

    Needs H, W ≥ kernel_size · 2^(levels-1); pass a smaller ``levels`` for
    small images. Each level downsamples by 2×2 average pooling.
    """
    weights = _MSSSIM_WEIGHTS[:levels]
    weights = tuple(w / sum(weights) for w in weights)
    p = pred.astype(jnp.float32)
    t = target.astype(jnp.float32)
    vals = []
    for lvl in range(levels):
        s, cs = _ssim_and_cs(p, t, data_range, kernel_size, sigma)
        vals.append(s if lvl == levels - 1 else cs)
        if lvl < levels - 1:
            p = lax.reduce_window(
                p, 0.0, lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID") / 4.0
            t = lax.reduce_window(
                t, 0.0, lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID") / 4.0
    out = jnp.float32(1.0)
    for v, w in zip(vals, weights):
        out = out * jnp.maximum(v, 0.0) ** w
    return out


def msssim_levels_for(height: int, width: int, kernel_size: int = 11) -> int:
    """Largest MS-SSIM level count that fits an image (static, jit-safe)."""
    levels = 1
    while levels < 5 and min(height, width) >= kernel_size * (2 ** levels):
        levels += 1
    return levels


def vmaf_proxy(
    pred: jnp.ndarray, target: jnp.ndarray, data_range: float = 1.0,
    levels: int = 5,
) -> jnp.ndarray:
    """A 0-100 perceptual-quality score standing in for VMAF.

    The reference declares VMAF in its metric suite (nerve_cl/config/
    default.yaml:198) and gates CI on "min VMAF 70" but never implements
    either (the CI check is an echo stub, .github/workflows/
    model-deployment.yml:31-38). Real VMAF is a trained SVR over VIF/DLM/
    motion features; no such model ships in this environment, so this proxy
    fuses the same kind of evidence — multi-scale structural fidelity
    (MS-SSIM, the strongest single VMAF correlate) and signal fidelity
    (PSNR, saturating at 50 dB) — into the familiar 0-100 scale:

        score = 100 · (0.8 · ms_ssim + 0.2 · min(psnr, 50)/50)

    Identical frames score 100. The score is monotone under increasing
    distortion, which is what the CI gate and the ABR reward actually
    consume. It is NOT calibrated to libvmaf's absolute values.
    """
    m = ms_ssim(pred, target, data_range=data_range, levels=levels)
    p = jnp.minimum(psnr(pred, target, data_range=data_range), 50.0) / 50.0
    return 100.0 * (0.8 * m + 0.2 * p)


def temporal_of(pred_video: jnp.ndarray, target_video: jnp.ndarray) -> jnp.ndarray:
    """Cheap tOF proxy: mean abs difference of temporal gradients.

    Measures temporal-consistency error between consecutive frames —
    the 'tOF' entry of the reference's declared metric suite
    (default.yaml:201-203). Inputs: (B, T, H, W, C). For the actual
    flow-based tOF see :func:`tof`.
    """
    dp = pred_video[:, 1:] - pred_video[:, :-1]
    dt = target_video[:, 1:] - target_video[:, :-1]
    return jnp.mean(jnp.abs(dp.astype(jnp.float32) - dt.astype(jnp.float32)))


# --------------------------------------------------------------------------- #
# Flow-based temporal metrics (tOF / tLP)
#
# The reference DECLARES tOF / tLP / VMAF-proxy in its metric suite
# (nerve_cl/config/default.yaml:194-207) but never implements them. Here they
# are real, self-contained, and jittable: tOF compares pyramidal Lucas-Kanade
# flow fields of consecutive output vs ground-truth frames (the standard tOF
# definition, Chu et al. 2020), and tLP compares the frame-to-frame
# perceptual change using 1−SSIM as the LPIPS stand-in (no pretrained
# network is available in this environment; the proxy choice is documented
# in the docstring and monotone in the same flicker artefacts).
# --------------------------------------------------------------------------- #
def _to_gray(x: jnp.ndarray) -> jnp.ndarray:
    """(..., H, W, C) → (..., H, W) luminance (Rec. 601 for 3 channels)."""
    x = x.astype(jnp.float32)
    if x.shape[-1] == 3:
        w = jnp.array([0.299, 0.587, 0.114], jnp.float32)
        return jnp.einsum("...c,c->...", x, w)
    return jnp.mean(x, axis=-1)


def _box(x: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Separable box filter over the trailing two axes of (B, H, W)."""
    k = 2 * radius + 1
    kern = jnp.ones((k,), jnp.float32) / 1.0  # plain sum (LK normal equations)
    pad = [(0, 0), (radius, radius), (0, 0)]
    xp = jnp.pad(x, pad)
    x = lax.conv_general_dilated(
        xp[:, :, :, None], kern[:, None, None, None], (1, 1), "VALID",
        dimension_numbers=lax.conv_dimension_numbers(
            xp[:, :, :, None].shape, (k, 1, 1, 1), ("NHWC", "HWIO", "NHWC")
        ),
    )[:, :, :, 0]
    xp = jnp.pad(x, [(0, 0), (0, 0), (radius, radius)])
    return lax.conv_general_dilated(
        xp[:, :, :, None], kern[None, :, None, None], (1, 1), "VALID",
        dimension_numbers=lax.conv_dimension_numbers(
            xp[:, :, :, None].shape, (1, k, 1, 1), ("NHWC", "HWIO", "NHWC")
        ),
    )[:, :, :, 0]


def _lk_level(i1: jnp.ndarray, i2: jnp.ndarray, flow: jnp.ndarray,
              radius: int) -> jnp.ndarray:
    """One Lucas-Kanade refinement at the current scale.

    i1/i2: (B, H, W) grayscale; flow: (B, H, W, 2) current estimate (dx, dy).
    Warps i2 by the estimate, then solves the 2×2 normal equations per pixel
    over a (2r+1)² window.
    """
    from nerve_tpu.ops.warp import flow_warp

    i2w = flow_warp(i2[..., None], flow, chunk_rows=0)[..., 0]
    ix = (jnp.roll(i1, -1, axis=2) - jnp.roll(i1, 1, axis=2)) * 0.5
    iy = (jnp.roll(i1, -1, axis=1) - jnp.roll(i1, 1, axis=1)) * 0.5
    it = i2w - i1

    sxx = _box(ix * ix, radius)
    sxy = _box(ix * iy, radius)
    syy = _box(iy * iy, radius)
    sxt = _box(ix * it, radius)
    syt = _box(iy * it, radius)

    det = sxx * syy - sxy * sxy
    ok = det > 1e-6
    det = jnp.where(ok, det, 1.0)
    du = jnp.where(ok, -(syy * sxt - sxy * syt) / det, 0.0)
    dv = jnp.where(ok, -(sxx * syt - sxy * sxt) / det, 0.0)
    return flow + jnp.stack([du, dv], axis=-1)


def lucas_kanade_flow(
    frame1: jnp.ndarray, frame2: jnp.ndarray,
    levels: int = 3, radius: int = 3, iters: int = 2,
) -> jnp.ndarray:
    """Pyramidal Lucas-Kanade optical flow, pure JAX (jittable).

    Args:
        frame1/frame2: (B, H, W, C) in [0, 1]; flow maps frame1 → frame2
            sample positions (same convention as ops.warp.flow_warp:
            frame1(y, x) ≈ frame2(y + dy, x + dx)).
        levels: pyramid levels (coarse-to-fine, 2× per level).
        radius: LK window radius at every level.
        iters: refinement iterations per level.

    Returns:
        (B, H, W, 2) flow in pixels (dx, dy).
    """
    from nerve_tpu.ops.resize import resize_bilinear

    g1 = _to_gray(frame1)
    g2 = _to_gray(frame2)
    b, h, w = g1.shape
    # Don't pyramid below ~32 px — coarse levels on tiny images destabilise
    # the estimate instead of extending its range.
    max_levels = 1
    while min(h, w) // (2 ** max_levels) >= 32 and max_levels < levels:
        max_levels += 1
    levels = max_levels

    pyramid = []
    l1, l2 = g1, g2
    for lvl in range(levels):
        pyramid.append((l1, l2))
        if lvl < levels - 1:
            nh, nw = max(l1.shape[1] // 2, 8), max(l1.shape[2] // 2, 8)
            l1 = resize_bilinear(l1[..., None], (nh, nw))[..., 0]
            l2 = resize_bilinear(l2[..., None], (nh, nw))[..., 0]

    flow = jnp.zeros(pyramid[-1][0].shape + (2,), jnp.float32)
    for l1, l2 in reversed(pyramid):
        if flow.shape[1:3] != l1.shape[1:3]:
            scale_y = l1.shape[1] / flow.shape[1]
            scale_x = l1.shape[2] / flow.shape[2]
            flow = resize_bilinear(flow, l1.shape[1:3]) * jnp.array(
                [scale_x, scale_y], jnp.float32
            )
        for _ in range(iters):
            flow = _lk_level(l1, l2, flow, radius)
    return flow


def tof(pred_video: jnp.ndarray, target_video: jnp.ndarray,
        levels: int = 3, radius: int = 3) -> jnp.ndarray:
    """tOF: mean |flow(pred_t→t+1) − flow(target_t→t+1)| in pixels.

    The standard temporal-consistency metric for video SR (declared but
    unimplemented in the reference, default.yaml:201). Lower is better; a
    temporally stable output whose motion matches the ground truth scores 0.
    Inputs: (B, T, H, W, C) in [0, 1].
    """
    t = pred_video.shape[1]
    total = jnp.float32(0)
    for i in range(t - 1):
        fp = lucas_kanade_flow(pred_video[:, i], pred_video[:, i + 1],
                               levels=levels, radius=radius)
        ft = lucas_kanade_flow(target_video[:, i], target_video[:, i + 1],
                               levels=levels, radius=radius)
        total = total + jnp.mean(jnp.abs(fp - ft))
    return total / max(t - 1, 1)


def tlp(pred_video: jnp.ndarray, target_video: jnp.ndarray) -> jnp.ndarray:
    """tLP proxy: |d(pred_t, pred_t+1) − d(target_t, target_t+1)|, d = 1−SSIM.

    The tLP metric (default.yaml:202) uses LPIPS as d; no pretrained
    perceptual network exists in this environment, so d is the structural
    dissimilarity 1−SSIM — like LPIPS it is a full-reference perceptual
    distance that grows under the flicker/texture-crawl artefacts tLP is
    meant to expose. Lower is better. Inputs: (B, T, H, W, C).
    """
    t = pred_video.shape[1]
    total = jnp.float32(0)
    for i in range(t - 1):
        dp = 1.0 - ssim(pred_video[:, i], pred_video[:, i + 1])
        dt = 1.0 - ssim(target_video[:, i], target_video[:, i + 1])
        total = total + jnp.abs(dp - dt)
    return total / max(t - 1, 1)
