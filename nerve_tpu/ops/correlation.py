"""Cost-volume correlation for optical-flow estimation.

TPU-native replacement for the reference's ``LiteFlowNetCorrelation``
(nerve_cl/models/layers/efficient_layers.py:297-343), whose forward is an
81-iteration Python loop of shifted multiplies — the hottest loop in the
reference's hot path (SuperResolutionNet.forward → MotionEstimator).

Semantics (matching the reference): for displacements (i, j) in
[-d, d]², ``corr[b, h, w, k] = (1/C) * Σ_c f1[b,h,w,c] * f2[b, h+i, w+j, c]``
with zero padding outside f2, k = (i+d)*(2d+1) + (j+d). Output channel order
is identical to the reference's ``torch.cat`` order (row-major over (i, j)),
so downstream flow-net weights are interchangeable.

Two implementations behind one API:
  * ``_correlation_xla``   — 81 shifted slice-multiply-reduces; correct
    everywhere, used on CPU and as the autodiff path.
  * ``_correlation_pallas``— a Pallas TPU kernel that tiles f1 into VMEM,
    DMAs the haloed f2 tile alongside it, and accumulates all (2d+1)²
    displacement dot-products on-chip, writing a (D², TH, TW) plane per tile.
    HBM traffic drops from 2·D²·H·W·C reads (naive) to ~2·H·W·C.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _correlation_xla(f1: jnp.ndarray, f2: jnp.ndarray, d: int) -> jnp.ndarray:
    """Reference-faithful XLA formulation (B, H, W, C) → (B, H, W, (2d+1)²)."""
    b, h, w, c = f1.shape
    f2p = jnp.pad(f2, ((0, 0), (d, d), (d, d), (0, 0)))
    outs = []
    for i in range(2 * d + 1):
        for j in range(2 * d + 1):
            sl = lax.slice(f2p, (0, i, j, 0), (b, i + h, j + w, c))
            outs.append(jnp.sum(f1 * sl, axis=-1))
    return jnp.stack(outs, axis=-1) / c


# --------------------------------------------------------------------------- #
# Pallas TPU kernels
# --------------------------------------------------------------------------- #


def _corr_kernel_planar(
    f1_ref, band0_ref, band1_ref, out_ref, *, d: int, th: int, w: int, c: int
):
    """Channel-planar correlation: C on the MAJOR axis, W on lanes.

    The NHWC kernel's inner step is a multiply + cross-LANE reduction over C
    (≈log₂C shuffle-add passes over the whole tile per displacement). With
    channels planar, the C-reduction is a plain major-axis sum — C streaming
    full-lane FMAs with zero shuffles — so each displacement costs ~2 passes
    over the tile instead of ~1+log₂C.

    Refs: f1 (1, C, TH, W); band0/band1 (1, C, TH, W+2d) consecutive row
    bands (same H-halo trick as the NHWC kernel, needs TH ≥ 2d);
    out (1, D², TH, W).
    """
    D = 2 * d + 1
    f1 = f1_ref[0]  # (C, TH, W)
    band = jnp.concatenate([band0_ref[0], band1_ref[0]], axis=1)  # (C, 2TH, W+2d)
    inv_c = 1.0 / c
    for di in range(D):
        for dj in range(D):
            f2s = band[:, di : di + th, dj : dj + w]
            prod = (f1 * f2s).astype(jnp.float32)
            out_ref[0, di * D + dj, :, :] = (
                jnp.sum(prod, axis=0) * inv_c
            ).astype(out_ref.dtype)


def _correlation_pallas_planar(
    f1: jnp.ndarray, f2: jnp.ndarray, d: int, th: int = 8, tw: int = 256
) -> jnp.ndarray:
    """NHWC in → NHWC out, compute in channel-planar layout.

    The (B, H, W, C) → (B, C, H, W) transposes are cheap relayouts next to
    the 81-displacement reduction; the (B, D², H, W) output is transposed
    once, identically to the NHWC kernel's epilogue.
    """
    b, h, w, c = f1.shape
    D = 2 * d + 1
    th = max(th, 2 * d)
    ph = -h % th
    nh = (h + ph) // th

    tw = min(tw, w)
    pw = -w % tw
    nw = (w + pw) // tw
    wp = w + pw

    f1p = jnp.transpose(jnp.pad(f1, ((0, 0), (0, ph), (0, pw), (0, 0))),
                        (0, 3, 1, 2))
    pad_bottom = (nh + 1) * th - (h + d)
    f2p = jnp.transpose(
        jnp.pad(f2, ((0, 0), (d, pad_bottom), (d, d + pw), (0, 0))),
        (0, 3, 1, 2),
    )

    if nw > 1:
        # Strip-mine W into the batch dim (planar: W is the LAST axis).
        f1s = f1p.reshape(b, c, h + ph, nw, tw)
        f1s = jnp.moveaxis(f1s, 3, 1).reshape(b * nw, c, h + ph, tw)
        f2_strips = [
            lax.slice_in_dim(f2p, j * tw, j * tw + tw + 2 * d, axis=3)
            for j in range(nw)
        ]
        f2s = jnp.stack(f2_strips, axis=1).reshape(
            b * nw, c, f2p.shape[2], tw + 2 * d
        )
        eff_b, eff_w = b * nw, tw
    else:
        f1s, f2s = f1p, f2p
        eff_b, eff_w = b, wp

    kernel = functools.partial(
        _corr_kernel_planar, d=d, th=th, w=eff_w, c=c
    )
    band_spec = lambda shift: pl.BlockSpec(  # noqa: E731
        (1, c, th, eff_w + 2 * d),
        lambda bi, hi, shift=shift: (bi, 0, hi + shift, 0),
        memory_space=pltpu.VMEM,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((eff_b, D * D, h + ph, eff_w), f1.dtype),
        grid=(eff_b, nh),
        in_specs=[
            pl.BlockSpec(
                (1, c, th, eff_w), lambda bi, hi: (bi, 0, hi, 0),
                memory_space=pltpu.VMEM,
            ),
            band_spec(0),
            band_spec(1),
        ],
        out_specs=pl.BlockSpec(
            (1, D * D, th, eff_w), lambda bi, hi: (bi, 0, hi, 0),
            memory_space=pltpu.VMEM,
        ),
    )(f1s, f2s, f2s)

    if nw > 1:
        out = out.reshape(b, nw, D * D, h + ph, tw)
        out = jnp.transpose(out, (0, 3, 1, 4, 2)).reshape(b, h + ph, wp, D * D)
        return out[:, :h, :w, :]
    out = out[:, :, :h, :w]
    return jnp.transpose(out, (0, 2, 3, 1))  # (B, H, W, D²)


def _corr_kernel(f1_ref, band0_ref, band1_ref, out_ref, *, d: int, th: int, w: int, c: int):
    """Per-row-band correlation, all refs pipelined through VMEM.

    The H-halo is delivered without manual DMA: the padded f2 is passed twice
    with row-band BlockSpecs at block indices i and i+1; concatenating the two
    (TH, W+2d, C) bands yields rows [i·TH, i·TH + 2·TH) ⊇ the needed
    [i·TH, i·TH + TH + 2d) window (requires TH ≥ 2d).

    out layout is (1, D², TH, W): each displacement writes a full (TH, W)
    plane (lane-aligned along W) instead of a single output lane, keeping VPU
    stores wide; the wrapper transposes to NHWC once.
    """
    D = 2 * d + 1
    f1 = f1_ref[0]  # (TH, W, C)
    band = jnp.concatenate([band0_ref[0], band1_ref[0]], axis=0)  # (2TH, W+2d, C)
    inv_c = 1.0 / c
    for di in range(D):
        for dj in range(D):
            f2s = band[di : di + th, dj : dj + w, :]
            prod = (f1 * f2s).astype(jnp.float32)
            corr = jnp.sum(prod, axis=-1) * inv_c
            out_ref[0, di * D + dj, :, :] = corr.astype(out_ref.dtype)


def _correlation_pallas(
    f1: jnp.ndarray, f2: jnp.ndarray, d: int, th: int = 8, tw: int = 256
) -> jnp.ndarray:
    """Wrapper: strip-mine W (with 2d halo) into the batch dim, then run the
    row-band kernel per strip.

    Wide frames cannot keep a full-width band plus the 81-plane output tile in
    16 MB of VMEM, so the frame is cut into vertical strips of width ``tw``
    whose f2 halos are materialised once in HBM (~2d/tw ≈ 2% extra traffic);
    the strip axis folds into the Pallas grid's batch dimension.
    """
    b, h, w, c = f1.shape
    D = 2 * d + 1
    th = max(th, 2 * d)  # H-halo trick needs TH ≥ 2d
    ph = -h % th
    nh = (h + ph) // th

    tw = min(tw, w)
    pw = -w % tw
    nw = (w + pw) // tw
    wp = w + pw

    f1p = jnp.pad(f1, ((0, 0), (0, ph), (0, pw), (0, 0)))
    # f2 halo: d on every side, plus alignment padding, plus TH bottom rows so
    # the (i+1) band block always exists.
    pad_bottom = (nh + 1) * th - (h + d)
    f2p = jnp.pad(f2, ((0, 0), (d, pad_bottom), (d, d + pw), (0, 0)))

    if nw > 1:
        # (B, Hp', nw, TW, C) strips; f2 strips carry the 2d W-halo.
        f1s = f1p.reshape(b, h + ph, nw, tw, c)
        f1s = jnp.moveaxis(f1s, 2, 1).reshape(b * nw, h + ph, tw, c)
        f2_strips = [
            lax.slice_in_dim(f2p, j * tw, j * tw + tw + 2 * d, axis=2)
            for j in range(nw)
        ]
        f2s = jnp.stack(f2_strips, axis=1).reshape(
            b * nw, f2p.shape[1], tw + 2 * d, c
        )
        eff_b, eff_w = b * nw, tw
    else:
        f1s, f2s = f1p, f2p
        eff_b, eff_w = b, wp

    kernel = functools.partial(_corr_kernel, d=d, th=th, w=eff_w, c=c)
    band_spec = lambda shift: pl.BlockSpec(  # noqa: E731
        (1, th, eff_w + 2 * d, c),
        lambda bi, hi, shift=shift: (bi, hi + shift, 0, 0),
        memory_space=pltpu.VMEM,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((eff_b, D * D, h + ph, eff_w), f1.dtype),
        grid=(eff_b, nh),
        in_specs=[
            pl.BlockSpec(
                (1, th, eff_w, c), lambda bi, hi: (bi, hi, 0, 0), memory_space=pltpu.VMEM
            ),
            band_spec(0),
            band_spec(1),
        ],
        out_specs=pl.BlockSpec(
            (1, D * D, th, eff_w), lambda bi, hi: (bi, 0, hi, 0), memory_space=pltpu.VMEM
        ),
    )(f1s, f2s, f2s)

    if nw > 1:
        out = out.reshape(b, nw, D * D, h + ph, tw)
        out = jnp.transpose(out, (0, 3, 1, 4, 2)).reshape(b, h + ph, wp, D * D)
        return out[:, :h, :w, :]
    out = out[:, :, :h, :w]
    return jnp.transpose(out, (0, 2, 3, 1))  # (B, H, W, D²)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _correlation_tpu(
    f1: jnp.ndarray, f2: jnp.ndarray, d: int, planar: bool
) -> jnp.ndarray:
    impl = _correlation_pallas_planar if planar else _correlation_pallas
    return impl(f1, f2, d)


def _corr_fwd(f1, f2, d, planar):
    return _correlation_tpu(f1, f2, d, planar), (f1, f2)


def _corr_bwd_impl(f1, f2, d, g):
    # d/df1 and d/df2 of the XLA formulation (identical math) — the backward
    # is conv-like scatter/gather that XLA fuses well on its own.
    _, vjp = jax.vjp(lambda a, b: _correlation_xla(a, b, d), f1, f2)
    return vjp(g)


def _corr_bwd(d, planar, res, g):
    f1, f2 = res
    df1, df2 = _corr_bwd_impl(f1, f2, d, g)
    return df1, df2


_correlation_tpu.defvjp(_corr_fwd, _corr_bwd)

# Serving default, decided by measurement (scripts/diag_corr.py): the planar
# kernel's C-reduction is a major-axis streaming sum (no cross-lane
# shuffles); the NHWC kernel pays ~log₂C shuffle-add passes per displacement.
# Measured on v5e 2026-08-19 @540p c64: planar 6.41 ms vs NHWC 12.78 ms
# (maxerr 1.2e-04) — planar wins 2×.
PLANAR_DEFAULT = True


def correlation_volume(
    f1: jnp.ndarray,
    f2: jnp.ndarray,
    max_displacement: int = 4,
    use_pallas: bool | None = None,
    planar: bool | None = None,
) -> jnp.ndarray:
    """Correlation cost volume between two NHWC feature maps.

    Args:
        f1: (B, H, W, C) source features.
        f2: (B, H, W, C) target features.
        max_displacement: d; output has (2d+1)² channels.
        use_pallas: force kernel choice; None auto-selects (Pallas on TPU).
        planar: force the channel-planar kernel layout; None = measured
            default (PLANAR_DEFAULT).

    Returns:
        (B, H, W, (2d+1)²) float32 cost volume, normalised by C.
    """
    if use_pallas is None:
        from nerve_tpu.ops.dispatch import pallas_available

        use_pallas = pallas_available()
    if planar is None:
        planar = PLANAR_DEFAULT
    if use_pallas:
        return _correlation_tpu(f1, f2, max_displacement, planar)
    return _correlation_xla(f1, f2, max_displacement)
