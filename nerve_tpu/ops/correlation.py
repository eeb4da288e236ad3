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
# Pallas TPU kernel
# --------------------------------------------------------------------------- #


def _corr_kernel(f1_ref, f2_hbm, out_ref, f2_tile, sem, *, d: int, th: int, tw: int, c: int):
    """Per-tile correlation: f1 tile in VMEM, haloed f2 tile DMA'd from HBM.

    out_ref layout is (1, D², TH, TW): each displacement writes a full
    (TH, TW) plane (lane-aligned along W) instead of a single output lane,
    keeping VPU stores wide.
    """
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    D = 2 * d + 1

    copy = pltpu.make_async_copy(
        f2_hbm.at[b, pl.ds(i * th, th + 2 * d), pl.ds(j * tw, tw + 2 * d), :],
        f2_tile,
        sem,
    )
    copy.start()

    f1 = f1_ref[0].astype(jnp.float32)  # (TH, TW, C)
    inv_c = 1.0 / c

    copy.wait()

    for di in range(D):
        for dj in range(D):
            f2s = f2_tile[di : di + th, dj : dj + tw, :].astype(jnp.float32)
            corr = jnp.sum(f1 * f2s, axis=-1) * inv_c  # (TH, TW)
            out_ref[0, di * D + dj, :, :] = corr


def _correlation_pallas(
    f1: jnp.ndarray, f2: jnp.ndarray, d: int, tile: Tuple[int, int] = (16, 128)
) -> jnp.ndarray:
    b, h, w, c = f1.shape
    D = 2 * d + 1
    th, tw = tile
    th = min(th, max(8, h))
    ph = -h % th
    pw = -w % tw
    nh, nw = (h + ph) // th, (w + pw) // tw

    f1p = jnp.pad(f1, ((0, 0), (0, ph), (0, pw), (0, 0)))
    # f2 gets the displacement halo (d each side) plus tile-alignment padding.
    f2p = jnp.pad(f2, ((0, 0), (d, d + ph), (d, d + pw), (0, 0)))

    kernel = functools.partial(_corr_kernel, d=d, th=th, tw=tw, c=c)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, D * D, h + ph, w + pw), jnp.float32),
        grid=(b, nh, nw),
        in_specs=[
            pl.BlockSpec(
                (1, th, tw, c),
                lambda bi, hi, wi: (bi, hi, wi, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, D * D, th, tw),
            lambda bi, hi, wi: (bi, 0, hi, wi),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((th + 2 * d, tw + 2 * d, c), f2.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )(f1p, f2p)
    out = out[:, :, :h, :w]
    return jnp.transpose(out, (0, 2, 3, 1))  # (B, H, W, D²)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _correlation_tpu(f1: jnp.ndarray, f2: jnp.ndarray, d: int) -> jnp.ndarray:
    return _correlation_pallas(f1, f2, d)


def _corr_fwd(f1, f2, d):
    return _correlation_pallas(f1, f2, d), (f1, f2)


def _corr_bwd_impl(f1, f2, d, g):
    # d/df1 and d/df2 of the XLA formulation (identical math) — the backward
    # is conv-like scatter/gather that XLA fuses well on its own.
    _, vjp = jax.vjp(lambda a, b: _correlation_xla(a, b, d), f1, f2)
    return vjp(g)


def _corr_bwd(d, res, g):
    f1, f2 = res
    df1, df2 = _corr_bwd_impl(f1, f2, d, g)
    return df1, df2


_correlation_tpu.defvjp(_corr_fwd, _corr_bwd)


def correlation_volume(
    f1: jnp.ndarray,
    f2: jnp.ndarray,
    max_displacement: int = 4,
    use_pallas: bool | None = None,
) -> jnp.ndarray:
    """Correlation cost volume between two NHWC feature maps.

    Args:
        f1: (B, H, W, C) source features.
        f2: (B, H, W, C) target features.
        max_displacement: d; output has (2d+1)² channels.
        use_pallas: force kernel choice; None auto-selects (Pallas on TPU).

    Returns:
        (B, H, W, (2d+1)²) float32 cost volume, normalised by C.
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        return _correlation_tpu(f1, f2, max_displacement)
    return _correlation_xla(f1, f2, max_displacement)
