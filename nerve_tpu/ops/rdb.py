"""Fused Residual Dense Block — the SR network's FLOP hot spot.

The reference's ResidualDenseBlock (nerve_cl/models/super_resolution.py:212-253)
is 5 densely-connected 3×3 convs (growth 32) + a 1×1 fusion + 0.2-scaled
residual, stacked 8× in SuperResolutionNet. Lowered conv-by-conv through XLA,
every layer round-trips its growing concatenation through HBM (≈4 GB per
block at 1080p) and the 32-channel conv outputs starve the MXU — measured
≈88 ms per block at 1080p on v5e.

This kernel fuses the ENTIRE block in VMEM — one HBM read of the 64-channel
input, one write of the 64-channel output — using a *shift-after-matmul*
formulation chosen for the MXU:

  * A persistent scratch tile holds the dense concatenation zero-padded to a
    fixed 256 channels (64 input + 5·32 growth + padding), with a 1-pixel
    zero ring for SAME-conv semantics.
  * Each dense layer is ONE matmul ``Y = X · W`` with K=256 (zero-padded
    weights — structural zeros make the padding exact) and N=288 = 9·32: all
    nine 3×3 taps' contributions computed at once with full 128-lane MXU
    occupancy, instead of nine N=32 matmuls at 25 % occupancy.
  * The conv result is then assembled by 9 *statically shifted adds* of the
    (…, 32) tap blocks — cheap VPU work entirely in VMEM.
  * The 1×1 local-feature fusion reuses the same X·(256→64) matmul shape.

Tiles carry a 5-pixel halo (five sequential 3×3 convs). The W-halo is
materialised as overlapping strips by the wrapper (≈4 % extra HBM traffic);
the H-halo is assembled in-kernel from two row-band BlockSpecs — no manual
DMA, the pipeline stays fully automatic.

Gradients: `rdb_fused` carries a custom VJP whose backward differentiates the
mathematically-identical XLA formulation (`_rdb_xla`), so training works
everywhere while serving gets the fused forward.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NUM_LAYERS = 5
GROWTH = 32
HALO = NUM_LAYERS  # one pixel per sequential 3x3 conv
KPAD = 256  # 64 input + 5*32 growth = 224, padded to 2 MXU K-tiles
ONE_CH = KPAD - 1  # constant-ones channel: biases fold into matmul rows


def _pack_weights(params: Sequence[jnp.ndarray], features: int):
    """(w1,b1,...,w5,b5,lw,lb) → stacked (5, KPAD, 288) + (5, GROWTH) + lff.

    Wcat[i, k, (3·dy+dx)·32 + c] = w_i[dy, dx, k, c]; K zero-padded to KPAD
    so every layer multiplies the same fixed-width scratch (the padding is
    exact — the extra channels carry structural zero weights).
    """
    wcats = []
    for i in range(NUM_LAYERS):
        w, b = params[2 * i], params[2 * i + 1]
        k = w.shape[2]
        wp = jnp.pad(w, ((0, 0), (0, 0), (0, KPAD - k), (0, 0)))
        wcat = jnp.transpose(wp, (2, 0, 1, 3)).reshape(KPAD, 9 * GROWTH)
        # Bias folds into the constant-ones channel's row, in the CENTER tap
        # block only (tap s=4 reads each output position exactly once).
        wcat = wcat.at[ONE_CH, 4 * GROWTH : 5 * GROWTH].set(b)
        wcats.append(wcat)
    wstack = jnp.stack(wcats).astype(params[0].dtype)
    lw, lb = params[10], params[11]
    lwp = jnp.pad(lw, ((0, KPAD - lw.shape[0]), (0, 0)))
    lwp = lwp.at[ONE_CH, :].set(lb)
    return wstack, lwp.astype(lw.dtype)


def _rdb_kernel(
    band0_ref,
    band1_ref,
    wstack_ref,
    lw_ref,
    out_ref,
    scratch,
    *,
    th: int,
    tw: int,
    features: int,
):
    """Channel-major fused RDB. Layout: (C, H, W) tiles.

    scratch (KPAD, ph, pw) holds the zero-padded dense concatenation with a
    1-pixel zero ring; channel ONE_CH is constant ones so biases arrive via
    the matmul. Layers run in a fori_loop whose per-layer growth slot is a
    dynamic-offset store on the MAJOR (channel) dim — cheap, and only one
    (288, m) tap-product buffer is live at a time.
    """
    hh, ww = th + 2 * HALO, tw + 2 * HALO
    ph, pw = hh + 2, ww + 2
    m = ph * pw

    scratch[...] = jnp.zeros((KPAD, ph, pw), scratch.dtype)
    scratch[ONE_CH : ONE_CH + 1, :, :] = jnp.ones((1, ph, pw), scratch.dtype)
    band = jnp.concatenate([band0_ref[0], band1_ref[0]], axis=1)[:, :hh]
    scratch[:features, 1 : 1 + hh, 1 : 1 + ww] = band

    def matmul(w):  # (KPAD, N) → (N, ph, pw) with f32 accumulation
        x = scratch[...].reshape(KPAD, m)
        y = lax.dot_general(
            w, x, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return y.reshape(w.shape[1], ph, pw)

    def layer(i, _):
        y = matmul(wstack_ref[i]).astype(scratch.dtype)  # (288, ph, pw)
        acc = jnp.zeros((GROWTH, hh, ww), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                s = (3 * dy + dx) * GROWTH
                acc = acc + y[s : s + GROWTH, dy : dy + hh, dx : dx + ww].astype(
                    jnp.float32
                )
        f = jnp.maximum(acc, 0.0)
        scratch[
            pl.ds(features + i * GROWTH, GROWTH), 1 : 1 + hh, 1 : 1 + ww
        ] = f.astype(scratch.dtype)
        return 0

    jax.lax.fori_loop(0, NUM_LAYERS, layer, 0)

    lff = matmul(lw_ref[:])
    x_in = scratch[:features, 1 : 1 + hh, 1 : 1 + ww].astype(jnp.float32)
    out = lff[:, 1 : 1 + hh, 1 : 1 + ww] * 0.2 + x_in
    out_ref[0] = out[:, HALO : HALO + th, HALO : HALO + tw].astype(out_ref.dtype)


def _rdb_pallas(
    x: jnp.ndarray,
    params: Sequence[jnp.ndarray],
    th: int = 24,
    tw: int = 116,
) -> jnp.ndarray:
    b, h, w, c = x.shape
    th = max(th, 2 * HALO)
    ph = -h % th
    nh = (h + ph) // th
    tw = min(tw, w)
    # pw = tw + 12 must be a multiple of 128 for the (KPAD, ph·pw) row merge.
    if tw + 12 >= 128:
        tw -= (tw + 12) % 128
    else:
        tw = 128 - 12
    pw_pad = -w % tw
    nw = (w + pw_pad) // tw
    wp = w + pw_pad

    pad_bottom = (nh + 1) * th - (h + HALO)
    # Channel-major (B, C, H', W') — one transpose in, one out; XLA cancels
    # adjacent pairs when blocks are chained.
    xt = jnp.transpose(x, (0, 3, 1, 2))
    xp = jnp.pad(xt, ((0, 0), (0, 0), (HALO, pad_bottom), (HALO, HALO + pw_pad)))

    if nw > 1:
        strips = [
            lax.slice_in_dim(xp, j * tw, j * tw + tw + 2 * HALO, axis=3)
            for j in range(nw)
        ]
        xs = jnp.stack(strips, axis=1).reshape(
            b * nw, c, xp.shape[2], tw + 2 * HALO
        )
        eff_b = b * nw
    else:
        xs = xp
        eff_b = b

    packed = _pack_weights(params, c)
    kernel = functools.partial(_rdb_kernel, th=th, tw=tw, features=c)
    band_spec = lambda shift: pl.BlockSpec(  # noqa: E731
        (1, c, th, tw + 2 * HALO),
        lambda bi, hi, shift=shift: (bi, 0, hi + shift, 0),
        memory_space=pltpu.VMEM,
    )
    full_spec = lambda arr: pl.BlockSpec(  # noqa: E731
        arr.shape, lambda bi, hi: (0,) * arr.ndim, memory_space=pltpu.VMEM
    )

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((eff_b, c, nh * th, tw), x.dtype),
        grid=(eff_b, nh),
        in_specs=[band_spec(0), band_spec(1)] + [full_spec(p) for p in packed],
        out_specs=pl.BlockSpec(
            (1, c, th, tw), lambda bi, hi: (bi, 0, hi, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((KPAD, th + 2 * HALO + 2, tw + 2 * HALO + 2), x.dtype)
        ],
    )(xs, xs, *packed)

    if nw > 1:
        out = out.reshape(b, nw, c, nh * th, tw)
        out = jnp.transpose(out, (0, 2, 3, 1, 4)).reshape(b, c, nh * th, wp)
    out = out[:, :, :h, :w]
    return jnp.transpose(out, (0, 2, 3, 1))


def _rdb_xla(x: jnp.ndarray, params: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Reference XLA formulation (identical math; autodiff/backward path)."""
    (w1, b1, w2, b2, w3, b3, w4, b4, w5, b5, lw, lb) = params
    feats = [x]
    for wk, bk in ((w1, b1), (w2, b2), (w3, b3), (w4, b4), (w5, b5)):
        inp = feats[0] if len(feats) == 1 else jnp.concatenate(feats, axis=-1)
        dn = lax.conv_dimension_numbers(inp.shape, wk.shape, ("NHWC", "HWIO", "NHWC"))
        f = lax.conv_general_dilated(
            inp, wk, (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=jnp.float32,
        ) + bk.astype(jnp.float32)
        feats.append(jnp.maximum(f, 0.0).astype(x.dtype))
    full = jnp.concatenate(feats, axis=-1)
    lff = jnp.einsum(
        "bhwk,kn->bhwn", full.astype(jnp.float32), lw.astype(jnp.float32)
    ) + lb.astype(jnp.float32)
    return (lff * 0.2 + x.astype(jnp.float32)).astype(x.dtype)


@jax.custom_vjp
def rdb_fused(x: jnp.ndarray, params: Tuple[jnp.ndarray, ...]) -> jnp.ndarray:
    """Fused residual dense block: (B, H, W, C) → (B, H, W, C).

    ``params`` = (w1, b1, ..., w5, b5, lff_w, lff_b) with wi of shape
    (3, 3, C + (i-1)·GROWTH, GROWTH) and lff_w of shape (C + 5·GROWTH, C).
    """
    return _rdb_pallas(x, params)


def _rdb_fwd(x, params):
    return rdb_fused(x, params), (x, params)


def _rdb_bwd(res, g):
    x, params = res
    _, vjp = jax.vjp(lambda xx, pp: _rdb_xla(xx, pp), x, params)
    return vjp(g)


rdb_fused.defvjp(_rdb_fwd, _rdb_bwd)


def rdb_apply(
    x: jnp.ndarray, params: Sequence[jnp.ndarray], use_pallas: bool | None = None
) -> jnp.ndarray:
    """Dispatch between the fused TPU kernel and the XLA formulation."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        return rdb_fused(x, tuple(params))
    return _rdb_xla(x, tuple(params))
