"""Backward warping of feature maps by optical flow (NHWC).

TPU-native replacement for the reference's ``warp_features``
(nerve_cl/models/super_resolution.py:104-143), which builds a normalised grid
and calls ``F.grid_sample(mode='bilinear', padding_mode='zeros',
align_corners=True)``. The reference normalises pixel+flow coordinates to
[-1, 1] and grid_sample denormalises with align_corners=True — the composition
is exactly "sample at (x + flow_x, y + flow_y) in pixel coordinates", so we
implement that directly.

Formulation (chosen for TPU gather throughput): ONE ``lax.gather`` fetches a
(2, 2, C) patch per output pixel at the clamped integer corner, and each
patch position p gets the tent weight max(0, 1 − |coord − p|). The tent is
the exact bilinear weight for any integer position and vanishes beyond
distance 1, which reproduces grid_sample's zero padding uniformly: positions
pushed inside by the clamp are never true taps and tent-weight to zero, and
fully out-of-range samples weight to zero entirely. One 4-tap gather instead
of four 1-tap gathers quarters the gather-row count — the dominant cost of
warping on TPU.

Negative results (measured at 1080p×64ch bf16, v5e — do not retry blindly):
  * grouped-window gather (one (6, g+6, C) patch per g adjacent pixels,
    dense tent-weighting inside the window): g=4 → 165 ms, g=8 → 125 ms vs
    85 ms for the exact 4-tap gather. The shared window multiplies the
    per-pixel FMA count ~15× and the patch bytes ~3×, which costs more than
    the g× gather-issue saving. Any dense bounded-tap formulation (Pallas
    residual taps included) has the same FMA blowup.
  * f32 patch tensors: +22 ms (keep everything in the feature dtype).
  * An in-VMEM Pallas gather kernel (row-band DMA + per-pixel loads) is NOT
    expressible: Mosaic's only dynamic addressing is scalar-start slices
    (pl.ds) — there is no per-lane vector gather — so per-pixel (y, x)
    indexing degenerates to the dense bounded-tap formulation above, which
    loses. The XLA 4-tap patch gather (~17 ns/row issue rate, ≈35 ms/frame
    of pure gather at 1080p×64ch) stands as the accepted floor for EXACT
    grid_sample semantics; revisit only if Mosaic grows a gather primitive.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def flow_warp(
    features: jnp.ndarray,
    flow: jnp.ndarray,
    chunk_rows: int = 128,
    packed_gather: bool = False,
) -> jnp.ndarray:
    """Warp features backward along a flow field.

    Args:
        features: (B, H, W, C) feature maps to sample from.
        flow: (B, H, W, 2) flow in pixels; flow[..., 0] = dx, flow[..., 1] = dy
            (same channel order as the reference: grid_x+flow[:,0],
            grid_y+flow[:,1], super_resolution.py:126-133).
        chunk_rows: output rows gathered per sequential chunk. The 4-tap patch
            buffer is 4× the feature map (2.1 GB at 1080p×64ch); chunking
            bounds peak HBM to ~4·chunk_rows·W·C while the gathers stream.
        packed_gather: express the per-pixel patch as a (2, 2·C) slice of a
            (B, H, W·C) view instead of a (2, 2, C) slice of the NHWC tensor.
            Same bytes, same math, but each slice is 2 contiguous runs
            instead of 4 — relevant iff the gather engine's issue cost is
            per contiguous run (measure before switching the default).

    Returns:
        (B, H, W, C): features sampled at (x + dx, y + dy), bilinear,
        zeros outside the image.
    """
    return _flow_warp_diff(chunk_rows, packed_gather, features, flow)


def _flow_warp_impl(
    features: jnp.ndarray,
    flow: jnp.ndarray,
    chunk_rows: int,
    packed_gather: bool,
) -> jnp.ndarray:
    b, h, w, c = features.shape
    if chunk_rows and h > chunk_rows:
        nchunks = -(-h // chunk_rows)
        hp = nchunks * chunk_rows
        flow_p = jnp.pad(flow, ((0, 0), (0, hp - h), (0, 0), (0, 0)))
        flow_chunks = flow_p.reshape(b, nchunks, chunk_rows, w, 2)
        row0 = (jnp.arange(nchunks) * chunk_rows).astype(jnp.float32)

        def one(args):
            fl, r0 = args
            # Shift dy so chunk-local row indices sample the full image.
            fl = fl.at[..., 1].add(r0.astype(fl.dtype))
            return _warp_rows(features, fl, packed_gather)

        out = lax.map(one, (jnp.moveaxis(flow_chunks, 1, 0), row0))
        out = jnp.moveaxis(out, 0, 1).reshape(b, hp, w, c)
        return out[:, :h]
    return _warp_rows(features, flow, packed_gather)


def _warp_rows(
    features: jnp.ndarray, flow: jnp.ndarray, packed_gather: bool = False
) -> jnp.ndarray:
    """Warp a (B, Hout, W, 2) flow block against the full (B, H, W, C) source.

    Output row r samples source coordinate (x + dx, dy) — i.e. the flow's dy
    must already be absolute source row coordinates minus nothing; callers
    chunking rows pre-add the chunk's base row offset.
    """
    b, h, w, c = features.shape
    hout = flow.shape[1]
    coord_dtype = jnp.float32

    gx = jnp.arange(w, dtype=coord_dtype)[None, None, :]
    gy = jnp.arange(hout, dtype=coord_dtype)[None, :, None]
    x = gx + flow[..., 0].astype(coord_dtype)
    y = gy + flow[..., 1].astype(coord_dtype)

    xs = jnp.clip(jnp.floor(x), 0.0, float(max(w - 2, 0))).astype(jnp.int32)
    ys = jnp.clip(jnp.floor(y), 0.0, float(max(h - 2, 0))).astype(jnp.int32)

    ph, pw = min(2, h), min(2, w)
    if packed_gather:
        # Same (2, 2, C) patch expressed as a (2, 2·C) slice of the
        # (B, H, W·C) view: one contiguous run per source row instead of
        # two, halving the slice-run count the gather engine must issue.
        packed = features.reshape(b, h, w * c)
        starts = jnp.stack([ys, xs * c], axis=-1).reshape(b, hout * w, 2)
        patches = lax.gather(
            packed,
            starts,
            lax.GatherDimensionNumbers(
                offset_dims=(2, 3),
                collapsed_slice_dims=(),
                start_index_map=(1, 2),
                operand_batching_dims=(0,),
                start_indices_batching_dims=(0,),
            ),
            slice_sizes=(1, ph, pw * c),
            mode=lax.GatherScatterMode.CLIP,
        )
    else:
        # One gather of (2, 2, C) patches at (ys, xs) per output pixel.
        starts = jnp.stack([ys, xs], axis=-1).reshape(b, hout * w, 2)
        patches = lax.gather(
            features,
            starts,
            lax.GatherDimensionNumbers(
                offset_dims=(2, 3, 4),
                collapsed_slice_dims=(),
                start_index_map=(1, 2),
                operand_batching_dims=(0,),
                start_indices_batching_dims=(0,),
            ),
            slice_sizes=(1, ph, pw, c),
            mode=lax.GatherScatterMode.CLIP,
        )
    patches = patches.reshape(b, hout, w, ph, pw, c)

    wy = _tent(y, ys, ph)  # (B, Hout, W, ph)
    wx = _tent(x, xs, pw)  # (B, Hout, W, pw)
    # Keep everything in the feature dtype: a widened accumulation type makes
    # XLA materialise an f32 copy of the 4x-sized patch tensor (measured
    # ~22 ms at 1080p), and a 4-term bf16 sum of [0,1]-weighted taps loses
    # nothing that matters.
    weights = (wy[..., :, None] * wx[..., None, :]).astype(features.dtype)
    out = (
        weights[..., 0, 0, None] * patches[..., 0, 0, :]
        + weights[..., 0, 1, None] * patches[..., 0, 1, :]
        + weights[..., 1, 0, None] * patches[..., 1, 0, :]
        + weights[..., 1, 1, None] * patches[..., 1, 1, :]
        if patches.shape[3] == 2 and patches.shape[4] == 2
        else jnp.einsum("bhwyx,bhwyxc->bhwc", weights, patches)
    )
    return out.astype(features.dtype)


def _tent(coord, start, size):
    """Bilinear tent weights over ``size`` integer taps from ``start``."""
    pos = start[..., None].astype(coord.dtype) + jnp.arange(size, dtype=coord.dtype)
    return jnp.maximum(0.0, 1.0 - jnp.abs(coord[..., None] - pos))


# --------------------------------------------------------------------------- #
# Custom VJP.
#
# The forward's gather transposes (under plain autodiff) to lax.scatter-add,
# which SERIALISES on TPU: measured 617 ms for a (32, 64, 64, 32) batch —
# ~140× the 4.4 ms forward, and single-handedly 97 % of the round-4 SR train
# step (profile_train.py, 2026-08-21). The custom backward removes every
# scatter:
#
#   * d/d flow — plain autodiff of the forward with the features held
#     constant: the only differentiable path is through the tent weights
#     (patch values are constant w.r.t. flow; integer indices have no
#     gradient), so no gather transpose appears. Measured 3.4 ms.
#   * d/d features — the exact scatter expressed as ONE-HOT MXU MATMULS.
#     The cotangent of source pixel (h', w') is
#       Σ_p Σ_{py,px} wy[p,py]·wx[p,px]·g[p,c]·δ(ys[p]+py=h')·δ(xs[p]+px=w')
#     which factorises per output pixel p into row/column one-hot vectors
#       Y[p, h'] = Σ_py wy δ(ys+py = h')       (2 nonzeros per row)
#       X[p, w'] = Σ_px wx δ(xs+px = w')
#     giving  grad[h', w', c] = Σ_p Y[p,h'] · X[p,w'] · g[p,c]  — computed
#     as (H×P)@(P×W·C) matmuls over output-pixel chunks. FLOPs are
#     O(H·W · Hout·W · C) — dense, but they ride the MXU instead of the
#     scatter unit: ~2 ms at the training shapes vs 617 ms scattered.
#     (Backward at full serving resolution would be O((H·W)²·C) and is not
#     a production path — training uses ≤256² crops.)
# --------------------------------------------------------------------------- #


def _warp_bwd_features(
    feat_shape, feat_dtype, flow: jnp.ndarray, g: jnp.ndarray
) -> jnp.ndarray:
    b, h, w, c = feat_shape
    hout = flow.shape[1]
    coord_dtype = jnp.float32

    gx = jnp.arange(w, dtype=coord_dtype)[None, None, :]
    gy = jnp.arange(hout, dtype=coord_dtype)[None, :, None]
    x = gx + flow[..., 0].astype(coord_dtype)
    y = gy + flow[..., 1].astype(coord_dtype)
    xs = jnp.clip(jnp.floor(x), 0.0, float(max(w - 2, 0))).astype(jnp.int32)
    ys = jnp.clip(jnp.floor(y), 0.0, float(max(h - 2, 0))).astype(jnp.int32)
    ph, pw = min(2, h), min(2, w)
    wy = _tent(y, ys, ph)  # (B, Hout, W, ph) f32
    wx = _tent(x, xs, pw)
    # The forward multiplies taps by weights cast to the feature dtype — use
    # the same cast so the backward is the exact transpose of the forward.
    wy = wy.astype(feat_dtype).astype(jnp.float32)
    wx = wx.astype(feat_dtype).astype(jnp.float32)

    p_total = hout * w
    ysf = ys.reshape(b, p_total)
    xsf = xs.reshape(b, p_total)
    wyf = wy.reshape(b, p_total, ph)
    wxf = wx.reshape(b, p_total, pw)
    gf = g.astype(jnp.float32).reshape(b, p_total, c)

    # Chunk output pixels so the (B, Pc, W, C) intermediate stays bounded
    # (~64 MB f32); zero-weight padding rows contribute nothing.
    pc = min(p_total, max(128, int(64e6 / max(1, b * w * c * 4))))
    nchunks = -(-p_total // pc)
    pad = nchunks * pc - p_total
    if pad:
        ysf = jnp.pad(ysf, ((0, 0), (0, pad)))
        xsf = jnp.pad(xsf, ((0, 0), (0, pad)))
        wyf = jnp.pad(wyf, ((0, 0), (0, pad), (0, 0)))
        wxf = jnp.pad(wxf, ((0, 0), (0, pad), (0, 0)))
        gf = jnp.pad(gf, ((0, 0), (0, pad), (0, 0)))

    rows = jnp.arange(h, dtype=jnp.int32)
    cols = jnp.arange(w, dtype=jnp.int32)

    def chunk(acc, args):  # noqa: ANN001
        ys_c, xs_c, wy_c, wx_c, g_c = args  # (B, Pc, ...)
        onehot_y = jnp.zeros((b, ys_c.shape[1], h), jnp.float32)
        onehot_x = jnp.zeros((b, xs_c.shape[1], w), jnp.float32)
        for py in range(ph):
            onehot_y = onehot_y + wy_c[..., py, None] * (
                (ys_c + py)[..., None] == rows
            )
        for px in range(pw):
            onehot_x = onehot_x + wx_c[..., px, None] * (
                (xs_c + px)[..., None] == cols
            )
        z = onehot_x[..., :, None] * g_c[..., None, :]  # (B, Pc, W, C)
        # f32 features need a FULL-precision contraction: the TPU MXU's
        # DEFAULT precision rounds f32 operands to bf16 (measured 5e-3 abs
        # gradient error vs the exact scatter); HIGHEST restores 1e-7.
        # bf16 features keep DEFAULT — their forward is bf16-class anyway.
        prec = (
            lax.Precision.HIGHEST if feat_dtype == jnp.float32
            else lax.Precision.DEFAULT
        )
        contrib = jnp.einsum(
            "bph,bpz->bhz", onehot_y, z.reshape(b, z.shape[1], w * c),
            precision=prec, preferred_element_type=jnp.float32,
        )
        return acc + contrib.reshape(b, h, w, c), None

    def to_chunks(a):
        return jnp.moveaxis(
            a.reshape(b, nchunks, pc, *a.shape[2:]), 1, 0
        )

    acc0 = jnp.zeros((b, h, w, c), jnp.float32)
    if nchunks == 1:
        # Training shapes fit one chunk; skip the scan machinery (smaller
        # HLO — this backward is re-traced under vmap(grad) by the Fisher
        # path, where the scan's extra program structure costs compile time).
        acc, _ = chunk(acc0, (ysf, xsf, wyf, wxf, gf))
    else:
        acc, _ = lax.scan(
            chunk, acc0, (to_chunks(ysf), to_chunks(xsf), to_chunks(wyf),
                          to_chunks(wxf), to_chunks(gf)),
        )
    return acc.astype(feat_dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _flow_warp_diff(chunk_rows, packed_gather, features, flow):
    return _flow_warp_impl(features, flow, chunk_rows, packed_gather)


def _fw_fwd(chunk_rows, packed_gather, features, flow):
    return _flow_warp_diff(chunk_rows, packed_gather, features, flow), (
        features, flow,
    )


def _fw_bwd(chunk_rows, packed_gather, res, g):
    features, flow = res
    _, vjp_flow = jax.vjp(
        lambda fl: _flow_warp_impl(features, fl, chunk_rows, packed_gather), flow
    )
    (dflow,) = vjp_flow(g)
    dfeat = _warp_bwd_features(features.shape, features.dtype, flow, g)
    return dfeat, dflow


_flow_warp_diff.defvjp(_fw_fwd, _fw_bwd)
