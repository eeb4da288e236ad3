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

    def tent(coord, start, size):
        pos = start[..., None].astype(coord_dtype) + jnp.arange(size, dtype=coord_dtype)
        return jnp.maximum(0.0, 1.0 - jnp.abs(coord[..., None] - pos))

    wy = tent(y, ys, ph)  # (B, Hout, W, ph)
    wx = tent(x, xs, pw)  # (B, Hout, W, pw)
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
