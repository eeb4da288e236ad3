"""Spatial (height-sharded) parallel inference — the mesh 'model' axis.

The reference is single-device (nerve_cl has no DP/TP/PP/SP of any kind —
SURVEY §2); frames above 1080p stop fitting a single chip's HBM/latency
budget, so NERVE-TPU adds the domain-appropriate analogue of tensor/context
parallelism: shard the frame's HEIGHT across the mesh's ``model`` axis and
run the whole SR pipeline per-slab with an overlap-discard halo.

Design (shard_map + ppermute, all compute inside one jitted SPMD program):

  1. every shard holds its H-slab of the input frames;
  2. neighbouring shards exchange ``halo`` boundary rows over ICI with two
     ``lax.ppermute``s (up + down) — edge shards zero-pad, matching the
     single-device SAME-conv boundary;
  3. each shard runs the FULL SuperResolutionNet forward on its extended
     slab independently (Pallas kernels included — they are ordinary
     per-shard programs under shard_map, no partitioner support needed);
  4. the scale·halo output margin is discarded and slabs concatenate to the
     full frame.

Exactness contract:
  * INTERIOR rows (≥ receptive-field R from the image top/bottom): exact
    equal to the single-device forward whenever R + the optical-flow
    displacement at slab boundaries fits inside ``halo``. R ≈ 55 px for the
    default depth; ``halo=64`` covers it plus ±8-px boundary motion. CBAM's
    channel attention (a GLOBAL statistic) stays exact via a psum of
    per-shard interior sums — see ChannelAttention.
  * the outermost ~R rows at the image TOP/BOTTOM differ slightly: the edge
    shard's zero halo is applied once, whereas the single-device forward
    re-applies SAME zero padding before every conv, so post-ReLU BN shifts
    propagate differently into the edge band. Both are standard boundary
    conditions; every production tiled-inference system shares this
    property (left/right image edges are untouched — W is never sharded).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _exchange_halo(x: jnp.ndarray, halo: int, axis_name: str) -> jnp.ndarray:
    """(..., Hs, W, C) slab → (..., Hs + 2·halo, W, C) with neighbour rows.

    Edge shards receive zeros (single-device SAME-padding semantics).
    """
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    top_rows = x[..., :halo, :, :]      # my top rows → previous shard's bottom halo
    bot_rows = x[..., -halo:, :, :]     # my bottom rows → next shard's top halo

    # ppermute: shard i sends to i+1 (its bottom-halo source is shard i-1's rows).
    from_prev = lax.ppermute(bot_rows, axis_name,
                             [(i, i + 1) for i in range(n - 1)])
    from_next = lax.ppermute(top_rows, axis_name,
                             [(i + 1, i) for i in range(n - 1)])
    zero = jnp.zeros_like(top_rows)
    top_halo = jnp.where(idx == 0, zero, from_prev)
    bot_halo = jnp.where(idx == n - 1, zero, from_next)
    return jnp.concatenate([top_halo, x, bot_halo], axis=-3)


def spatial_sr_apply(
    model,
    variables,
    frames: jnp.ndarray,
    mesh: Mesh,
    axis: str = "model",
    halo: int = 64,
    data_axis: Optional[str] = None,
):
    """Height-sharded SuperResolutionNet forward over ``mesh[axis]``.

    Args:
        model: a ``SuperResolutionNet`` (NHWC core).
        variables: its parameter pytree (replicated).
        frames: (B, T, H, W, C) with H divisible by the axis size.
        mesh: mesh containing ``axis``.
        halo: boundary rows exchanged per side (see module docstring).
        data_axis: optional second mesh axis to shard the BATCH over —
            combined data×model parallelism (each (data, model) mesh slice
            handles one batch shard's H-slab). Differentiable end-to-end:
            shard_map transposes the halo ppermutes / attention psums, so
            this composes with ``jax.grad`` for training-time use.

    Returns:
        (B, H·s, W·s, C) — identical partitioning to the input (H sharded,
        and B sharded when ``data_axis`` is given).
    """
    n = mesh.shape[axis]
    b, t, h, w, c = frames.shape
    if h % n != 0:
        raise ValueError(f"H={h} not divisible by {axis} axis size {n}")
    if data_axis is not None and b % mesh.shape[data_axis] != 0:
        raise ValueError(
            f"B={b} not divisible by {data_axis} axis size {mesh.shape[data_axis]}"
        )
    s = model.scale_factor
    halo = min(halo, h // n)

    # Clone with the sharding context: modules holding global statistics
    # (CBAM channel attention) psum over the axis and skip the halo rows.
    sharded_model = model.clone(spatial_axis=axis, spatial_halo=halo)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(data_axis, None, axis, None, None)),
        out_specs=P(data_axis, axis, None, None),
        check_vma=False,
    )
    def run(v, fr):
        # fr: (B, T, Hs, W, C) local slab.
        ext = _exchange_halo(fr, halo, axis)  # (B, T, Hs+2halo, W, C)
        out = sharded_model.apply(v, ext)     # (B, (Hs+2halo)·s, W·s, C)
        return out[:, s * halo : out.shape[1] - s * halo]

    return run(variables, frames)


def spatial_streaming_apply(
    model,
    variables,
    video: jnp.ndarray,
    mesh: Mesh,
    axis: str = "model",
    halo: int = 64,
    data_axis: Optional[str] = None,
):
    """Height-sharded STREAMING video SR over ``mesh[axis]``.

    The full-model serving pipeline (``models.streaming`` — scan with cached
    per-frame features) run as one SPMD program: each scan step halo-extends
    only the ONE new frame (two ppermutes per step over ICI), extracts its
    features once, and keeps the carry as per-shard extended slabs. Combines
    the streaming pipeline's (2w+1)× feature-extraction saving with
    ``spatial_sr_apply``'s latency scaling; same exactness contract (interior
    rows exact when conv stencil + boundary flow displacement ≤ halo).

    Args:
        video: (B, T, H, W, C) with H divisible by the axis size.

    Returns:
        (B, T, H·s, W·s, C), H·s partitioned over ``axis``.
    """
    from nerve_tpu.models import streaming as streaming_lib

    n = mesh.shape[axis]
    b, t, h, w, c = video.shape
    if h % n != 0:
        raise ValueError(f"H={h} not divisible by {axis} axis size {n}")
    if data_axis is not None and b % mesh.shape[data_axis] != 0:
        raise ValueError(
            f"B={b} not divisible by {data_axis} axis size {mesh.shape[data_axis]}"
        )
    s = model.scale_factor
    halo = min(halo, h // n)
    sharded_model = model.clone(spatial_axis=axis, spatial_halo=halo)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(data_axis, None, axis, None, None)),
        out_specs=P(data_axis, None, axis, None, None),
        check_vma=False,
    )
    def run(v, vid):
        # vid: (B, T, Hs, W, C) local slabs.
        tw = sharded_model.temporal_window

        def ext(fr):  # one frame (B, Hs, W, C) → (B, Hs+2·halo, W, C)
            return _exchange_halo(fr, halo, axis)

        carry0 = streaming_lib.streaming_prime(sharded_model, v, ext(vid[:, 0]))
        tail = jnp.repeat(vid[:, -1:], tw, axis=1)
        feed = jnp.concatenate([vid[:, 1:], tail], axis=1)

        def body(carry, x_t):
            return streaming_lib.streaming_step(sharded_model, v, carry, ext(x_t))

        xs = jnp.moveaxis(feed, 1, 0)
        _, ys = jax.lax.scan(body, carry0, xs)
        ys = jnp.moveaxis(ys, 0, 1)        # (B, steps, (Hs+2halo)·s, W·s, C)
        ys = ys[:, ys.shape[1] - t :]
        return ys[:, :, s * halo : ys.shape[2] - s * halo]

    return run(variables, video)


def spatial_lightweight_apply(
    model,
    variables,
    frames: jnp.ndarray,
    mesh: Mesh,
    axis: str = "model",
    halo: int = 8,
    data_axis: Optional[str] = None,
    output_layout: str = "nhwc",
):
    """Height-sharded LightweightSuperResolution forward over ``mesh[axis]``.

    The ≥60 fps serving config scaled across chips: latency scaling for a
    SINGLE stream (vs trivially data-parallel independent streams). The
    lightweight body is 6 3×3-support layers + a radius-2 bicubic base, so
    ``halo=8`` already gives slab-boundary exactness (same contract as
    ``spatial_sr_apply``: interior exact, image top/bottom edge band is a
    different-but-valid boundary condition). The per-shard forward is the
    same whole-body fused Pallas chain as single-chip serving.

    Args:
        frames: (B, H, W, C) with H divisible by the axis size.
        output_layout: 'nhwc' (B, sH, sW, C), 'planar' (B, C, sH, sW) or
            'packed' (B, sH, sW·C) — the sharded output keeps its H (or sH)
            dimension partitioned over ``axis`` in each layout.
    """
    n = mesh.shape[axis]
    b, h, w, c = frames.shape
    if h % n != 0:
        raise ValueError(f"H={h} not divisible by {axis} axis size {n}")
    if data_axis is not None and b % mesh.shape[data_axis] != 0:
        raise ValueError(
            f"B={b} not divisible by {data_axis} axis size {mesh.shape[data_axis]}"
        )
    s = model.scale_factor
    halo = min(halo, h // n)
    out_specs = {
        "nhwc": P(data_axis, axis, None, None),
        "planar": P(data_axis, None, axis, None),
        "packed": P(data_axis, axis, None),
    }
    if output_layout not in out_specs:
        raise ValueError(f"unknown output_layout {output_layout!r}")
    crop_axis = {"nhwc": 1, "planar": 2, "packed": 1}[output_layout]

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(data_axis, axis, None, None)),
        out_specs=out_specs[output_layout],
        check_vma=False,
    )
    def run(v, fr):
        ext = _exchange_halo(fr, halo, axis)  # (B, Hs+2halo, W, C)
        out = model.apply(v, ext, False, output_layout)
        lo = s * halo
        hi = out.shape[crop_axis] - s * halo
        return lax.slice_in_dim(out, lo, hi, axis=crop_axis)

    return run(variables, frames)


def spatial_sharding(mesh: Mesh, axis: str = "model") -> NamedSharding:
    """Sharding for (B, T, H, W, C) video tensors: H over ``axis``."""
    return NamedSharding(mesh, P(None, None, axis, None, None))


def frame_sharding(mesh: Mesh, axis: str = "model") -> NamedSharding:
    """Sharding for (B, H, W, C) single-frame tensors: H over ``axis``."""
    return NamedSharding(mesh, P(None, axis, None, None))
