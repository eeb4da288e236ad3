"""Streaming video SR: sliding-window inference with feature reuse.

The reference's ``enhance_video`` (nerve_cl/models/enhancement_engine.py:
186-248) re-runs the full model per frame, so each frame's features are
extracted ``2w+1`` times as the window slides. Here the scan carry holds the
already-extracted features of the last ``2w`` frames, so each step extracts
features for exactly ONE new frame — a (2w+1)× saving on the feature
extractor, with identical results for interior frames.

Edge policy: repeat-padding on BOTH sides (frame 0's window is
(x0, x0, x1) for w=1). The reference's own edge handling is off-by-one at
the left edge — for t=0 it builds the window (x0, x1, x1) whose CENTER is
x1, so its first output frame duplicates frame 1's enhancement
(enhancement_engine.py:221-233 + :141-158 window slice); we do not
replicate that defect.

Whole-video inference is one jitted ``lax.scan`` — O(1) compilation in T,
streaming memory use, and the per-frame carry chains real data dependence.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from nerve_tpu.models.super_resolution import SuperResolutionNet

Carry = Tuple  # (feats of last 2w frames..., lr of last w frames...)


def streaming_prime(
    model: SuperResolutionNet, variables, first_frame: jnp.ndarray
) -> Carry:
    """Carry for a stream starting at ``first_frame`` (B, H, W, C).

    Repeat-pads the left edge: all 2w cached feature slots (and the w
    pending LR frames) start as frame 0.
    """
    w = model.temporal_window
    f0 = model.apply(variables, first_frame, method="extract_features")
    return tuple([f0] * (2 * w)) + tuple([first_frame] * w)


def streaming_step(
    model: SuperResolutionNet, variables, carry: Carry, new_frame: jnp.ndarray,
    output_layout: str = "nhwc",
) -> Tuple[Carry, jnp.ndarray]:
    """Feed one new LR frame; emit the SR frame centred ``w`` frames back.

    carry = (f[t-2w+1..t], lr[t-w+1..t]) before the step, where t is the
    index of the last frame fed. Feeding x[t+1] emits SR(x[t-w+1]).
    """
    w = model.temporal_window
    feats = list(carry[: 2 * w])
    lrs = list(carry[2 * w :])
    f_new = model.apply(variables, new_frame, method="extract_features")
    window_feats = feats + [f_new]  # frames t-2w+1 .. t+1; centre at index w
    center_feat = window_feats[w]
    prev = window_feats[:w]
    nxt = window_feats[w + 1 :]
    out = model.apply(
        variables, prev, center_feat, nxt, lrs[0], output_layout,
        method="streaming_step",
    )
    new_carry = tuple(window_feats[1:]) + tuple(lrs[1:] + [new_frame])
    return new_carry, out


def streaming_step_pair(
    model: SuperResolutionNet, variables, carry: Carry,
    new1: jnp.ndarray, new2: jnp.ndarray, output_layout: str = "nhwc",
) -> Tuple[Carry, Tuple[jnp.ndarray, jnp.ndarray]]:
    """Feed TWO new LR frames; emit the SR frames centred w and w-1 back.

    The b2 schedule (measured +4.5 % on the lightweight model,
    scripts/diag_lightweight2.py): both steps' work runs BATCHED — one
    feature-extractor call on the 2 new frames, one flow+warp call on all
    4w (neighbour, centre) pairs, and the fuse tail (attention → RDB stack
    → fusion → upsampler → epilogue) at batch 2B — amortising pipeline
    ramp, dispatch, and layout glue across two output frames at the cost of
    +1 frame of latency. Bit-identical pipeline structure per frame; both
    centres' features exist after the one batched extraction, so the pair
    has no intra-step sequential dependence.
    """
    w = model.temporal_window
    b = new1.shape[0]
    feats = list(carry[: 2 * w])
    lrs = list(carry[2 * w :])
    f_pair = model.apply(
        variables, jnp.concatenate([new1, new2], axis=0),
        method="extract_features",
    )
    f1, f2 = f_pair[:b], f_pair[b:]
    wf = feats + [f1, f2]  # frames t-2w+1 .. t+2; centres at w and w+1
    prev_a, ctr_a, nxt_a = wf[:w], wf[w], wf[w + 1 : 2 * w + 1]
    prev_b, ctr_b, nxt_b = wf[1 : w + 1], wf[w + 1], wf[w + 2 :]

    nbs = prev_a + nxt_a + prev_b + nxt_b  # 4w feature maps
    nb = jnp.concatenate(nbs, axis=0)
    ctr = jnp.concatenate([ctr_a] * (2 * w) + [ctr_b] * (2 * w), axis=0)
    warped = model.apply(variables, nb, ctr, method="align_to_center")
    wslices = [warped[i * b : (i + 1) * b] for i in range(4 * w)]
    al_a = wslices[:w] + [ctr_a] + wslices[w : 2 * w]
    al_b = wslices[2 * w : 3 * w] + [ctr_b] + wslices[3 * w :]

    # Fuse BOTH centres in one batched tail: every aligned slot, the centre
    # features, and the centre LR frames are stacked along batch.
    aligned = [
        jnp.concatenate([a, bb], axis=0) for a, bb in zip(al_a, al_b)
    ]
    center_feat = jnp.concatenate([ctr_a, ctr_b], axis=0)
    lr_b_center = lrs[1] if w >= 2 else new1
    center_lr = jnp.concatenate([lrs[0], lr_b_center], axis=0)
    out = model.apply(
        variables, aligned, center_feat, center_lr, False, output_layout,
        method="fuse_from_features",
    )
    new_carry = tuple(wf[2:]) + tuple((lrs + [new1, new2])[-w:])
    return new_carry, (out[:b], out[b:])


def enhance_video_streaming(
    model: SuperResolutionNet,
    variables,
    video: jnp.ndarray,
    donate_carry: bool = False,
) -> jnp.ndarray:
    """SR for a whole (B, T, H, W, C) video via one scanned streaming pass.

    Returns (B, T, sH, sW, C). Equivalent to running the model on a
    repeat-padded window around every frame, at ~1/(2w+1) of the feature-
    extraction cost.
    """
    del donate_carry
    b, t, h, w_, c = video.shape
    w = model.temporal_window

    carry0 = streaming_prime(model, variables, video[:, 0])
    # Feed frames 1..T-1, then w repeats of the last frame to flush.
    tail = jnp.repeat(video[:, -1:], w, axis=1)
    feed = jnp.concatenate([video[:, 1:], tail], axis=1)  # (B, T-1+w, H, W, C)

    def body(carry, x_t):
        carry, out = streaming_step(model, variables, carry, x_t)
        return carry, out

    # scan over the frame axis; outputs (T-1+w - (w-1)) ... every step emits.
    xs = jnp.moveaxis(feed, 1, 0)  # (steps, B, H, W, C)
    _, ys = jax.lax.scan(body, carry0, xs)
    # Steps emit SR of centres (1-w .. T-1); the first (w-1)+... the first
    # step (feeding frame 1) emits the centre at index 1-w; with repeat-
    # padded carry those early centres are all frame 0 repeats. The last w
    # steps' centres are frames T-w..T-1. Valid outputs: the final T steps.
    ys = jnp.moveaxis(ys, 0, 1)  # (B, steps, sH, sW, C)
    return ys[:, ys.shape[1] - t :]
