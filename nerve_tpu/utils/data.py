"""Synthetic data pipeline (NHWC) for training and benchmarking.

Mirrors the reference's synthetic dataset shapes — LR (N, 3, 64, 64) /
HR (N, 3, 128, 128) blobs built by scripts/download_data.sh:25-41 — but makes
them *learnable*: HR frames are smooth band-limited random images and LR is
their bicubic downsample, so SR training converges to meaningful PSNR instead
of fitting independent noise. Also provides the degradation operators declared
in the reference config (default.yaml:179-192: noise / blur / downscale) and
per-content-type task generators for continual learning
(train_continual.py:15-23 in the reference).
"""

from __future__ import annotations

from typing import Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nerve_tpu import ops

CONTENT_TYPES = ("sports", "animation", "movie", "news", "gaming")


def smooth_random_images(
    key: jax.Array, n: int, size: int, channels: int = 3, octaves: int = 4
) -> jnp.ndarray:
    """Multi-octave random images in [0, 1].

    Octaves span coarse structure down to half-resolution texture — detail
    above the LR Nyquist rate (so plain interpolation cannot recover it) but
    band-limited (so a learned prior can): a real SR task, unlike the
    reference's unstructured random tensors.
    """
    imgs = jnp.zeros((n, size, size, channels), jnp.float32)
    for o in range(octaves):
        key, sub = jax.random.split(key)
        res = max(2, size >> (octaves - o))
        noise = jax.random.normal(sub, (n, res, res, channels), jnp.float32)
        up = jax.image.resize(noise, (n, size, size, channels), "cubic")
        imgs = imgs + up * (0.55**o)
    lo = jnp.min(imgs, axis=(1, 2, 3), keepdims=True)
    hi = jnp.max(imgs, axis=(1, 2, 3), keepdims=True)
    return (imgs - lo) / jnp.maximum(hi - lo, 1e-6)


def make_sr_dataset(
    key: jax.Array,
    num_samples: int,
    lr_size: int = 64,
    scale: int = 2,
    channels: int = 3,
    content_offset: float = 0.0,
) -> Dict[str, np.ndarray]:
    """{'lr': (N, s, s, C), 'hr': (N, s·scale, s·scale, C)} in [0, 1].

    ``content_offset`` shifts the intensity distribution, mimicking the
    reference's non-IID per-client/per-task offsets
    (experiments/train_federated.py:18-24, train_continual.py:15-23).
    """
    k_base, k_edge = jax.random.split(key)
    base = smooth_random_images(k_base, num_samples, lr_size * scale, channels)
    # Sharp-edge component: a sigmoid-thresholded smooth field. Edges carry
    # energy above the LR Nyquist rate but are STRUCTURED — the regime where
    # learned SR beats interpolation (bicubic blurs/rings on edges), unlike
    # unstructured noise octaves which nothing can recover.
    edge_field = smooth_random_images(k_edge, num_samples, lr_size * scale, channels)
    edges = jax.nn.sigmoid((edge_field - 0.5) * 24.0)
    hr = jnp.clip(0.55 * base + 0.45 * edges, 0.0, 1.0)
    if content_offset:
        hr = jnp.clip(hr * (1.0 - abs(content_offset) * 0.3) + content_offset * 0.2, 0, 1)
    # LR by box decimation (area averaging — what camera/codec downscaling
    # does), NOT bicubic: otherwise bicubic upsampling nearly inverts the
    # degradation and the SR task is trivial.
    lr = hr.reshape(num_samples, lr_size, scale, lr_size, scale, channels).mean(
        axis=(2, 4)
    )
    lr = jnp.clip(lr, 0.0, 1.0)
    return {"lr": np.asarray(lr), "hr": np.asarray(hr)}


def make_video_sr_dataset(
    key: jax.Array,
    num_samples: int,
    lr_size: int = 64,
    scale: int = 2,
    num_frames: int = 3,
    max_shift: int = 3,
    channels: int = 3,
) -> Dict[str, np.ndarray]:
    """{'lr_win': (N, T, s, s, C), 'hr': (N, s·scale, s·scale, C)} with REAL
    inter-frame motion.

    Each sample is a panning camera over a larger HR canvas: per-sample
    integer velocity (vy, vx) ∈ [-max_shift, max_shift] HR-pixels/frame, frame
    t cropped at ``center + (t - T//2)·v`` and box-decimated to LR. ``hr`` is
    the center-frame target. Unlike :func:`expand_temporal` (the reference's
    frame-repetition protocol, train_baseline.py:82), this exercises the flow
    head and warp path with non-trivial motion — needed to measure the
    quality cost of flow-serving configs (coarse ``flow_downsample``), which
    is vacuously zero on repeated frames.
    """
    hr_size = lr_size * scale
    t_half = num_frames // 2
    margin = max_shift * t_half
    canvas_size = hr_size + 2 * margin
    k_canvas, k_vel = jax.random.split(key)
    base = make_sr_dataset(k_canvas, num_samples, canvas_size // scale, scale,
                           channels=channels)
    canvas = jnp.asarray(base["hr"])  # (N, canvas, canvas, C)
    vel = jax.random.randint(
        k_vel, (num_samples, 2), -max_shift, max_shift + 1
    )  # HR px/frame

    def crop_frame(canvas_i, vel_i, t):
        off = margin + vel_i * (t - t_half)
        return jax.lax.dynamic_slice(
            canvas_i, (off[0], off[1], 0), (hr_size, hr_size, channels)
        )

    frames_hr = jnp.stack(
        [jax.vmap(crop_frame, in_axes=(0, 0, None))(canvas, vel, t)
         for t in range(num_frames)],
        axis=1,
    )  # (N, T, hr, hr, C)
    lr_win = frames_hr.reshape(
        num_samples, num_frames, lr_size, scale, lr_size, scale, channels
    ).mean(axis=(3, 5))
    return {
        "lr_win": np.asarray(jnp.clip(lr_win, 0.0, 1.0)),
        "hr": np.asarray(frames_hr[:, t_half]),
    }


def make_task_sequence(
    seed: int,
    num_tasks: int = 5,
    samples_per_task: int = 64,
    lr_size: int = 32,
    scale: int = 2,
) -> list:
    """Per-content-type task sequence for continual learning."""
    tasks = []
    for i in range(num_tasks):
        name = CONTENT_TYPES[i % len(CONTENT_TYPES)]
        key = jax.random.PRNGKey(seed * 1000 + i)
        offset = (i - num_tasks / 2) / max(num_tasks, 1)
        data = make_sr_dataset(key, samples_per_task, lr_size, scale, content_offset=offset)
        tasks.append((name, data))
    return tasks


def add_corruption(
    key: jax.Array, frames: jnp.ndarray, max_block: float = 0.4
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Random rectangular corruption masks for frame-recovery training.

    Returns (corrupted_frames, masks) with masks (B, H, W, 1), 1 = corrupted.
    """
    b, h, w, c = frames.shape
    k1, k2, k3, k4 = jax.random.split(key, 4)
    bh = jax.random.randint(k1, (b,), h // 8, max(int(h * max_block), h // 8 + 1))
    bw = jax.random.randint(k2, (b,), w // 8, max(int(w * max_block), w // 8 + 1))
    y0 = jax.random.randint(k3, (b,), 0, h)
    x0 = jax.random.randint(k4, (b,), 0, w)
    ys = jnp.arange(h)[None, :, None]
    xs = jnp.arange(w)[None, None, :]
    mask = (
        (ys >= y0[:, None, None])
        & (ys < (y0 + bh)[:, None, None])
        & (xs >= x0[:, None, None])
        & (xs < (x0 + bw)[:, None, None])
    ).astype(jnp.float32)[..., None]
    corrupted = frames * (1.0 - mask)
    return corrupted, mask


def batches(
    data: Dict[str, np.ndarray],
    batch_size: int,
    *,
    rng: Optional[np.random.Generator] = None,
    drop_remainder: bool = True,
) -> Iterator[Dict[str, np.ndarray]]:
    """Shuffled fixed-shape minibatches over a dict-of-arrays dataset."""
    n = len(next(iter(data.values())))
    idx = np.arange(n)
    if rng is not None:
        rng.shuffle(idx)
    end = (n // batch_size) * batch_size if drop_remainder else n
    for start in range(0, end, batch_size):
        sel = idx[start : start + batch_size]
        yield {k: v[sel] for k, v in data.items()}


def expand_temporal(lr: jnp.ndarray, num_frames: int) -> jnp.ndarray:
    """(B, H, W, C) → (B, T, H, W, C) by repetition — the reference's
    single-frame-to-window expansion (train_baseline.py:82)."""
    return jnp.broadcast_to(
        lr[:, None], (lr.shape[0], num_frames) + lr.shape[1:]
    )
