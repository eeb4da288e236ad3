"""Streaming SR pipeline: feature-reuse scan vs per-window forward.

The streaming pass must reproduce the batched per-window forward exactly
(same params, same math — only the feature-extraction schedule differs).
Reference behaviour being replaced: the per-frame sliding window of
nerve_cl/models/enhancement_engine.py:186-248.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerve_tpu.models import SuperResolutionNet, enhance_video_streaming
from nerve_tpu.models.streaming import streaming_prime, streaming_step


def _windowed_reference(model, variables, video):
    """Repeat-padded per-window forward (the semantics streaming promises)."""
    b, t, h, w_, c = video.shape
    w = model.temporal_window
    pad_l = jnp.repeat(video[:, :1], w, axis=1)
    pad_r = jnp.repeat(video[:, -1:], w, axis=1)
    vp = jnp.concatenate([pad_l, video, pad_r], axis=1)
    outs = []
    for tt in range(t):
        window = vp[:, tt : tt + 2 * w + 1]
        outs.append(model.apply(variables, window))
    return jnp.stack(outs, axis=1)


@pytest.mark.parametrize("tw", [1, 2])
def test_streaming_matches_windowed(tw):
    key = jax.random.PRNGKey(0)
    model = SuperResolutionNet(
        scale_factor=2, num_features=16, num_residual_blocks=1, temporal_window=tw
    )
    video = jax.random.uniform(key, (1, 5, 12, 16, 3), jnp.float32)
    variables = model.init(key, video[:, : 2 * tw + 1])

    want = _windowed_reference(model, variables, video)
    got = enhance_video_streaming(model, variables, video)

    assert got.shape == want.shape == (1, 5, 24, 32, 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


@pytest.mark.parametrize("tw", [1, 2])
def test_pair_step_matches_two_single_steps(tw):
    """The b2 schedule (streaming_step_pair) must emit the same frames and
    leave the same carry as two sequential streaming_steps — it only
    BATCHES the work (extract/warp/fuse at 2B), never changes the math."""
    from nerve_tpu.models.streaming import streaming_step_pair

    key = jax.random.PRNGKey(3)
    model = SuperResolutionNet(
        scale_factor=2, num_features=16, num_residual_blocks=1, temporal_window=tw
    )
    video = jax.random.uniform(key, (1, 2 * tw + 4, 10, 16, 3), jnp.float32)
    variables = model.init(key, video[:, : 2 * tw + 1])

    carry = streaming_prime(model, variables, video[:, 0])
    for t in range(1, 2 * tw + 1):  # fill the window with distinct frames
        carry, _ = streaming_step(model, variables, carry, video[:, t])

    c_seq, out1 = streaming_step(model, variables, carry, video[:, 2 * tw + 1])
    c_seq, out2 = streaming_step(model, variables, c_seq, video[:, 2 * tw + 2])
    c_pair, (p1, p2) = streaming_step_pair(
        model, variables, carry, video[:, 2 * tw + 1], video[:, 2 * tw + 2]
    )

    np.testing.assert_allclose(np.asarray(p1), np.asarray(out1), atol=2e-5)
    np.testing.assert_allclose(np.asarray(p2), np.asarray(out2), atol=2e-5)
    assert len(c_pair) == len(c_seq)
    for a, b in zip(c_pair, c_seq):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_streaming_step_carry_shapes():
    key = jax.random.PRNGKey(1)
    model = SuperResolutionNet(
        scale_factor=2, num_features=16, num_residual_blocks=1, temporal_window=1
    )
    frame = jax.random.uniform(key, (2, 8, 8, 3), jnp.float32)
    variables = model.init(key, jnp.stack([frame] * 3, axis=1))

    carry = streaming_prime(model, variables, frame)
    assert len(carry) == 3  # 2w feats + w lr frames
    carry, out = streaming_step(model, variables, carry, frame)
    assert out.shape == (2, 16, 16, 3)
    assert len(carry) == 3


def test_streaming_single_frame_video():
    key = jax.random.PRNGKey(2)
    model = SuperResolutionNet(
        scale_factor=2, num_features=16, num_residual_blocks=1, temporal_window=1
    )
    video = jax.random.uniform(key, (1, 1, 8, 8, 3), jnp.float32)
    variables = model.init(key, jnp.repeat(video, 3, axis=1))
    out = enhance_video_streaming(model, variables, video)
    want = model.apply(variables, jnp.repeat(video, 3, axis=1))
    assert out.shape == (1, 1, 16, 16, 3)
    np.testing.assert_allclose(np.asarray(out[:, 0]), np.asarray(want), atol=2e-5)
