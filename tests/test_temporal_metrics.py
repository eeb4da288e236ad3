"""Flow-based temporal quality metrics (tOF / tLP).

The reference declares these in its metric suite (nerve_cl/config/
default.yaml:194-207) but never implements them; the oracle here is
construction: Lucas-Kanade must recover a known translation, and the metrics
must be zero for identical videos and positive for temporally-corrupted ones.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerve_tpu.utils.metrics import lucas_kanade_flow, tlp, tof, temporal_of


def _textured(key, h=48, w=64):
    """Smooth random texture (LK needs gradients, not white noise)."""
    base = jax.random.uniform(key, (1, h, w, 3))
    k = jnp.ones((5, 5, 1, 1)) / 25.0
    sm = jax.lax.conv_general_dilated(
        base.transpose(0, 3, 1, 2).reshape(3, 1, h, w), k.transpose(2, 3, 0, 1),
        (1, 1), "SAME",
    ).reshape(1, 3, h, w).transpose(0, 2, 3, 1)
    return sm


class TestLucasKanade:
    @pytest.mark.parametrize("shift", [(0, 0), (2, 0), (0, 2), (1, 2)])
    def test_recovers_translation(self, shift):
        """Integer global translation is recovered in the interior."""
        dx, dy = shift
        f2 = _textured(jax.random.PRNGKey(0), 64, 80)
        # frame1(y, x) == frame2(y + dy, x + dx)  → flow should be (dx, dy).
        f1 = jnp.roll(f2, (-dy, -dx), axis=(1, 2))
        flow = lucas_kanade_flow(f1, f2, levels=3, radius=4, iters=3)
        interior = flow[:, 12:-12, 12:-12, :]
        err_dx = float(jnp.mean(jnp.abs(interior[..., 0] - dx)))
        err_dy = float(jnp.mean(jnp.abs(interior[..., 1] - dy)))
        assert err_dx < 0.35 and err_dy < 0.35, (err_dx, err_dy)

    def test_zero_flow_for_identical(self):
        f = _textured(jax.random.PRNGKey(1))
        flow = lucas_kanade_flow(f, f)
        assert float(jnp.max(jnp.abs(flow))) < 1e-3


class TestTemporalMetrics:
    @pytest.fixture
    def videos(self):
        key = jax.random.PRNGKey(2)
        frames = [_textured(jax.random.fold_in(key, 0), 48, 64)]
        for t in range(3):
            frames.append(jnp.roll(frames[-1], (1, 2), axis=(1, 2)))
        gt = jnp.stack(frames, axis=1)  # (1, 4, H, W, 3) smooth motion
        return gt

    def test_zero_for_identical(self, videos):
        assert float(tof(videos, videos)) < 1e-3
        assert float(tlp(videos, videos)) < 1e-6
        assert float(temporal_of(videos, videos)) < 1e-6

    def test_flicker_detected(self, videos):
        """Alternating-frame brightness flicker (classic SR temporal
        artefact): per-frame PSNR barely moves, tOF/tLP must move."""
        t = videos.shape[1]
        mod = jnp.where(
            (jnp.arange(t) % 2 == 0)[None, :, None, None, None], 1.0, 0.92
        )
        flickery = jnp.clip(videos * mod, 0.0, 1.0)
        assert float(tlp(flickery, videos)) > 10 * max(
            float(tlp(videos, videos)), 1e-9
        )
        assert float(temporal_of(flickery, videos)) > 0.001

    def test_wrong_motion_detected(self, videos):
        """Output whose frames are individually plausible but static (lost
        motion) scores a tOF roughly equal to the true motion magnitude."""
        static = jnp.repeat(videos[:, :1], videos.shape[1], axis=1)
        val = float(tof(static, videos))
        # true flow is (dx=2, dy=1) → mean |Δflow| ≈ (2+1)/2 per component
        assert val > 0.5, val

    def test_jittable(self, videos):
        out = jax.jit(tof)(videos, videos)
        assert np.isfinite(float(out))
