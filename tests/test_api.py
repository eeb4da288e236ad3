"""Tests for the reference-compatible channel-first facade
(nerve_tpu.models.api) — the (B, T, C, H, W) → (B, C, sH, sW) contract."""

import numpy as np
import pytest

import jax.numpy as jnp

from nerve_tpu.models import api


class TestSuperResolutionAPI:
    def test_channel_first_contract(self, rng):
        model = api.SuperResolutionNet(num_features=8, num_residual_blocks=1)
        lr = rng.random((2, 3, 3, 16, 16)).astype(np.float32)  # (B, T, C, H, W)
        out = model(lr)
        assert out.shape == (2, 3, 32, 32)
        assert float(jnp.min(out)) >= 0.0 and float(jnp.max(out)) <= 1.0

    def test_forward_single(self, rng):
        model = api.SuperResolutionNet(num_features=8, num_residual_blocks=1)
        frame = rng.random((1, 3, 16, 16)).astype(np.float32)
        out = model.forward_single(frame)
        assert out.shape == (1, 3, 32, 32)

    def test_param_count_and_flops(self):
        model = api.SuperResolutionNet()  # default config
        n = model.get_num_parameters()
        # Reference default measures 1,987,283 (BASELINE.md); ours should be
        # the same order (BN/projection bookkeeping differs slightly).
        assert 1_500_000 < n < 2_500_000
        assert model.get_flops((128, 128)) > 0

    def test_lightweight(self, rng):
        model = api.LightweightSuperResolution()
        out = model(rng.random((1, 3, 16, 16)).astype(np.float32))
        assert out.shape == (1, 3, 32, 32)
        assert model.get_num_parameters() < 20_000


class TestFrameRecoveryAPI:
    def test_contract(self, rng):
        model = api.FrameRecoveryNet(base_channels=16)
        frame = rng.random((1, 3, 64, 64)).astype(np.float32)
        refs = rng.random((1, 2, 3, 64, 64)).astype(np.float32)
        mask = np.zeros((1, 1, 64, 64), np.float32)
        mask[:, :, 20:40, 20:40] = 1.0
        out = model(frame, refs, mask)
        assert out.shape == (1, 3, 64, 64)


class TestEnhancementEngineAPI:
    @pytest.fixture
    def engine(self):
        cfg = api.EnhancementConfig(
            recovery_base_channels=16, sr_num_features=8, sr_num_residual_blocks=1
        )
        return api.EnhancementEngine(cfg)

    def test_forward_dict(self, engine, rng):
        frames = rng.random((1, 5, 3, 32, 32)).astype(np.float32)
        out = engine(frames)
        assert "enhanced" in out
        assert out["enhanced"].shape == (1, 3, 64, 64)

    def test_forward_with_mask(self, engine, rng):
        frames = rng.random((1, 5, 3, 32, 32)).astype(np.float32)
        mask = np.zeros((1, 1, 32, 32), np.float32)
        mask[:, :, 8:16, 8:16] = 1.0
        out = engine(frames, corruption_mask=mask)
        assert set(out) == {"recovered", "super_resolved", "enhanced"}

    def test_enhance_video_4d(self, engine, rng):
        video = rng.random((6, 3, 16, 16)).astype(np.float32)
        out = engine.enhance_video(video)
        assert out.shape == (6, 3, 32, 32)

    def test_model_info(self, engine):
        info = engine.get_model_info()
        assert info["parameters"]["total"] > 0
        assert "frame_recovery" in info["parameters"]
        assert "super_resolution" in info["parameters"]

    def test_adaptive_engine_facade(self, rng):
        cfg = api.EnhancementConfig(
            recovery_base_channels=16, sr_num_features=8, sr_num_residual_blocks=1
        )
        eng = api.AdaptiveEnhancementEngine(cfg)
        frames = rng.random((1, 5, 3, 32, 32)).astype(np.float32)
        out = eng.adaptive_forward(frames, 0.7, 0.8)
        assert {"enhanced", "complexity", "enhancement_strength"} <= set(out)
        s = float(out["enhancement_strength"])
        assert 0.3 <= s <= 1.0
        # Budget < 0.3 → lightweight mode (static re-jit) still produces SR.
        out2 = eng.adaptive_forward(frames, 0.2, 0.5)
        assert out2["enhanced"].shape == (1, 3, 64, 64)
        assert eng.estimate_complexity(frames[:, 2]).shape == (1, 1)

    def test_quantize_int8_facade(self, rng):
        """quantize_int8 switches a facade engine to int8 SR serving and the
        video path still runs (plain + adaptive)."""
        from nerve_tpu.models import api

        video = rng.random((4, 3, 16, 16)).astype(np.float32)
        for adaptive in (False, True):
            cfg = api.EnhancementConfig(
                frame_recovery_enabled=False, sr_num_features=8,
                sr_num_residual_blocks=1, sr_temporal_window=1,
            ).with_mode("sr_only")
            eng = (api.AdaptiveEnhancementEngine if adaptive
                   else api.EnhancementEngine)(cfg)
            eng.quantize_int8(video, chains=True)
            assert eng.config.sr_quantized and eng.config.sr_quantized_chains
            assert "quant" in eng.variables
            out = np.asarray(eng.enhance_video(video))
            assert out.shape == (4, 3, 32, 32)
            assert np.isfinite(out).all()

    def test_mode_switch_reuses_params(self, engine, rng):
        before = np.asarray(
            engine.variables["params"]["super_resolution"]["gff"]["kernel"]
        )
        engine.set_enhancement_mode("sr_only")
        after = np.asarray(
            engine.variables["params"]["super_resolution"]["gff"]["kernel"]
        )
        np.testing.assert_array_equal(before, after)
        frames = rng.random((1, 5, 3, 16, 16)).astype(np.float32)
        out = engine(frames)
        assert "recovered" not in out


class TestUint8Ingest:
    """uint8 video frames (the realistic serving input) are normalised by
    1/255 at the facade boundary; float inputs pass through unchanged."""

    def test_sr_uint8_equals_float(self, rng):
        net = api.SuperResolutionNet(
            num_features=8, num_residual_blocks=1, temporal_window=1
        )
        u8 = rng.integers(0, 256, (1, 3, 3, 16, 16), dtype=np.uint8)
        f32 = u8.astype(np.float32) / 255.0
        np.testing.assert_allclose(
            np.asarray(net(u8)), np.asarray(net(f32)), atol=1e-6
        )

    def test_lightweight_uint8_equals_float(self, rng):
        net = api.LightweightSuperResolution()
        u8 = rng.integers(0, 256, (1, 3, 16, 16), dtype=np.uint8)
        f32 = u8.astype(np.float32) / 255.0
        np.testing.assert_allclose(
            np.asarray(net(u8)), np.asarray(net(f32)), atol=1e-6
        )

    def test_to_uint8_roundtrip(self, rng):
        u8 = rng.integers(0, 256, (2, 3, 8, 8), dtype=np.uint8)
        f = jnp.asarray(u8.astype(np.float32) / 255.0)
        np.testing.assert_array_equal(np.asarray(api.to_uint8(f)), u8)


class TestVideoUint8Output:
    def test_enhance_video_as_uint8(self, rng):
        eng = api.EnhancementEngine(api.EnhancementConfig(
            sr_num_features=8, sr_num_residual_blocks=1,
            recovery_base_channels=16, scale_factor=2,
        ))
        video = rng.random((3, 3, 16, 16)).astype(np.float32)
        f = np.asarray(eng.enhance_video(video))
        u = np.asarray(eng.enhance_video(video, as_uint8=True))
        assert u.dtype == np.uint8 and u.shape == f.shape
        np.testing.assert_array_equal(
            u, np.clip(np.round(f * 255.0), 0, 255).astype(np.uint8)
        )

    def test_adaptive_engine_inherits_video_path(self, rng):
        eng = api.AdaptiveEnhancementEngine(api.EnhancementConfig(
            sr_num_features=8, sr_num_residual_blocks=1,
            recovery_base_channels=16, scale_factor=2,
        ))
        video = rng.random((2, 3, 16, 16)).astype(np.float32)
        out = eng.enhance_video(video)
        assert out.shape == (2, 3, 32, 32)
