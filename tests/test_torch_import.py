"""End-to-end forward parity against the ACTUAL PyTorch reference models.

The reference package at /root/reference is imported read-only and run on CPU
as a numerical oracle: random-initialised (plus perturbed BN statistics, so
running-stat import is genuinely exercised) reference models are exported via
``state_dict()``, imported through :mod:`nerve_tpu.models.import_torch`, and
the two forwards are compared on identical inputs. This proves that a user's
reference-trained checkpoint produces the same frames on the TPU-native
forward — the BASELINE.json "parity with reference checkpoints" clause.

Reference modules exercised: SuperResolutionNet / LightweightSuperResolution
(nerve_cl/models/super_resolution.py:256-470), FrameRecoveryNet
(frame_recovery.py:335-446), EnhancementEngine / AdaptiveEnhancementEngine
(enhancement_engine.py:40-381).
"""

from __future__ import annotations

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/reference")

from nerve_cl.models.enhancement_engine import (  # noqa: E402
    AdaptiveEnhancementEngine as TorchAdaptiveEngine,
    EnhancementConfig as TorchEngineConfig,
    EnhancementEngine as TorchEngine,
)
from nerve_cl.models.frame_recovery import FrameRecoveryNet as TorchRecovery  # noqa: E402
from nerve_cl.models.super_resolution import (  # noqa: E402
    LightweightSuperResolution as TorchLightweight,
    SuperResolutionNet as TorchSR,
)

from nerve_tpu.models import (  # noqa: E402
    FrameRecoveryNet,
    LightweightSuperResolution,
    SuperResolutionNet,
)
from nerve_tpu.models.enhancement_engine import (  # noqa: E402
    AdaptiveEnhancementEngine,
    EngineConfig,
    EnhancementEngine,
)
from nerve_tpu.models import import_torch as imp  # noqa: E402


def _seed_torch(model: "torch.nn.Module", seed: int = 0) -> "torch.nn.Module":
    """Deterministic non-trivial weights + perturbed BN running stats."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.empty_like(p).normal_(0.0, 0.05, generator=g))
        for m in model.modules():
            if isinstance(m, (torch.nn.BatchNorm2d, torch.nn.BatchNorm3d)):
                m.running_mean.normal_(0.0, 0.05, generator=g)
                m.running_var.uniform_(0.6, 1.4, generator=g)
    return model.eval()


def _nchw(x: np.ndarray) -> "torch.Tensor":
    return torch.from_numpy(np.moveaxis(x, -1, -3).copy())


def _assert_close(ours: jnp.ndarray, theirs: "torch.Tensor", tol: float, what: str):
    theirs_np = theirs.detach().numpy()
    theirs_nhwc = np.moveaxis(theirs_np, -3, -1)
    err = float(np.max(np.abs(np.asarray(ours, np.float32) - theirs_nhwc)))
    assert err < tol, f"{what}: max abs err {err} >= {tol}"


class TestSuperResolutionImport:
    @pytest.mark.parametrize("scale", [2, 4])
    def test_forward_parity(self, rng, scale):
        tm = _seed_torch(
            TorchSR(scale_factor=scale, num_features=32, num_residual_blocks=2,
                    temporal_window=1),
            seed=scale,
        )
        variables = imp.import_super_resolution(tm.state_dict(), num_residual_blocks=2)

        model = SuperResolutionNet(
            scale_factor=scale, num_features=32, num_residual_blocks=2,
            temporal_window=1,
        )
        x = rng.uniform(0.2, 0.8, (1, 3, 16, 20, 3)).astype(np.float32)
        template = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
        imp.validate_against(variables, template)

        ours = model.apply(variables, jnp.asarray(x))
        with torch.no_grad():
            theirs = tm(_nchw(x))
        _assert_close(ours, theirs, 2e-3, f"SuperResolutionNet x{scale}")

    def test_lightweight_parity(self, rng):
        tm = _seed_torch(TorchLightweight(scale_factor=2), seed=7)
        variables = imp.import_lightweight(tm.state_dict())
        model = LightweightSuperResolution(scale_factor=2)
        x = rng.uniform(0.2, 0.8, (2, 12, 16, 3)).astype(np.float32)
        imp.validate_against(variables, model.init(jax.random.PRNGKey(0), jnp.asarray(x)))
        ours = model.apply(variables, jnp.asarray(x))
        with torch.no_grad():
            theirs = tm(_nchw(x))
        _assert_close(ours, theirs, 1e-3, "LightweightSuperResolution")


class TestFrameRecoveryImport:
    def test_forward_parity(self, rng):
        tm = _seed_torch(TorchRecovery(base_channels=16, temporal_window=2), seed=3)
        variables = imp.import_frame_recovery(tm.state_dict(), base_channels=16)

        model = FrameRecoveryNet(base_channels=16, temporal_window=2)
        frame = rng.uniform(0.1, 0.9, (1, 32, 32, 3)).astype(np.float32)
        refs = rng.uniform(0.1, 0.9, (1, 4, 32, 32, 3)).astype(np.float32)
        mask = (rng.uniform(size=(1, 32, 32, 1)) > 0.5).astype(np.float32)

        template = model.init(
            jax.random.PRNGKey(0), jnp.asarray(frame), jnp.asarray(refs),
            jnp.asarray(mask),
        )
        imp.validate_against(variables, template)

        ours = model.apply(
            variables, jnp.asarray(frame), jnp.asarray(refs), jnp.asarray(mask)
        )
        with torch.no_grad():
            theirs = tm(
                _nchw(frame),
                torch.from_numpy(np.moveaxis(refs, -1, -3).copy()),
                _nchw(mask),
            )
        _assert_close(ours, theirs, 2e-3, "FrameRecoveryNet")


class TestEngineImport:
    def test_sr_only_parity(self, rng):
        tcfg = TorchEngineConfig(
            frame_recovery_enabled=False, sr_num_features=32,
            sr_num_residual_blocks=2, sr_temporal_window=1,
        )
        tm = _seed_torch(TorchEngine(tcfg), seed=11)
        cfg = EngineConfig(
            frame_recovery_enabled=False, sr_num_features=32,
            sr_num_residual_blocks=2, sr_temporal_window=1,
        )
        variables = imp.import_enhancement_engine(tm.state_dict(), cfg)

        model = EnhancementEngine(cfg)
        x = rng.uniform(0.2, 0.8, (1, 3, 16, 16, 3)).astype(np.float32)
        template = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
        imp.validate_against(variables, template)

        ours = model.apply(variables, jnp.asarray(x))
        with torch.no_grad():
            theirs = tm(torch.from_numpy(np.moveaxis(x, -1, -3).copy()))
        _assert_close(ours["enhanced"], theirs["enhanced"], 2e-3, "engine sr_only")
        _assert_close(
            ours["super_resolved"], theirs["super_resolved"], 2e-3, "engine sr"
        )

    def test_full_pipeline_parity(self, rng):
        """Recovery + SR with a nonzero mask (both stages active both sides)."""
        tcfg = TorchEngineConfig(
            recovery_base_channels=16, sr_num_features=32,
            sr_num_residual_blocks=2, sr_temporal_window=1,
            recovery_temporal_window=2,
        )
        tm = _seed_torch(TorchEngine(tcfg), seed=13)
        cfg = EngineConfig(
            recovery_base_channels=16, sr_num_features=32,
            sr_num_residual_blocks=2, sr_temporal_window=1,
            recovery_temporal_window=2,
        )
        variables = imp.import_enhancement_engine(tm.state_dict(), cfg)

        model = EnhancementEngine(cfg)
        x = rng.uniform(0.2, 0.8, (1, 5, 32, 32, 3)).astype(np.float32)
        mask = (rng.uniform(size=(1, 32, 32, 1)) > 0.6).astype(np.float32)
        template = model.init(
            jax.random.PRNGKey(0), jnp.asarray(x), None, jnp.asarray(mask)
        )
        imp.validate_against(variables, template)

        ours = model.apply(variables, jnp.asarray(x), None, jnp.asarray(mask))
        with torch.no_grad():
            theirs = tm(
                torch.from_numpy(np.moveaxis(x, -1, -3).copy()),
                corruption_mask=_nchw(mask),
            )
        _assert_close(ours["recovered"], theirs["recovered"], 2e-3, "engine recovered")
        _assert_close(ours["enhanced"], theirs["enhanced"], 5e-3, "engine full")

    def test_adaptive_parity(self, rng):
        tcfg = TorchEngineConfig(
            frame_recovery_enabled=False, sr_num_features=32,
            sr_num_residual_blocks=2, sr_temporal_window=1,
        )
        tm = _seed_torch(TorchAdaptiveEngine(tcfg), seed=17)
        cfg = EngineConfig(
            frame_recovery_enabled=False, sr_num_features=32,
            sr_num_residual_blocks=2, sr_temporal_window=1,
        )
        variables = imp.import_adaptive_engine(tm.state_dict(), cfg)

        model = AdaptiveEnhancementEngine(cfg)
        x = rng.uniform(0.2, 0.8, (1, 3, 16, 16, 3)).astype(np.float32)
        template = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
        imp.validate_against(variables, template)

        ours = model.apply(variables, jnp.asarray(x), 0.8, 0.5)
        with torch.no_grad():
            theirs = tm.adaptive_forward(
                torch.from_numpy(np.moveaxis(x, -1, -3).copy()),
                resource_budget=0.8, user_quality_preference=0.5,
            )
        np.testing.assert_allclose(
            np.asarray(ours["complexity"]),
            theirs["complexity"].detach().numpy(),
            atol=1e-4,
        )

    def test_unconsumed_key_raises(self):
        tm = _seed_torch(TorchLightweight(scale_factor=2), seed=1)
        sd = {k: v for k, v in tm.state_dict().items()}
        sd["bogus.extra.weight"] = torch.zeros(1)
        with pytest.raises(ValueError, match="unconsumed"):
            imp.import_lightweight(sd)

    def test_missing_key_raises(self):
        tm = _seed_torch(TorchLightweight(scale_factor=2), seed=1)
        sd = {k: v for k, v in tm.state_dict().items() if "net.6" not in k}
        with pytest.raises(KeyError):
            imp.import_lightweight(sd)
