"""Combined enhancement pipeline: recovery → super-resolution (flax, NHWC).

TPU-native re-design of nerve_cl/models/enhancement_engine.py:
  EnhancementConfig        — enhancement_engine.py:18-37 (mirrored by
                             nerve_tpu.config.schema; the module attributes
                             below are the static subset that shapes the graph)
  EnhancementEngine        — enhancement_engine.py:40-292
  AdaptiveEnhancementEngine— enhancement_engine.py:295-381
  enhance_video            — enhancement_engine.py:186-248, re-built as a
                             `lax.scan` over gathered fixed-shape windows
                             (streaming, O(1) memory in T, single compilation)

Design notes vs the reference:
  * Mask-conditional recovery (reference: runs only when ``mask.sum() > 0``,
    enhancement_engine.py:130-138) is data-dependent control flow. Because the
    recovery net ends in a mask blend (out = frame·(1-mask) + rec·mask,
    frame_recovery.py:440), always-run + blend is semantically identical for
    a zero mask — so under jit we run it unconditionally when a mask is
    supplied, and skip it statically when ``corruption_mask is None``.
  * ``enhancement_strength`` is a genuinely differentiable parameter here; the
    reference declares it learnable but reads it via ``.item()``
    (enhancement_engine.py:93,170), severing the gradient.
  * Video windows are built by index-clamped gathers, so a boundary frame is
    always the *center* of its (edge-replicated) window. The reference's
    right-pad-by-last-frame (enhancement_engine.py:152-158) silently shifts
    the aggregation center at sequence boundaries.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from nerve_tpu import ops
from nerve_tpu.models.frame_recovery import FrameRecoveryNet
from nerve_tpu.models.super_resolution import (
    LightweightSuperResolution,
    SuperResolutionNet,
)

Dtype = Any


@dataclass(frozen=True)
class EngineConfig:
    """Static pipeline configuration (parity: enhancement_engine.py:18-37)."""

    frame_recovery_enabled: bool = True
    recovery_base_channels: int = 64
    recovery_temporal_window: int = 2

    super_resolution_enabled: bool = True
    scale_factor: int = 2
    sr_num_features: int = 64
    sr_num_residual_blocks: int = 8
    sr_temporal_window: int = 1

    use_lightweight_sr: bool = False
    # int8 RDB serving for the full SR net (nerve_tpu.ops.rdb_int8). Needs
    # the "quant" collection built by models.quantize.quantize_sr_variables
    # (pass frames through the engine's SR sub-window for calibration).
    sr_quantized: bool = False
    # int8 for the SR net's conv-chain sites outside the RDB stack too
    # (head/flow/attention/gff/upsampler — SuperResolutionNet.quantized_chains).
    sr_quantized_chains: bool = False
    # Internal: calibration forward (models.quantize.quantize_engine_variables).
    sr_quant_calibrate: bool = False
    enhancement_mode: str = "sequential"

    def with_mode(self, mode: str) -> "EngineConfig":
        """Mode presets (parity: set_enhancement_mode, :273-292)."""
        presets = {
            "full": dict(frame_recovery_enabled=True, super_resolution_enabled=True,
                         use_lightweight_sr=False),
            "recovery_only": dict(frame_recovery_enabled=True, super_resolution_enabled=False),
            "sr_only": dict(frame_recovery_enabled=False, super_resolution_enabled=True,
                            use_lightweight_sr=False),
            "lightweight": dict(frame_recovery_enabled=False, super_resolution_enabled=True,
                                use_lightweight_sr=True),
        }
        if mode not in presets:
            raise ValueError(f"unknown mode {mode!r}")
        import dataclasses

        return dataclasses.replace(self, **presets[mode])


class EnhancementEngine(nn.Module):
    """Recovery → SR pipeline over a temporal window.

    __call__ contract (NHWC; facade preserves the reference's channel-first):
      frames (B, T, H, W, C); optional corruption_mask (B, H, W, 1);
      center_idx static int (default T//2). Returns a dict with 'enhanced'
      (B, H·s, W·s, C) plus 'recovered' / 'super_resolved' when enabled —
      the same keys as the reference (enhancement_engine.py:101-116).
    """

    config: EngineConfig = EngineConfig()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        frames: jnp.ndarray,
        center_idx: Optional[int] = None,
        corruption_mask: Optional[jnp.ndarray] = None,
        enhancement_strength: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        cfg = self.config
        b, t, h, w, c = frames.shape
        if center_idx is None:
            center_idx = t // 2

        results: Dict[str, jnp.ndarray] = {}
        current = frames[:, center_idx]

        # ------------------------------------------------------------------ #
        # Stage 1: frame recovery (static skip when no mask is supplied).
        # ------------------------------------------------------------------ #
        if cfg.frame_recovery_enabled:
            recovery = FrameRecoveryNet(
                base_channels=cfg.recovery_base_channels,
                temporal_window=cfg.recovery_temporal_window,
                dtype=self.dtype,
                name="frame_recovery",
            )
            if corruption_mask is not None:
                ref_idx = [i for i in range(t) if i != center_idx]
                refs = frames[:, ref_idx] if ref_idx else frames[:, center_idx : center_idx + 1]
                recovered = recovery(current, refs, corruption_mask, train)
                results["recovered"] = recovered
                current = recovered

        # ------------------------------------------------------------------ #
        # Stage 2: super-resolution over the SR temporal sub-window.
        # ------------------------------------------------------------------ #
        if cfg.super_resolution_enabled:
            if cfg.use_lightweight_sr:
                sr = LightweightSuperResolution(
                    scale_factor=cfg.scale_factor, dtype=self.dtype, name="super_resolution"
                )
                super_resolved = sr(current, train)
            else:
                sw = cfg.sr_temporal_window
                # Clamp-gather the window so the enhanced frame is always the
                # window center (edge replication at boundaries).
                idx = jnp.clip(jnp.arange(center_idx - sw, center_idx + sw + 1), 0, t - 1)
                sr_frames = jnp.take(frames, idx, axis=1)
                if corruption_mask is not None and cfg.frame_recovery_enabled:
                    # Feed the recovered center back into the SR window.
                    sr_frames = sr_frames.at[:, sw].set(current)
                sr = SuperResolutionNet(
                    scale_factor=cfg.scale_factor,
                    num_features=cfg.sr_num_features,
                    num_residual_blocks=cfg.sr_num_residual_blocks,
                    temporal_window=sw,
                    quantized=cfg.sr_quantized,
                    quantized_chains=cfg.sr_quantized_chains,
                    quant_calibrate=cfg.sr_quant_calibrate,
                    dtype=self.dtype,
                    name="super_resolution",
                )
                super_resolved = sr(sr_frames, train)
            results["super_resolved"] = super_resolved
            current = super_resolved

        # ------------------------------------------------------------------ #
        # Strength blending vs the bicubic base (differentiable — defect fix).
        # ------------------------------------------------------------------ #
        strength_param = self.param(
            "enhancement_strength", lambda key: jnp.ones((1,), jnp.float32)
        )
        strength = (
            enhancement_strength if enhancement_strength is not None else strength_param
        )
        strength = jnp.clip(jnp.asarray(strength, jnp.float32), 0.0, 1.0)
        if cfg.super_resolution_enabled:
            bicubic = ops.resize_bicubic(frames[:, center_idx], current.shape[1:3])
            current = strength * current + (1.0 - strength) * bicubic.astype(jnp.float32)

        results["enhanced"] = current
        return results

    # ---------------------------------------------------------------------- #
    # Whole-video enhancement as a scan (replaces the reference's Python
    # sliding-window loop, enhancement_engine.py:221-240).
    # ---------------------------------------------------------------------- #
    def enhance_video(
        self,
        video: jnp.ndarray,
        corruption_masks: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        """Enhance every frame of (B, T, H, W, C) → (B, T, H·s, W·s, C).

        Builds the clamp-indexed window for each t and scans the single-window
        pipeline over time. Under jit the scan body compiles once and streams
        frames with O(window) live memory.
        """
        cfg = self.config
        b, t, h, w, c = video.shape
        win = 2 * max(cfg.recovery_temporal_window, cfg.sr_temporal_window) + 1
        half = win // 2

        def body(carry, xs):
            del carry
            tc, mask_t = xs
            idx = jnp.clip(jnp.arange(-half, half + 1) + tc, 0, t - 1)
            window = jnp.take(video, idx, axis=1)
            out = self(window, half, mask_t, None, train)
            return 0, out["enhanced"]

        if corruption_masks is None:
            # Static no-recovery path: mask=None inside the scanned call.
            def body_nomask(carry, tc):
                del carry
                idx = jnp.clip(jnp.arange(-half, half + 1) + tc, 0, t - 1)
                window = jnp.take(video, idx, axis=1)
                out = self(window, half, None, None, train)
                return 0, out["enhanced"]

            _, frames = jax.lax.scan(body_nomask, 0, jnp.arange(t))
        else:
            masks = jnp.moveaxis(corruption_masks, 1, 0)  # (T, B, H, W, 1)
            _, frames = jax.lax.scan(body, 0, (jnp.arange(t), masks))
        return jnp.moveaxis(frames, 0, 1)  # (B, T, H', W', C)


class AdaptiveEnhancementEngine(nn.Module):
    """Engine + content-complexity estimator for quality/compute trade-off.

    Parity: enhancement_engine.py:295-381. The complexity head is an
    8×8-pooled MLP; ``adaptive_forward`` mixes resource budget, user
    preference, and estimated complexity into the blend strength
    (weights 0.3/0.3/0.4, clamped to [0.3, 1.0], :354-359). Mode selection by
    budget (thresholds 0.3/0.6, :362-370) is a *static* choice made by the
    caller via ``EngineConfig.with_mode`` — the engine's graph cannot change
    under jit, so the facade picks the config before compilation.
    """

    config: EngineConfig = EngineConfig()
    dtype: Dtype = jnp.float32

    def setup(self):
        self.engine = EnhancementEngine(self.config, self.dtype, name="engine")
        self.complexity_fc1 = nn.Dense(64, dtype=self.dtype)
        self.complexity_fc2 = nn.Dense(1, dtype=self.dtype)

    def estimate_complexity(self, frame: jnp.ndarray) -> jnp.ndarray:
        """(B, H, W, C) → (B, 1) complexity score in [0, 1]."""
        y = ops.adaptive_avg_pool2d(frame.astype(self.dtype), 8)
        y = y.reshape(y.shape[0], -1)
        y = nn.relu(self.complexity_fc1(y))
        return nn.sigmoid(self.complexity_fc2(y)).astype(jnp.float32)

    def __call__(
        self,
        frames: jnp.ndarray,
        resource_budget: float = 1.0,
        user_quality_preference: float = 0.5,
        train: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        b, t, h, w, c = frames.shape
        center = frames[:, t // 2]
        complexity = self.estimate_complexity(center)
        strength = (
            0.3 * resource_budget
            + 0.3 * user_quality_preference
            + 0.4 * jnp.mean(complexity)
        )
        strength = jnp.clip(strength, 0.3, 1.0)
        results = self.engine(frames, None, None, strength, train)
        results["complexity"] = complexity
        results["enhancement_strength"] = strength
        return results

    def enhance_video(
        self,
        video: jnp.ndarray,
        corruption_masks: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        """Whole-video path at default strength — the reference's adaptive
        engine inherits this from EnhancementEngine (enhancement_engine.py:295)."""
        return self.engine.enhance_video(video, corruption_masks, train)


def select_mode_for_budget(resource_budget: float) -> str:
    """Budget → mode thresholds (parity: enhancement_engine.py:362-370)."""
    if resource_budget < 0.3:
        return "lightweight"
    if resource_budget < 0.6:
        return "sr_only"
    return "full"
