"""Reference-compatible model facade (channel-first, stateful).

The flax cores in this package are NHWC-native and purely functional. This
module provides drop-in style wrappers that preserve the PyTorch reference's
public API surface and tensor contracts so reference users can switch directly:

  * ``SuperResolutionNet(in_channels, scale_factor, num_features,
    num_residual_blocks, temporal_window)`` with ``__call__(lr_frames)`` taking
    (B, T, C, H, W) and returning (B, C, H·s, W·s) — parity with
    nerve_cl/models/super_resolution.py:256-431 including ``forward_single``,
    ``get_num_parameters``, ``get_flops``.
  * ``FrameRecoveryNet(...)`` with (corrupted (B,C,H,W), refs (B,T,C,H,W),
    mask (B,1,H,W)) — parity with frame_recovery.py:335-446.
  * ``EnhancementEngine(config)`` returning the same result dict, plus
    ``enhance_video``, ``get_model_info``, ``set_enhancement_mode`` — parity
    with enhancement_engine.py:40-292.

Wrappers hold a flax variables pytree and jit their applies once per
(shape, mode) signature; all compute stays NHWC internally (TPU conv layout),
transposing only at the API boundary.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from nerve_tpu.models import enhancement_engine as _engine
from nerve_tpu.models import frame_recovery as _fr
from nerve_tpu.models import super_resolution as _sr

Array = Any


def _to_nhwc(x: Array) -> jnp.ndarray:
    """(..., C, H, W) → (..., H, W, C)."""
    x = jnp.asarray(x)
    return jnp.moveaxis(x, -3, -1)


def _frames_nhwc(x: Array) -> jnp.ndarray:
    """Frame ingest: (..., C, H, W) → (..., H, W, C) float in [0, 1].

    uint8 video (the realistic serving input; half the host→device bytes of
    f32) is normalised by 1/255 on device. Floats pass through unchanged —
    the reference's float-[0,1] contract. Corruption MASKS must not take
    this path (a uint8 0/1 mask would become 1/255).
    """
    x = jnp.asarray(x)
    if x.dtype == jnp.uint8:
        x = x.astype(jnp.float32) / 255.0
    return jnp.moveaxis(x, -3, -1)


def to_uint8(frames: Array) -> jnp.ndarray:
    """[0, 1] float frames (any layout) → rounded uint8 for display/encode."""
    x = jnp.asarray(frames)
    return jnp.clip(
        jnp.round(x.astype(jnp.float32) * 255.0), 0.0, 255.0
    ).astype(jnp.uint8)


def _to_nchw(x: jnp.ndarray) -> jnp.ndarray:
    """(..., H, W, C) → (..., C, H, W)."""
    return jnp.moveaxis(x, -1, -3)


def count_params(variables: dict) -> int:
    params = variables.get("params", variables)
    return int(sum(p.size for p in jax.tree_util.tree_leaves(params)))


class _StatefulModule:
    """Holds module + variables; exposes state_dict-style access."""

    def __init__(self, module, example_args: tuple, seed: int = 0):
        self.module = module
        self.variables = module.init(jax.random.PRNGKey(seed), *example_args)

    def get_num_parameters(self) -> int:
        """Total trainable parameter count (parity: get_num_parameters)."""
        return count_params(self.variables)

    @property
    def params(self):
        return self.variables["params"]

    def load_variables(self, variables: dict) -> None:
        self.variables = variables


class SuperResolutionNet(_StatefulModule):
    """Channel-first facade over the flax SuperResolutionNet."""

    def __init__(
        self,
        in_channels: int = 3,
        scale_factor: int = 2,
        num_features: int = 64,
        num_residual_blocks: int = 8,
        temporal_window: int = 1,
        dtype: Any = jnp.float32,
        seed: int = 0,
    ):
        self.scale_factor = scale_factor
        self.temporal_window = temporal_window
        self.num_frames = 2 * temporal_window + 1
        module = _sr.SuperResolutionNet(
            in_channels=in_channels,
            scale_factor=scale_factor,
            num_features=num_features,
            num_residual_blocks=num_residual_blocks,
            temporal_window=temporal_window,
            dtype=dtype,
        )
        example = jnp.zeros((1, self.num_frames, 32, 32, in_channels), jnp.float32)
        super().__init__(module, (example,))
        self._apply = jax.jit(lambda v, x: module.apply(v, x))

    def __call__(self, lr_frames: Array) -> jnp.ndarray:
        """(B, T, C, H, W) → (B, C, H·s, W·s) in [0, 1]."""
        out = self._apply(self.variables, _frames_nhwc(lr_frames))
        return _to_nchw(out)

    def forward_single(self, lr_frame: Array) -> jnp.ndarray:
        """(B, C, H, W) → (B, C, H·s, W·s); repeats the frame across the window
        (parity: super_resolution.py:393-405)."""
        x = jnp.asarray(lr_frame)
        frames = jnp.broadcast_to(
            x[:, None], (x.shape[0], self.num_frames) + x.shape[1:]
        )
        return self(frames)

    def get_flops(self, input_size=(128, 128)) -> int:
        return _sr.estimate_sr_flops(
            input_size,
            num_frames=self.num_frames,
            scale_factor=self.scale_factor,
        )


class LightweightSuperResolution(_StatefulModule):
    """Channel-first facade over the flax LightweightSuperResolution."""

    def __init__(self, scale_factor: int = 2, dtype: Any = jnp.float32, seed: int = 0):
        self.scale_factor = scale_factor
        module = _sr.LightweightSuperResolution(scale_factor=scale_factor, dtype=dtype)
        example = jnp.zeros((1, 32, 32, 3), jnp.float32)
        super().__init__(module, (example,))
        self._apply = jax.jit(lambda v, x: module.apply(v, x))

    def __call__(self, x: Array) -> jnp.ndarray:
        return _to_nchw(self._apply(self.variables, _frames_nhwc(x)))


class FrameRecoveryNet(_StatefulModule):
    """Channel-first facade over the flax FrameRecoveryNet."""

    def __init__(
        self,
        in_channels: int = 3,
        base_channels: int = 64,
        temporal_window: int = 2,
        dtype: Any = jnp.float32,
        seed: int = 0,
    ):
        self.temporal_window = temporal_window
        module = _fr.FrameRecoveryNet(
            in_channels=in_channels,
            base_channels=base_channels,
            temporal_window=temporal_window,
            dtype=dtype,
        )
        example = (
            jnp.zeros((1, 64, 64, in_channels), jnp.float32),
            jnp.zeros((1, 2, 64, 64, in_channels), jnp.float32),
            None,
        )
        super().__init__(module, example)
        self._apply = jax.jit(
            lambda v, frame, refs, mask: module.apply(v, frame, refs, mask)
        )

    def __call__(
        self,
        corrupted_frame: Array,
        reference_frames: Array,
        corruption_mask: Optional[Array] = None,
    ) -> jnp.ndarray:
        """(B,C,H,W), (B,T,C,H,W), (B,1,H,W) → (B,C,H,W)."""
        frame = _frames_nhwc(corrupted_frame)
        refs = _frames_nhwc(reference_frames)
        if corruption_mask is None:
            b, h, w, _ = frame.shape
            mask = jnp.zeros((b, h, w, 1), frame.dtype)
        else:
            mask = _to_nhwc(corruption_mask)
        return _to_nchw(self._apply(self.variables, frame, refs, mask))


# Re-export the config under its reference name for drop-in usage.
EnhancementConfig = _engine.EngineConfig


class EnhancementEngine:
    """Channel-first facade over the flax EnhancementEngine.

    Holds one parameter pytree; mode switches (``set_enhancement_mode``)
    re-instantiate the static graph but reuse matching parameter subtrees, so
    switching between 'full'/'sr_only'/'recovery_only' costs a re-jit only.
    """

    def __init__(self, config: Optional[_engine.EngineConfig] = None, seed: int = 0):
        self.config = config or _engine.EngineConfig()
        self._seed = seed
        self._build()

    def _build(self):
        self.module = _engine.EnhancementEngine(self.config)
        cfg = self.config
        t = 2 * max(cfg.recovery_temporal_window, cfg.sr_temporal_window) + 1
        example = jnp.zeros((1, t, 32, 32, 3), jnp.float32)
        mask = jnp.zeros((1, 32, 32, 1), jnp.float32) if cfg.frame_recovery_enabled else None
        fresh = self.module.init(jax.random.PRNGKey(self._seed), example, None, mask)
        if hasattr(self, "variables"):
            fresh = _merge_matching(fresh, self.variables)
        self.variables = fresh
        self._jit_engine_applies()

    def _jit_engine_applies(self):
        """Shared jit cache for the forward + video paths (also used by the
        adaptive subclass — the reference inherits enhance_video there too,
        nerve_cl/models/enhancement_engine.py:295)."""
        self._apply_nomask = jax.jit(
            lambda v, x: self.module.apply(v, x, None, None)
        )
        self._apply_mask = jax.jit(
            lambda v, x, m: self.module.apply(v, x, None, m)
        )
        self._enhance_video = jax.jit(
            lambda v, x: self.module.apply(v, x, method="enhance_video")
        )
        self._enhance_video_masked = jax.jit(
            lambda v, x, m: self.module.apply(v, x, m, method="enhance_video")
        )
        self._quantize_frames = jax.jit(to_uint8)

    def __call__(
        self,
        frames: Array,
        center_idx: Optional[int] = None,
        corruption_mask: Optional[Array] = None,
        enhancement_strength: Optional[float] = None,
    ) -> Dict[str, jnp.ndarray]:
        """(B, T, C, H, W) [+ mask (B, 1, H, W)] → dict of (B, C, H', W')."""
        x = _frames_nhwc(frames)
        if center_idx is not None or enhancement_strength is not None:
            # Non-default static args: apply without the cached jit.
            strength = (
                None
                if enhancement_strength is None
                else jnp.asarray([enhancement_strength], jnp.float32)
            )
            mask = None if corruption_mask is None else _to_nhwc(corruption_mask)
            out = self.module.apply(self.variables, x, center_idx, mask, strength)
        elif corruption_mask is None:
            out = self._apply_nomask(self.variables, x)
        else:
            out = self._apply_mask(self.variables, x, _to_nhwc(corruption_mask))
        return {k: _to_nchw(v) for k, v in out.items()}

    def enhance_video(
        self, video: Array, corruption_masks: Optional[Array] = None,
        batch_size: int = 4, as_uint8: bool = False,
    ) -> jnp.ndarray:
        """(T, C, H, W) or (B, T, C, H, W) [+ masks (T, 1, H, W)] → enhanced video.

        Parity: enhancement_engine.py:186-248 (including the 4-D squeeze path).
        ``batch_size`` is accepted for API compatibility; the scan-based
        pipeline compiles once and streams every frame, so host-side frame
        batching is unnecessary here. ``as_uint8`` rounds to uint8 on DEVICE
        before any transfer — ~4× fewer device→host bytes for serving
        consumers that encode/display the frames.
        """
        del batch_size
        v = jnp.asarray(video)
        squeeze = v.ndim == 4
        if squeeze:
            v = v[None]
        x = _frames_nhwc(v)
        if corruption_masks is None:
            out = self._enhance_video(self.variables, x)
        else:
            m = jnp.asarray(corruption_masks)
            if m.ndim == 4:  # (T, 1, H, W) → (B, T, H, W, 1)
                m = m[None]
            out = self._enhance_video_masked(self.variables, x, _to_nhwc(m))
        if as_uint8:
            out = self._quantize_frames(out)
        out = _to_nchw(out)
        return out[0] if squeeze else out

    def get_num_parameters(self) -> int:
        return count_params(self.variables)

    def get_model_info(self) -> Dict[str, Any]:
        """Parity: enhancement_engine.py:250-271."""
        params = self.variables["params"]
        info: Dict[str, Any] = {
            "config": {
                "frame_recovery_enabled": self.config.frame_recovery_enabled,
                "super_resolution_enabled": self.config.super_resolution_enabled,
                "scale_factor": self.config.scale_factor,
                "use_lightweight_sr": self.config.use_lightweight_sr,
            },
            "parameters": {
                "total": count_params(self.variables),
                "trainable": count_params(self.variables),
            },
        }
        if "frame_recovery" in params:
            info["parameters"]["frame_recovery"] = int(
                sum(p.size for p in jax.tree_util.tree_leaves(params["frame_recovery"]))
            )
        if "super_resolution" in params:
            info["parameters"]["super_resolution"] = int(
                sum(p.size for p in jax.tree_util.tree_leaves(params["super_resolution"]))
            )
        return info

    def set_enhancement_mode(self, mode: str) -> None:
        """Parity: enhancement_engine.py:273-292; reuses matching params."""
        self.config = self.config.with_mode(mode)
        self._build()

    def quantize_int8(self, calib_video: Array, chains: bool = True) -> None:
        """Switch the engine to int8 SR serving (the v5e 394-TOPS path).

        ``calib_video``: (T, C, H, W) or (B, T, C, H, W) representative
        frames; static per-tensor max-abs activation scales are calibrated
        through the WHOLE pipeline on them (models.quantize). ``chains``
        also quantises the conv-chain sites outside the RDB stack
        (head/flow/attention/gff/upsampler — quantized_chains).

        No reference analogue (nerve_cl serves f32 torch end to end).
        """
        import dataclasses

        from nerve_tpu.models import quantize as _quantize

        if not self.config.super_resolution_enabled or self.config.use_lightweight_sr:
            raise ValueError(
                "int8 serving quantises the full SuperResolutionNet; enable "
                "super-resolution (mode 'full'/'sr_only') first"
            )
        self.config = dataclasses.replace(
            self.config, sr_quantized=True, sr_quantized_chains=chains
        )
        trained = self.variables
        self._build()  # re-jit the int8 graph; matching params re-merged
        v = jnp.asarray(calib_video)
        if v.ndim == 4:
            v = v[None]
        t = 2 * max(self.config.recovery_temporal_window,
                    self.config.sr_temporal_window) + 1
        x = _frames_nhwc(v[:, :t])
        mask = (
            jnp.zeros(x.shape[:1] + x.shape[2:4] + (1,), x.dtype)
            if self.config.frame_recovery_enabled else None
        )
        cal_vars = {k: val for k, val in trained.items() if k != "quant"}
        self.variables = _quantize.quantize_engine_variables(
            self.module, cal_vars, x, mask
        )


class AdaptiveEnhancementEngine(EnhancementEngine):
    """Channel-first facade over the adaptive engine.

    Parity: nerve_cl/models/enhancement_engine.py:295-381 — a content-
    complexity estimator modulates enhancement strength, and the resource
    budget picks the pipeline mode (thresholds 0.3 / 0.6). Mode selection is
    a static (re-jit) decision here, made before the forward.
    """

    def _build(self):
        self.module = _engine.AdaptiveEnhancementEngine(self.config)
        cfg = self.config
        t = 2 * max(cfg.recovery_temporal_window, cfg.sr_temporal_window) + 1
        example = jnp.zeros((1, t, 32, 32, 3), jnp.float32)
        fresh = self.module.init(jax.random.PRNGKey(self._seed), example)
        if hasattr(self, "variables"):
            fresh = _merge_matching(fresh, self.variables)
        self.variables = fresh
        self._adaptive = jax.jit(
            lambda v, x, rb, uq: self.module.apply(v, x, rb, uq),
            static_argnums=(),
        )
        self._jit_engine_applies()

    def estimate_complexity(self, frame):
        """(B, C, H, W) → (B, 1) complexity in [0, 1]."""
        x = _frames_nhwc(frame)
        return self.module.apply(
            self.variables, x, method=_engine.AdaptiveEnhancementEngine.estimate_complexity
        )

    def adaptive_forward(
        self,
        frames,
        resource_budget: float = 1.0,
        user_quality_preference: float = 0.5,
    ):
        """Budget-aware enhancement (parity: adaptive_forward, :330-381)."""
        mode = _engine.select_mode_for_budget(resource_budget)
        if self.config.with_mode(mode) != self.config:
            self.config = self.config.with_mode(mode)
            self._build()
        out = self._adaptive(
            self.variables, _frames_nhwc(frames),
            jnp.float32(resource_budget), jnp.float32(user_quality_preference),
        )
        result = {
            k: (_to_nchw(v) if hasattr(v, "ndim") and v.ndim >= 3 else v)
            for k, v in out.items()
        }
        return result

    def __call__(
        self, frames, resource_budget: float = 1.0, user_quality_preference: float = 0.5
    ):
        return self.adaptive_forward(frames, resource_budget, user_quality_preference)


def _merge_matching(fresh: dict, old: dict):
    """Graft old leaves onto a fresh pytree wherever path+shape match."""

    def merge(f, o):
        if isinstance(f, dict) and isinstance(o, dict):
            return {
                k: merge(f[k], o[k]) if k in o else f[k] for k in f
            }
        if hasattr(f, "shape") and hasattr(o, "shape") and f.shape == o.shape:
            return o
        return f

    return merge(fresh, old)
