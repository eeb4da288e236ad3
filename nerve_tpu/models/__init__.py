"""Model networks (L1) and pipeline orchestration (L2).

Public interface parity with nerve_cl/models/__init__.py:1-24 — the same
class names are exported; flax cores are NHWC-native and the ``api`` module
provides the reference's channel-first (B, T, C, H, W) facade.
"""

from nerve_tpu.models.layers import (  # noqa: F401
    CBAM,
    ChannelAttention,
    DepthwiseSeparableConv,
    PixelShuffleUpsampler,
    ResidualBlock,
    SpatialAttention,
    TemporalConv3D,
)
from nerve_tpu.models.super_resolution import (  # noqa: F401
    RDBStack,
    FeatureExtractor,
    LightweightSuperResolution,
    MotionEstimator,
    ResidualDenseBlock,
    SuperResolutionNet,
    TemporalAggregator,
)
from nerve_tpu.models.streaming import (  # noqa: F401
    enhance_video_streaming,
    streaming_prime,
    streaming_step,
)
from nerve_tpu.models.frame_recovery import (  # noqa: F401
    Decoder,
    FrameRecoveryNet,
    FusionModule,
    SpatialEncoder,
    TemporalEncoder,
)
from nerve_tpu.models.enhancement_engine import (  # noqa: F401
    AdaptiveEnhancementEngine,
    EngineConfig,
    EnhancementEngine,
    select_mode_for_budget,
)
