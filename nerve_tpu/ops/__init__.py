"""TPU-native compute ops for NERVE-TPU.

This package is the framework's "native layer": where the PyTorch reference
delegates its inner loops to cuDNN/ATen kernels (conv2d/3d, grid_sample, the
81-tap correlation loop at nerve_cl/models/layers/efficient_layers.py:336-341,
pixel shuffle), NERVE-TPU implements them as XLA formulations plus Pallas TPU
kernels, all in NHWC layout.
"""

from nerve_tpu.ops.pixel_shuffle import (  # noqa: F401
    depth_to_space_packed,
    pixel_shuffle,
    pixel_shuffle_planar,
)
from nerve_tpu.ops.resize import (  # noqa: F401
    resize_bicubic,
    resize_bilinear,
    upsample_bicubic,
    upsample_bicubic_channels,
    upsample_bilinear_channels,
)
from nerve_tpu.ops.conv_chain import conv_chain_apply  # noqa: F401
from nerve_tpu.ops.planar_chain import planar_chain_apply  # noqa: F401
from nerve_tpu.ops.warp import flow_warp  # noqa: F401
from nerve_tpu.ops.correlation import correlation_volume  # noqa: F401
from nerve_tpu.ops.pool import (  # noqa: F401
    adaptive_avg_pool2d,
    global_avg_pool,
    max_pool2d,
    max_pool3d_spatial,
)
