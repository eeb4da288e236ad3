"""Utilities: metrics, checkpointing, synthetic data, profiling."""

from nerve_tpu.utils.metrics import mae, mse, psnr, ssim, temporal_of  # noqa: F401
