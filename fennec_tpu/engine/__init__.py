"""Optimization engines: SSIM-guided quality search, PNG optimization,
target-size strategies, and the shared compression pipeline."""

from .compress import compress_jpeg_optimal, compress_png  # noqa: F401
from .pipeline import compress_image_internal  # noqa: F401
