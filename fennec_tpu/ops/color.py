"""Color-space transforms: BT.601 luminance and JPEG YCbCr.

Luminance semantics follow the reference (ssim.go:207-220, effects.go:93-97):
lum = 0.299 R + 0.587 G + 0.114 B, computed on the *non-premultiplied* RGB
channels, alpha ignored.  On device everything is float32; values live in
[0, 255] to keep the Wang-et-al SSIM constants (L=255) unchanged.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_LUMA_R = 0.299
_LUMA_G = 0.587
_LUMA_B = 0.114


def luminance_device(img: jax.Array) -> jax.Array:
    """BT.601 luminance of an (..., H, W, C>=3) float array → (..., H, W)."""
    return (_LUMA_R * img[..., 0] + _LUMA_G * img[..., 1]
            + _LUMA_B * img[..., 2])


def luminance_host(img: np.ndarray) -> np.ndarray:
    """float64 host luminance, used by oracles and the analyzer."""
    a = np.asarray(img, dtype=np.float64)
    return _LUMA_R * a[..., 0] + _LUMA_G * a[..., 1] + _LUMA_B * a[..., 2]


# ── JPEG color transforms (ITU-T T.871 full-range YCbCr) ────────────────────
# Used by the device JPEG path (codecs/jpeg.py): RGB→YCbCr before DCT on
# encode, YCbCr→RGB after IDCT on decode.


def rgb_to_ycbcr(rgb: jax.Array) -> jax.Array:
    """(..., 3) float RGB in [0,255] → (..., 3) YCbCr in [0,255]."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    return jnp.stack([y, cb, cr], axis=-1)


def ycbcr_to_rgb(ycc: jax.Array) -> jax.Array:
    """(..., 3) float YCbCr in [0,255] → (..., 3) RGB (unclamped)."""
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    return jnp.stack([r, g, b], axis=-1)


def round_half_away(x: jax.Array) -> jax.Array:
    """Round half away from zero, matching Go's math.Round / clampF
    (reference convert.go:149-158) for the non-negative pixel domain."""
    return jnp.floor(x + 0.5)


def clamp_u8_device(x: jax.Array) -> jax.Array:
    """Clamp float array to [0, 255] with round-half-away, staying float32.

    Value-identical to the reference's clampF-to-uint8 writes; keeping
    float32 avoids dtype churn inside fused device pipelines.
    """
    return jnp.clip(round_half_away(x), 0.0, 255.0)
