"""Image effects: unsharp-mask sharpen, adaptive (edge-aware) sharpen,
separable Gaussian blur.

Device formulation (reference effects.go): every effect is a fused jitted
array program — the 3×3 blur, Sobel gradients, and unsharp arithmetic are
element-wise/conv ops XLA fuses into one pass over the image.  Semantics:

  - sharpen:          amount = 1 + 1.5·strength (effects.go:10-45)
  - adaptive_sharpen: amount = 1 + 2·strength, scaled per-pixel by Sobel
                      edge strength normalized by 400 (effects.go:49-112)
  - gaussian_blur:    separable, radius = ceil(3σ), edge-clamped, RGB only;
                      alpha passes through from the source
                      (effects.go:146-220)
  - borders: the 3×3-based effects leave a 1px border untouched, exactly
    like the reference's interior-only loops (effects.go:70, 122)

No-op identity: strength <= 0 (or σ <= 0) returns the *same object*
(reference tests assert pointer identity, fennec_test.go:632-639).
"""

from __future__ import annotations

from typing import Union

import jax
import jax.numpy as jnp
import numpy as np

from ..image import to_nrgba_ref
from .color import clamp_u8_device, luminance_device
from .filters import gaussian_blur_kernel

Array = Union[np.ndarray, jax.Array]


# ── Device kernels ──────────────────────────────────────────────────────────


def _blur3x3_rgb(img: jax.Array) -> jax.Array:
    """3×3 binomial blur of RGB channels; borders keep source values
    (reference effects.go:116-141).  img: (H, W, 4) float32."""
    rgb = img[..., :3]
    # Separable [1,2,1]/4 passes over the interior.
    hsum = (rgb[:, :-2] + 2.0 * rgb[:, 1:-1] + rgb[:, 2:]) * 0.25
    inner = (hsum[:-2] + 2.0 * hsum[1:-1] + hsum[2:]) * 0.25
    inner = clamp_u8_device(inner)  # reference rounds each blurred texel
    out = rgb.at[1:-1, 1:-1].set(inner)
    return jnp.concatenate([out, img[..., 3:4]], axis=-1)


@jax.jit
def sharpen_device(img: jax.Array, strength: jax.Array) -> jax.Array:
    """Unsharp mask over the full image (reference effects.go:10-45)."""
    img = img.astype(jnp.float32)
    blurred = _blur3x3_rgb(img)
    amount = 1.0 + strength * 1.5
    rgb = img[..., :3]
    out = rgb + amount * (rgb - blurred[..., :3])
    return jnp.concatenate([clamp_u8_device(out), img[..., 3:4]], axis=-1)


def _sobel_edge_strength(lum: jax.Array) -> jax.Array:
    """Sobel gradient magnitude / 400, clipped to [0,1], on the interior
    (reference effects.go:93-112).  lum: (H, W) → (H-2, W-2)."""
    tl, tc, tr = lum[:-2, :-2], lum[:-2, 1:-1], lum[:-2, 2:]
    ml, mr = lum[1:-1, :-2], lum[1:-1, 2:]
    bl, bc, br = lum[2:, :-2], lum[2:, 1:-1], lum[2:, 2:]
    gx = -tl + tr - 2.0 * ml + 2.0 * mr - bl + br
    gy = -tl - 2.0 * tc - tr + bl + 2.0 * bc + br
    mag = jnp.sqrt(gx * gx + gy * gy)
    return jnp.clip(mag / 400.0, 0.0, 1.0)


@jax.jit
def adaptive_sharpen_device(img: jax.Array,
                            strength: jax.Array) -> jax.Array:
    """Edge-aware unsharp mask; smooth regions untouched
    (reference effects.go:49-90)."""
    img = img.astype(jnp.float32)
    blurred = _blur3x3_rgb(img)
    amount = 1.0 + strength * 2.0
    edge = _sobel_edge_strength(luminance_device(img))  # (H-2, W-2)
    rgb = img[..., :3]
    local = (amount * edge)[..., None]
    inner = rgb[1:-1, 1:-1] + local * (rgb[1:-1, 1:-1]
                                       - blurred[1:-1, 1:-1, :3])
    out = rgb.at[1:-1, 1:-1].set(clamp_u8_device(inner))
    return jnp.concatenate([out, img[..., 3:4]], axis=-1)


def _gaussian_blur_device(img: jax.Array, kernel: jax.Array) -> jax.Array:
    """Separable Gaussian blur of RGB with edge-clamped borders
    (reference effects.go:146-220).  img: (H, W, 4) any dtype."""
    img = img.astype(jnp.float32)
    radius = kernel.shape[0] // 2
    rgb = img[..., :3]
    padded = jnp.pad(rgb, ((0, 0), (radius, radius), (0, 0)), mode="edge")
    x = _conv1d_axis(padded, kernel, axis=1)
    padded = jnp.pad(x, ((radius, radius), (0, 0), (0, 0)), mode="edge")
    x = _conv1d_axis(padded, kernel, axis=0)
    return jnp.concatenate([clamp_u8_device(x), img[..., 3:4]], axis=-1)


def _conv1d_axis(x: jax.Array, kernel: jax.Array, axis: int) -> jax.Array:
    """VALID 1D convolution of (H, W, C) along the given spatial axis."""
    c = x.shape[-1]
    n = kernel.shape[0]
    xb = jnp.transpose(x, (2, 0, 1))[None]  # (1, C, H, W)
    if axis == 1:
        k = jnp.broadcast_to(kernel.reshape(1, 1, 1, n), (c, 1, 1, n))
    else:
        k = jnp.broadcast_to(kernel.reshape(1, 1, n, 1), (c, 1, n, 1))
    dn = jax.lax.conv_dimension_numbers(xb.shape, k.shape,
                                        ("NCHW", "OIHW", "NCHW"))
    out = jax.lax.conv_general_dilated(xb, k, (1, 1), "VALID",
                                       dimension_numbers=dn,
                                       feature_group_count=c,
                                       precision=jax.lax.Precision.HIGHEST)
    return jnp.transpose(out[0], (1, 2, 0))


_blur_jit = jax.jit(_gaussian_blur_device)


# ── Host API ────────────────────────────────────────────────────────────────


def _clamped_strength(strength: float) -> float:
    return min(1.0, float(strength))


def sharpen(img: Array, strength: float) -> Array:
    """Unsharp-mask sharpening, strength in [0, 1]
    (reference effects.go:10-45).  strength <= 0 returns img unchanged."""
    if strength <= 0:
        return img
    arr = to_nrgba_ref(np.asarray(img))
    h, w = arr.shape[:2]
    if w < 3 or h < 3:
        return img
    s = _clamped_strength(strength)
    out = sharpen_device(jnp.asarray(arr),
                         jnp.float32(s))
    return np.asarray(out, dtype=np.uint8)


def adaptive_sharpen(img: Array, strength: float) -> Array:
    """Edge-aware sharpening that leaves smooth areas untouched
    (reference effects.go:49-90)."""
    if strength <= 0:
        return img
    arr = to_nrgba_ref(np.asarray(img))
    h, w = arr.shape[:2]
    if w < 3 or h < 3:
        return img
    s = _clamped_strength(strength)
    out = adaptive_sharpen_device(jnp.asarray(arr),
                                  jnp.float32(s))
    return np.asarray(out, dtype=np.uint8)


def gaussian_blur(img: Array, sigma: float) -> Array:
    """Gaussian blur with the given σ (reference effects.go:146-220).
    σ <= 0 returns img unchanged; alpha is preserved."""
    if sigma <= 0:
        return img
    arr = to_nrgba_ref(np.asarray(img))
    kernel = jnp.asarray(gaussian_blur_kernel(float(sigma)),
                         dtype=jnp.float32)
    out = _blur_jit(jnp.asarray(arr), kernel)
    return np.asarray(out, dtype=np.uint8)
