"""Float64 host oracles re-implementing the documented reference semantics.

These are the correctness oracles for the device kernels: pure numpy
float64, written directly from the behavioral spec captured in SURVEY.md
(window ranges, constants, sampling grids).  The Go reference is not
available at test time, so golden parity is asserted device-vs-oracle
(<1e-4 for SSIM, per BASELINE.md).
"""

from __future__ import annotations

import math

import numpy as np

SSIM_C1 = (0.01 * 255.0) ** 2
SSIM_C2 = (0.03 * 255.0) ** 2


def luminance(img: np.ndarray) -> np.ndarray:
    a = img.astype(np.float64)
    return 0.299 * a[..., 0] + 0.587 * a[..., 1] + 0.114 * a[..., 2]


def gaussian_kernel_2d(size: int = 8, sigma: float = 1.5) -> np.ndarray:
    half = size // 2
    ys, xs = np.mgrid[-half:half, -half:half]
    k = np.exp(-(xs * xs + ys * ys) / (2 * sigma * sigma))
    return k / k.sum()


def windowed_ssim(lum_a: np.ndarray, lum_b: np.ndarray) -> float:
    """Two-pass windowed SSIM exactly as specified: 8×8 window over offsets
    [-4, 4), centers y ∈ [4, h-4), x ∈ [4, w-4)."""
    h, w = lum_a.shape
    k = gaussian_kernel_2d()
    size = 8
    if h <= size or w <= size:
        return 1.0
    wa = np.lib.stride_tricks.sliding_window_view(lum_a, (size, size))
    wb = np.lib.stride_tricks.sliding_window_view(lum_b, (size, size))
    wa = wa[: h - size, : w - size]
    wb = wb[: h - size, : w - size]
    mu_a = np.tensordot(wa, k, axes=([2, 3], [0, 1]))
    mu_b = np.tensordot(wb, k, axes=([2, 3], [0, 1]))
    da = wa - mu_a[..., None, None]
    db = wb - mu_b[..., None, None]
    sig_aa = np.tensordot(da * da, k, axes=([2, 3], [0, 1]))
    sig_bb = np.tensordot(db * db, k, axes=([2, 3], [0, 1]))
    sig_ab = np.tensordot(da * db, k, axes=([2, 3], [0, 1]))
    num = (2 * mu_a * mu_b + SSIM_C1) * (2 * sig_ab + SSIM_C2)
    den = (mu_a ** 2 + mu_b ** 2 + SSIM_C1) * (sig_aa + sig_bb + SSIM_C2)
    vals = num / den
    if vals.size == 0:
        return 1.0
    return float(vals.mean())


def pixel_ssim(a: np.ndarray, b: np.ndarray) -> float:
    la, lb = luminance(a), luminance(b)
    n = la.size
    if n == 0:
        return 1.0
    mu_a, mu_b = la.mean(), lb.mean()
    da, db = la - mu_a, lb - mu_b
    sig_aa = (da * da).mean()
    sig_bb = (db * db).mean()
    sig_ab = (da * db).mean()
    num = (2 * mu_a * mu_b + SSIM_C1) * (2 * sig_ab + SSIM_C2)
    den = (mu_a ** 2 + mu_b ** 2 + SSIM_C1) * (sig_aa + sig_bb + SSIM_C2)
    return float(num / den)


def box_downsample(img: np.ndarray, dst_w: int, dst_h: int) -> np.ndarray:
    """Box downsample with the reference's boundary arithmetic."""
    src_h, src_w = img.shape[:2]
    out = np.zeros((dst_h, dst_w, 4), dtype=np.uint8)
    xr = src_w / dst_w
    yr = src_h / dst_h
    for dy in range(dst_h):
        sy0, sy1 = int(dy * yr), int((dy + 1) * yr)
        sy1 = min(sy1, src_h)
        if sy0 >= sy1:
            sy0 = sy1 - 1
        sy0 = max(sy0, 0)
        for dx in range(dst_w):
            sx0, sx1 = int(dx * xr), int((dx + 1) * xr)
            sx1 = min(sx1, src_w)
            if sx0 >= sx1:
                sx0 = sx1 - 1
            sx0 = max(sx0, 0)
            block = img[sy0:sy1, sx0:sx1].astype(np.float64)
            mean = block.mean(axis=(0, 1))
            out[dy, dx] = np.clip(np.floor(mean + 0.5), 0, 255)
    return out


def ssim_fast(a: np.ndarray, b: np.ndarray, max_dim: int = 512) -> float:
    h, w = a.shape[:2]
    if w > max_dim or h > max_dim:
        scale = max_dim / max(w, h)
        nw = int(max(8, math.floor(w * scale + 0.5)))
        nh = int(max(8, math.floor(h * scale + 0.5)))
        a = box_downsample(a, nw, nh)
        b = box_downsample(b, nw, nh)
        w, h = nw, nh
    if w < 8 or h < 8:
        return pixel_ssim(a, b)
    return windowed_ssim(luminance(a), luminance(b))


def gaussian_blur(img: np.ndarray, sigma: float) -> np.ndarray:
    """Separable Gaussian blur oracle (radius = ceil(3σ), edge clamp,
    uint8 rounding after each pass like the reference)."""
    h, w = img.shape[:2]
    radius = int(math.ceil(sigma * 3))
    xs = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-(xs * xs) / (2 * sigma * sigma))
    k /= k.sum()

    src = img.astype(np.float64)
    tmp = np.zeros_like(src)
    for x in range(w):
        acc = np.zeros((h, 3))
        for i, wt in enumerate(k):
            sx = min(max(x + i - radius, 0), w - 1)
            acc += src[:, sx, :3] * wt
        tmp[:, x, :3] = np.clip(np.floor(acc + 0.5), 0, 255)
        tmp[:, x, 3] = img[:, x, 3]
    out = np.zeros_like(src)
    for y in range(h):
        acc = np.zeros((w, 3))
        for i, wt in enumerate(k):
            sy = min(max(y + i - radius, 0), h - 1)
            acc += tmp[sy, :, :3] * wt
        out[y, :, :3] = np.clip(np.floor(acc + 0.5), 0, 255)
        out[y, :, 3] = img[y, :, 3]
    return out.astype(np.uint8)


def ms_ssim(a: np.ndarray, b: np.ndarray) -> float:
    """5-scale MS-SSIM oracle (reference ssim.go:313-365 semantics)."""
    h, w = a.shape[:2]
    weights = [0.0448, 0.2856, 0.3001, 0.2363, 0.1333]
    ww, hh = w, h
    for i in range(len(weights) - 1):
        if min(ww, hh) < 8:
            weights = weights[: i + 1]
            s = sum(weights)
            weights = [x / s for x in weights]
            break
        ww //= 2
        hh //= 2
    result = 0.0
    cur_a, cur_b = a, b
    for i, wt in enumerate(weights):
        s = ssim_fast(cur_a, cur_b)
        result += wt * math.log(max(s, 1e-10))
        if i < len(weights) - 1:
            nw, nh = cur_a.shape[1] // 2, cur_a.shape[0] // 2
            if nw < 8 or nh < 8:
                break
            cur_a = box_downsample(cur_a, nw, nh)
            cur_b = box_downsample(cur_b, nw, nh)
    return math.exp(result)
