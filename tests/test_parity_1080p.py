"""BASELINE config 1: SSIMFast parity on a 1920×1080 pair (<1e-4)."""

import numpy as np
import pytest

import oracles
from conftest import make_noise_image
from fennec_tpu.ops import ssim_fast


@pytest.mark.slow
def test_ssim_fast_1080p_parity():
    rng = np.random.default_rng(17)
    h, w = 1080, 1920
    y, x = np.mgrid[0:h, 0:w]
    a = np.zeros((h, w, 4), dtype=np.uint8)
    a[..., 0] = (120 + 60 * np.sin(x / 37.0)
                 + rng.normal(0, 10, (h, w))).clip(0, 255)
    a[..., 1] = (110 + 60 * np.cos(y / 53.0)
                 + rng.normal(0, 10, (h, w))).clip(0, 255)
    a[..., 2] = ((x + y) / 12 + rng.normal(0, 10, (h, w))).clip(0, 255)
    a[..., 3] = 255
    b = a.copy()
    b[..., :3] = np.clip(
        a[..., :3].astype(int) + rng.integers(-14, 15, (h, w, 3)),
        0, 255).astype(np.uint8)

    got = ssim_fast(a, b)
    want = oracles.ssim_fast(a, b)
    assert got == pytest.approx(want, abs=1e-4)
    assert 0.3 < got < 0.9999
