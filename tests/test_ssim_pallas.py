"""Pallas SSIM kernel parity vs the jnp path (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from conftest import make_noise_image, make_test_image
from fennec_tpu.ops.color import luminance_device
from fennec_tpu.ops.ssim import windowed_ssim_device
from fennec_tpu.ops.ssim_pallas import HAVE_PALLAS, batched_ssim_pallas

pytestmark = pytest.mark.skipif(not HAVE_PALLAS,
                                reason="pallas unavailable")


def lum_batch(images):
    arr = jnp.asarray(np.stack(images), dtype=jnp.float32)
    return luminance_device(arr)


class TestPallasParity:
    @pytest.mark.parametrize("shape", [(32, 32), (64, 48), (130, 100)])
    def test_matches_jnp(self, shape):
        h, w = shape
        a = [make_noise_image(w, h, seed=i) for i in range(3)]
        b = [np.clip(x.astype(int) + (i + 1) * 5, 0, 255).astype(np.uint8)
             for i, x in enumerate(a)]
        la, lb = lum_batch(a), lum_batch(b)
        got = np.asarray(batched_ssim_pallas(la, lb, True))
        want = np.asarray([windowed_ssim_device(la[i], lb[i])
                           for i in range(3)])
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_identical_is_one(self):
        la = lum_batch([make_test_image(40, 40)])
        got = np.asarray(batched_ssim_pallas(la, la, True))
        np.testing.assert_allclose(got, 1.0, atol=1e-5)
