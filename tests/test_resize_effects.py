"""Resize and effects tests (reference fennec_test.go resize/effects suites)."""

import numpy as np
import pytest

import oracles
from conftest import (
    make_noise_image,
    make_solid_image,
    make_striped_image,
    make_test_image,
    make_test_image_with_alpha,
)
from fennec_tpu.ops import (
    adaptive_sharpen,
    box_downsample,
    gaussian_blur,
    lanczos_resize,
    sharpen,
    smart_resize,
    smart_resize_dims,
)


class TestLanczosResize:
    def test_dimensions(self):
        img = make_test_image(100, 60)
        out = lanczos_resize(img, 50, 30)
        assert out.shape == (30, 50, 4)

    def test_same_size_copies(self):
        img = make_test_image(20, 20)
        out = lanczos_resize(img, 20, 20)
        assert out is not img
        np.testing.assert_array_equal(out, img)

    def test_zero_size(self):
        img = make_test_image(10, 10)
        assert lanczos_resize(img, 0, 5).size == 0

    def test_solid_stays_solid(self):
        img = make_solid_image(64, 64, 120, 60, 200)
        out = lanczos_resize(img, 32, 32)
        assert np.all(np.abs(out[..., 0].astype(int) - 120) <= 1)
        assert np.all(np.abs(out[..., 1].astype(int) - 60) <= 1)
        assert np.all(np.abs(out[..., 2].astype(int) - 200) <= 1)
        assert np.all(out[..., 3] == 255)

    def test_downscale_preserves_gradient_direction(self):
        img = make_test_image(128, 64)
        out = lanczos_resize(img, 64, 32)
        # red increases with x in the source; must still do so
        assert out[16, 60, 0] > out[16, 4, 0]

    def test_upscale(self):
        img = make_test_image(16, 16)
        out = lanczos_resize(img, 64, 64)
        assert out.shape == (64, 64, 4)

    def test_alpha_fringing_guard(self):
        # Transparent-black next to opaque-white: premultiplied filtering
        # must not drag white toward black at the seam.
        img = np.zeros((32, 32, 4), dtype=np.uint8)
        img[:, 16:, :3] = 255
        img[:, 16:, 3] = 255  # left half fully transparent black
        out = lanczos_resize(img, 16, 16)
        opaque = out[..., 3] > 128
        assert np.all(out[..., 0][opaque] > 200)


class TestSmartResize:
    def test_never_enlarges_identity_object(self):
        img = make_test_image(50, 40)
        assert smart_resize(img, 100, 100) is img
        assert smart_resize(img, 0, 0) is img

    def test_aspect_ratio_preserved(self):
        # reference fennec_test.go:261-282 — ratio within 0.02
        img = make_test_image(400, 300)
        out = smart_resize(img, 200, 200)
        h, w = out.shape[:2]
        assert w <= 200 and h <= 200
        assert abs(w / h - 400 / 300) < 0.02

    def test_dims_policy(self):
        assert smart_resize_dims(400, 300, 200, 0) == (200, 150)
        assert smart_resize_dims(400, 300, 0, 150) == (200, 150)
        assert smart_resize_dims(100, 100, 200, 200) == (100, 100)
        assert smart_resize_dims(1000, 10, 100, 100) == (100, 1)


class TestBoxDownsample:
    def test_exact_halving(self):
        img = make_noise_image(64, 64, seed=2)
        out = box_downsample(img, 32, 32)
        want = img.reshape(32, 2, 32, 2, 4).astype(np.float64).mean(
            axis=(1, 3))
        np.testing.assert_allclose(
            out.astype(float), np.clip(np.floor(want + 0.5), 0, 255),
            atol=1)


class TestEffects:
    def test_sharpen_noop_identity(self):
        # reference fennec_test.go:632-639 — pointer identity on no-op
        img = make_test_image(32, 32)
        assert sharpen(img, 0) is img
        assert sharpen(img, -1) is img
        assert adaptive_sharpen(img, 0) is img
        assert gaussian_blur(img, 0) is img

    def test_tiny_image_noop(self):
        img = make_test_image(2, 2)
        assert sharpen(img, 0.5) is img
        assert adaptive_sharpen(img, 0.5) is img

    def test_sharpen_increases_edge_contrast(self):
        img = make_striped_image(64, 64)
        out = sharpen(img, 0.8)
        assert out.shape == img.shape
        # Edges get pushed further apart → higher variance.
        assert out[..., 0].astype(float).var() >= \
            img[..., 0].astype(float).var()

    def test_sharpen_preserves_alpha(self):
        img = make_test_image_with_alpha(32, 32)
        out = sharpen(img, 0.5)
        np.testing.assert_array_equal(out[..., 3], img[..., 3])

    def test_adaptive_sharpen_leaves_smooth_areas(self):
        img = make_solid_image(32, 32, 128, 128, 128)
        out = adaptive_sharpen(img, 1.0)
        np.testing.assert_array_equal(out, img)

    def test_adaptive_sharpen_borders_untouched(self):
        img = make_striped_image(32, 32)
        out = adaptive_sharpen(img, 1.0)
        np.testing.assert_array_equal(out[0], img[0])
        np.testing.assert_array_equal(out[-1], img[-1])
        np.testing.assert_array_equal(out[:, 0], img[:, 0])
        np.testing.assert_array_equal(out[:, -1], img[:, -1])

    def test_blur_reduces_variance(self):
        img = make_striped_image(64, 64)
        out = gaussian_blur(img, 2.0)
        assert out[..., 0].astype(float).var() < \
            img[..., 0].astype(float).var()

    def test_blur_preserves_alpha(self):
        img = make_test_image_with_alpha(32, 32)
        out = gaussian_blur(img, 1.5)
        np.testing.assert_array_equal(out[..., 3], img[..., 3])

    def test_blur_oracle_parity(self):
        img = make_noise_image(24, 20, seed=9)
        got = gaussian_blur(img, 2.0)
        want = oracles.gaussian_blur(img, 2.0)
        # device fuses both passes in f32 (no inter-pass quantization):
        # allow ±1 from the pass-rounding oracle.
        assert np.abs(got.astype(int) - want.astype(int)).max() <= 1

    def test_blur_solid_invariant(self):
        img = make_solid_image(40, 40, 77, 130, 10)
        out = gaussian_blur(img, 3.0)
        np.testing.assert_array_equal(out, img)


class TestWeightCache:
    def test_clear_and_thread_safety(self):
        import threading

        from fennec_tpu.ops import resize as rz

        rz.clear_weight_caches()
        assert rz._weight_cache_bytes == 0 and not rz._weight_cache

        # Hammer one geometry from many threads (the compress_batch pool
        # path does exactly this); the byte counter must equal the cache
        # contents afterwards — the lru_cache this replaced was
        # thread-safe and the hand-rolled version must stay so.
        def hit(k):
            rz.box_weights_device(64 + (k % 3), 64, 32, 32)

        threads = [threading.Thread(target=hit, args=(k,))
                   for k in range(16)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        want = sum(np.asarray(wh).nbytes + np.asarray(wv).nbytes
                   for wh, wv in rz._weight_cache.values())
        assert rz._weight_cache_bytes == want
        assert len(rz._weight_cache) == 3

        rz.clear_weight_caches()
        assert rz._weight_cache_bytes == 0 and not rz._weight_cache
