"""Edge-case robustness: tiny images, extreme dims, degenerate inputs."""

import numpy as np
import pytest

import fennec_tpu as fennec
from conftest import make_noise_image, make_solid_image, make_test_image
from fennec_tpu.codecs import decode_image
from fennec_tpu.codecs.jpeg import decode_jpeg, encode_jpeg
from fennec_tpu.codecs.png import decode_png, encode_png_rgba


class TestTinyImages:
    @pytest.mark.parametrize("w,h", [(1, 1), (2, 3), (7, 7), (8, 8),
                                     (9, 9), (15, 17)])
    def test_jpeg_roundtrip(self, w, h):
        img = make_noise_image(w, h, seed=w * 100 + h)
        out = decode_jpeg(encode_jpeg(img, 90))
        assert out.shape == (h, w, 4)

    @pytest.mark.parametrize("w,h", [(1, 1), (3, 2), (8, 8)])
    def test_png_roundtrip(self, w, h):
        img = make_noise_image(w, h, seed=w * 10 + h)
        np.testing.assert_array_equal(decode_png(encode_png_rgba(img)), img)

    @pytest.mark.parametrize("w,h", [(1, 1), (4, 4), (8, 8), (9, 9)])
    def test_full_pipeline_jpeg(self, w, h):
        img = make_solid_image(w, h, 100, 140, 60)
        res = fennec.compress_image(None, img, fennec.Options(
            format=fennec.JPEG))
        assert res.compressed_size > 0
        out = decode_image(res.compressed_data)
        assert out.shape == (h, w, 4)

    def test_full_pipeline_auto_tiny(self):
        img = make_test_image(5, 5)
        res = fennec.compress_image(None, img, fennec.Options())
        assert res.compressed_size > 0

    def test_ssim_tiny_pairs(self):
        for w, h in [(1, 1), (4, 3), (8, 8), (9, 8)]:
            a = make_noise_image(w, h, seed=1)
            assert fennec.ssim(a, a) == pytest.approx(1.0, abs=1e-5)

    def test_extreme_aspect(self):
        img = make_test_image(300, 2)
        res = fennec.compress_image(None, img, fennec.Options(
            format=fennec.JPEG))
        out = decode_image(res.compressed_data)
        assert out.shape == (2, 300, 4)

    def test_target_size_tiny_image(self):
        img = make_solid_image(16, 16, 9, 9, 9)
        res = fennec.compress_image(None, img, fennec.Options(
            target_size=500))
        assert res.compressed_size <= 1000

    def test_resize_to_one_pixel(self):
        img = make_test_image(64, 64)
        out = fennec.lanczos_resize(img, 1, 1)
        assert out.shape == (1, 1, 4)

    def test_effects_on_minimum_size(self):
        img = make_test_image(3, 3)
        assert fennec.sharpen(img, 0.5).shape == (3, 3, 4)
        assert fennec.gaussian_blur(img, 1.0).shape == (3, 3, 4)


class TestDegenerateData:
    def test_truncated_jpeg(self):
        img = make_test_image(32, 32)
        data = encode_jpeg(img, 80)
        for cut in (3, 20, len(data) // 2):
            try:
                decode_jpeg(data[:cut])
            except (ValueError, fennec.UnsupportedFormatError,
                    fennec.FennecError):
                pass  # clean error is fine; crash is not

    def test_truncated_png(self):
        img = make_test_image(16, 16)
        data = encode_png_rgba(img)
        for cut in (4, 20, len(data) - 8):
            try:
                decode_png(data[:cut])
            except Exception as e:
                assert not isinstance(e, (SystemError, MemoryError))

    def test_all_black_all_white(self):
        for v in (0, 255):
            img = make_solid_image(64, 64, v, v, v)
            res = fennec.compress_image(None, img, fennec.Options(
                format=fennec.JPEG))
            out = decode_image(res.compressed_data)
            assert abs(int(out[..., 0].mean()) - v) <= 3

    def test_analyze_one_pixel(self):
        stats = fennec.analyze(make_solid_image(1, 1, 50, 50, 50))
        assert stats.width == 1 and stats.height == 1
