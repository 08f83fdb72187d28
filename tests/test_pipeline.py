"""End-to-end pipeline tests: preset contracts, target-size bounds,
cancellation, format selection (reference fennec_test.go:233-417)."""

import numpy as np
import pytest

import fennec_tpu as fennec
from conftest import (
    make_noise_image,
    make_solid_image,
    make_test_image,
    make_test_image_with_alpha,
)
from fennec_tpu.codecs import decode_image, sniff_format


def photo_image(w=320, h=240, seed=0):
    """Smooth photographic-looking image: gradient + low-freq noise."""
    rng = np.random.default_rng(seed)
    base = make_test_image(w, h).astype(np.float64)
    noise = rng.normal(0, 12, (h // 8 + 1, w // 8 + 1, 3))
    noise = np.kron(noise, np.ones((8, 8, 1)))[:h, :w]
    img = base.copy()
    img[..., :3] = np.clip(base[..., :3] + noise, 0, 255)
    return img.astype(np.uint8)


class TestPresetContracts:
    """Every preset's result SSIM ≥ target − 0.02, monotone across presets
    (reference fennec_test.go:233-259)."""

    @pytest.mark.parametrize("quality", [
        fennec.ULTRA, fennec.HIGH, fennec.BALANCED,
        fennec.AGGRESSIVE, fennec.MAXIMUM,
    ])
    def test_preset_meets_target(self, quality):
        img = photo_image()
        opts = fennec.Options(quality=quality, format=fennec.JPEG)
        res = fennec.compress_image(None, img, opts)
        assert res.ssim >= quality.target_ssim() - 0.02
        assert res.format == fennec.JPEG
        assert res.jpeg_quality >= 1
        # Verify the reported SSIM is honest: recompute from the bytes.
        decoded = decode_image(res.compressed_data)
        actual = fennec.ssim_fast(img, decoded)
        assert abs(actual - res.ssim) < 0.01

    def test_sizes_monotone_with_preset(self):
        img = photo_image()
        sizes = []
        for q in (fennec.ULTRA, fennec.BALANCED, fennec.MAXIMUM):
            res = fennec.compress_image(
                None, img, fennec.Options(quality=q, format=fennec.JPEG))
            sizes.append(res.compressed_size)
        assert sizes[0] >= sizes[1] >= sizes[2]

    def test_custom_target_ssim_override(self):
        img = photo_image()
        res = fennec.compress_image(None, img, fennec.Options(
            format=fennec.JPEG, target_ssim=0.98))
        assert res.ssim >= 0.96

    def test_lossless_png(self):
        img = make_test_image(64, 64)
        res = fennec.compress_image(None, img, fennec.Options(
            quality=fennec.LOSSLESS, format=fennec.PNG))
        assert res.format == fennec.PNG
        assert res.ssim == 1.0
        np.testing.assert_array_equal(decode_image(res.compressed_data), img)


class TestFormatSelection:
    def test_alpha_selects_png(self):
        img = make_test_image_with_alpha(64, 64)
        res = fennec.compress_image(None, img, fennec.Options())
        assert res.format == fennec.PNG

    def test_photo_selects_jpeg(self):
        img = make_noise_image(128, 128, seed=2)
        res = fennec.compress_image(None, img, fennec.Options())
        assert res.format == fennec.JPEG

    def test_few_colors_selects_png(self):
        img = make_solid_image(64, 64, 200, 30, 90)
        res = fennec.compress_image(None, img, fennec.Options())
        assert res.format == fennec.PNG
        # Palettized solid image should be tiny.
        assert res.compressed_size < 500


class TestResize:
    def test_max_width(self):
        img = make_test_image(400, 300)
        res = fennec.compress_image(None, img, fennec.Options(
            max_width=200, format=fennec.JPEG))
        assert res.final_dimensions == (200, 150)
        assert res.original_dimensions == (400, 300)

    def test_aspect_preserved(self):
        img = make_test_image(400, 300)
        res = fennec.compress_image(None, img, fennec.Options(
            max_width=123, max_height=456, format=fennec.JPEG))
        w, h = res.final_dimensions
        assert w <= 123 and h <= 456
        assert abs(w / h - 4 / 3) < 0.02


class TestTargetSize:
    def test_overshoot_bound(self):
        # reference fennec_test.go:284-298 — within 2× of target
        img = photo_image(320, 240, seed=5)
        target = 8000
        res = fennec.compress_image(None, img, fennec.Options(
            target_size=target))
        assert res.compressed_size <= 2 * target
        assert len(res.compressed_data) == res.compressed_size

    def test_small_target_triggers_scaling(self):
        img = make_noise_image(256, 256, seed=6)
        res = fennec.compress_image(None, img, fennec.Options(
            target_size=3000))
        assert res.compressed_size <= 6000
        w, h = res.final_dimensions
        assert w <= 256 and h <= 256

    def test_generous_target_keeps_dimensions(self):
        img = photo_image(160, 120)
        res = fennec.compress_image(None, img, fennec.Options(
            target_size=100_000))
        assert res.final_dimensions == (160, 120)
        assert res.compressed_size <= 100_000

    def test_png_format_target(self):
        img = make_test_image_with_alpha(96, 96)
        res = fennec.compress_image(None, img, fennec.Options(
            target_size=30_000, format=fennec.PNG))
        assert res.format == fennec.PNG


class TestSingleImageDeviceEmission:
    def test_byte_identical_to_host_encoder(self):
        """compress_image with device_entropy must reproduce the host
        encoder byte for byte, with and without optimal Huffman."""
        import fennec_tpu as fennec
        from conftest import make_noise_image

        img = make_noise_image(80, 64, seed=11)
        for optimize in (True, False):
            a = fennec.compress_image(None, img, fennec.Options(
                format=fennec.JPEG, optimize_huffman=optimize,
                device_entropy=True))
            b = fennec.compress_image(None, img, fennec.Options(
                format=fennec.JPEG, optimize_huffman=optimize,
                device_entropy=False))
            assert a.compressed_data == b.compressed_data
            assert a.jpeg_quality == b.jpeg_quality


class TestErrors:
    def test_nil_image(self):
        with pytest.raises(fennec.NilImageError):
            fennec.compress_image(None, None, fennec.Options())

    def test_empty_image(self):
        with pytest.raises(fennec.EmptyImageError):
            fennec.compress_image(
                None, np.zeros((0, 4, 4), dtype=np.uint8), fennec.Options())

    def test_invalid_options(self):
        with pytest.raises(fennec.ValidationError):
            fennec.compress_image(None, make_test_image(8, 8),
                                  fennec.Options(target_ssim=2.0))


class TestCancellation:
    def test_pre_canceled_context(self):
        ctx = fennec.Context.background().with_cancel()
        ctx.cancel()
        with pytest.raises(fennec.CanceledError):
            fennec.compress_image(None if False else ctx,
                                  make_test_image(32, 32), fennec.Options())

    def test_progress_abort(self):
        calls = []

        def on_progress(stage, pct):
            calls.append((stage, pct))
            if len(calls) >= 2:
                return fennec.CanceledError("user abort")
            return None

        with pytest.raises(fennec.CanceledError):
            fennec.compress_image(None, make_test_image(64, 64),
                                  fennec.Options(on_progress=on_progress))
        assert len(calls) == 2

    def test_progress_stages_reported(self):
        stages = []

        def on_progress(stage, pct):
            stages.append(stage)
            return None

        fennec.compress_image(None, photo_image(64, 64),
                              fennec.Options(format=fennec.JPEG,
                                             on_progress=on_progress))
        assert fennec.ProgressStage.RESIZING in stages
        assert fennec.ProgressStage.COMPRESSING in stages


class TestCompressBytes:
    def test_round_trip(self):
        img = photo_image(120, 90)
        from fennec_tpu.codecs import png as png_codec
        src_bytes = png_codec.encode_png_rgba(img)
        res = fennec.compress_bytes(None, src_bytes, fennec.Options(
            format=fennec.JPEG))
        assert sniff_format(res.bytes()) == "jpeg"
        assert res.ssim > 0.9

    def test_invalid_bytes(self):
        with pytest.raises(fennec.UnsupportedFormatError):
            fennec.compress_bytes(None, b"not an image", fennec.Options())
