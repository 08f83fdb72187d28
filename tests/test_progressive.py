"""Progressive JPEG decode tests (cross-validated against PIL encodes)."""

import io

import numpy as np
import pytest

from conftest import make_noise_image, make_striped_image, make_test_image
from fennec_tpu.codecs.jpeg import decode_jpeg, is_progressive_jpeg
from fennec_tpu.ops import ssim

try:
    from PIL import Image as PILImage
    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False

pytestmark = pytest.mark.skipif(not HAVE_PIL, reason="PIL unavailable")


def pil_progressive(img: np.ndarray, quality=90, subsampling=2,
                    gray=False) -> bytes:
    buf = io.BytesIO()
    if gray:
        PILImage.fromarray(img[:, :, 0], "L").save(
            buf, "JPEG", quality=quality, progressive=True)
    else:
        PILImage.fromarray(img[:, :, :3], "RGB").save(
            buf, "JPEG", quality=quality, progressive=True,
            subsampling=subsampling)
    return buf.getvalue()


def pil_decode(data: bytes) -> np.ndarray:
    return np.asarray(PILImage.open(io.BytesIO(data)).convert("RGBA"))


class TestProgressiveDetection:
    def test_detects_progressive(self):
        img = make_test_image(48, 32)
        assert is_progressive_jpeg(pil_progressive(img))

    def test_baseline_not_progressive(self):
        from fennec_tpu.codecs.jpeg import encode_jpeg
        img = make_test_image(48, 32)
        assert not is_progressive_jpeg(encode_jpeg(img, 90))


class TestProgressiveDecode:
    @pytest.mark.parametrize("subsampling", [0, 2])
    def test_matches_pil_decode(self, subsampling):
        img = make_test_image(96, 64)
        data = pil_progressive(img, quality=90, subsampling=subsampling)
        ours = decode_jpeg(data)
        pil = pil_decode(data)
        assert ours.shape == pil.shape
        # Different chroma upsampling; compare perceptually + luminance.
        assert ssim(ours, pil) > 0.97
        assert np.abs(ours[..., :3].astype(int)
                      - pil[..., :3].astype(int)).mean() < 4

    def test_odd_dimensions(self):
        img = make_noise_image(53, 37, seed=5)
        data = pil_progressive(img, quality=92)
        ours = decode_jpeg(data)
        assert ours.shape == (37, 53, 4)
        assert ssim(ours, pil_decode(data)) > 0.95

    def test_grayscale_progressive(self):
        img = make_test_image(40, 40)
        data = pil_progressive(img, gray=True)
        ours = decode_jpeg(data)
        pil = pil_decode(data)
        assert np.abs(ours[..., 0].astype(int)
                      - pil[..., 0].astype(int)).mean() < 2

    def test_low_quality(self):
        img = make_striped_image(64, 64)
        data = pil_progressive(img, quality=30)
        ours = decode_jpeg(data)
        assert ssim(ours, pil_decode(data)) > 0.9

    def test_via_public_api(self):
        import fennec_tpu as fennec
        img = make_noise_image(80, 60, seed=9)
        data = pil_progressive(img, quality=95)
        res = fennec.compress_bytes(None, data, fennec.Options(
            format=fennec.JPEG))
        assert res.compressed_size > 0


class TestNativeProgressiveParity:
    """The C++ scan decoder must produce bit-identical coefficients to the
    pure-Python oracle on every scan of real progressive files."""

    def _decode_both(self, data):
        import fennec_tpu.native as native
        from fennec_tpu.codecs.progressive import ProgressiveDecoder

        if not native.native_available():
            pytest.skip("native library unavailable")
        fast = ProgressiveDecoder(data).decode()
        orig = native.jpeg_decode_progressive_scan
        native.jpeg_decode_progressive_scan = \
            lambda *a, **k: None  # force the Python path
        try:
            slow = ProgressiveDecoder(data).decode()
        finally:
            native.jpeg_decode_progressive_scan = orig
        return fast, slow

    @pytest.mark.parametrize("quality,subsampling",
                             [(90, 2), (90, 0), (35, 2), (97, 0)])
    def test_coefficients_identical(self, quality, subsampling):
        img = make_noise_image(70, 46, seed=quality)
        data = pil_progressive(img, quality=quality,
                               subsampling=subsampling)
        fast, slow = self._decode_both(data)
        for a, b in zip(fast.coefs, slow.coefs):
            np.testing.assert_array_equal(a, b)

    def test_grayscale_identical(self):
        img = make_test_image(41, 33)
        data = pil_progressive(img, gray=True)
        fast, slow = self._decode_both(data)
        np.testing.assert_array_equal(fast.coefs[0], slow.coefs[0])

    def test_restart_markers_identical(self):
        # PIL doesn't emit DRI for progressive; build one by inserting a
        # restart interval via re-encode when supported, else skip.
        img = make_striped_image(64, 48)
        buf = io.BytesIO()
        PILImage.fromarray(img[:, :, :3], "RGB").save(
            buf, "JPEG", quality=85, progressive=True, restart_marker_blocks=4)
        data = buf.getvalue()
        if b"\xff\xdd" not in data:
            pytest.skip("PIL build lacks progressive restart support")
        fast, slow = self._decode_both(data)
        for a, b in zip(fast.coefs, slow.coefs):
            np.testing.assert_array_equal(a, b)
