"""Tests for the pixel substrate (conversion, geometry, format analysis)."""

import numpy as np
import pytest

from conftest import (
    make_solid_image,
    make_test_image,
    make_test_image_with_alpha,
)
from fennec_tpu import image as fimage
from fennec_tpu.types import EmptyImageError, Format, NilImageError


class TestToNRGBA:
    def test_copy_semantics(self):
        img = make_test_image(8, 8)
        out = fimage.to_nrgba(img)
        assert out is not img
        np.testing.assert_array_equal(out, img)

    def test_ref_no_copy(self):
        img = make_test_image(8, 8)
        assert fimage.to_nrgba_ref(img) is img

    def test_gray_input(self):
        gray = np.full((4, 6), 99, dtype=np.uint8)
        out = fimage.to_nrgba_ref(gray)
        assert out.shape == (4, 6, 4)
        assert np.all(out[..., 0] == 99)
        assert np.all(out[..., 1] == 99)
        assert np.all(out[..., 3] == 255)

    def test_rgb_input(self):
        rgb = np.zeros((3, 5, 3), dtype=np.uint8)
        rgb[..., 0] = 7
        out = fimage.to_nrgba_ref(rgb)
        assert out.shape == (3, 5, 4)
        assert np.all(out[..., 3] == 255)

    def test_float_input(self):
        f = np.ones((2, 2, 4), dtype=np.float32) * 0.5
        out = fimage.to_nrgba_ref(f)
        assert out.dtype == np.uint8
        assert np.all(out == 128)

    def test_nil_raises(self):
        with pytest.raises(NilImageError):
            fimage.to_nrgba_ref(None)

    def test_validate_empty(self):
        with pytest.raises(EmptyImageError):
            fimage.validate_image(np.zeros((0, 5, 4), dtype=np.uint8))


class TestPredicates:
    def test_opaque(self):
        assert fimage.is_opaque(make_test_image(8, 8))
        assert not fimage.is_opaque(make_test_image_with_alpha(8, 8))

    def test_grayscale(self):
        g = make_solid_image(8, 8, 40, 40, 40)
        assert fimage.is_grayscale(g)
        assert not fimage.is_grayscale(make_test_image(8, 8))

    def test_to_gray(self):
        g = make_solid_image(4, 4, 120, 120, 120)
        out = fimage.to_gray(g)
        assert out.shape == (4, 4)
        assert np.all(out == 120)


class TestAnalyzeFormat:
    def test_alpha_goes_png(self):
        assert fimage.analyze_format(
            make_test_image_with_alpha(64, 64)) == Format.PNG

    def test_few_colors_goes_png(self):
        assert fimage.analyze_format(
            make_solid_image(64, 64, 10, 20, 30)) == Format.PNG

    def test_many_colors_goes_jpeg(self):
        rng = np.random.default_rng(1)
        img = rng.integers(0, 256, size=(64, 64, 4), dtype=np.uint8)
        img[..., 3] = 255
        assert fimage.analyze_format(img) == Format.JPEG


class TestGeometry:
    def test_rotate90(self):
        img = make_test_image(6, 4)  # w=6, h=4
        out = fimage.rotate90_cw(img)
        assert out.shape == (6, 4, 4)
        # top-left of source ends up at top-right of rotated image
        np.testing.assert_array_equal(out[0, -1], img[0, 0])

    def test_rotate180_involution(self):
        img = make_test_image(5, 7)
        np.testing.assert_array_equal(
            fimage.rotate180(fimage.rotate180(img)), img)

    def test_rotate270(self):
        img = make_test_image(6, 4)
        out = fimage.rotate270_cw(img)
        assert out.shape == (6, 4, 4)
        np.testing.assert_array_equal(out[-1, 0], img[0, 0])

    def test_flips(self):
        img = make_test_image(6, 4)
        np.testing.assert_array_equal(
            fimage.flip_horizontal(img), img[:, ::-1])
        np.testing.assert_array_equal(
            fimage.flip_vertical(img), img[::-1])

    def test_rot90_four_times_identity(self):
        img = make_test_image(6, 4)
        out = img
        for _ in range(4):
            out = fimage.rotate90_cw(out)
        np.testing.assert_array_equal(out, img)


class TestClamp:
    @pytest.mark.parametrize("x,expected", [
        (-5.0, 0), (0.0, 0), (0.4, 0), (0.5, 1), (254.4, 254),
        (254.5, 255), (255.0, 255), (300.0, 255),
    ])
    def test_clamp_f(self, x, expected):
        assert fimage.clamp_f(x) == expected

    def test_clamp_u8_vector(self):
        arr = np.array([-1.0, 0.49, 0.5, 255.2])
        np.testing.assert_array_equal(
            fimage.clamp_u8(arr), np.array([0, 0, 1, 255], dtype=np.uint8))
