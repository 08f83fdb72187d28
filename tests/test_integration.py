"""Integration tests over generated fixture files (reference
integration_test.go + testdata_generate_test.go).

Fixtures are deterministic synthetic images generated on first use into
tests/testdata/ (the reference generates its testdata the same way:
gradient.jpg, transparent.png, fewcolors.png, large_photo.jpg,
grayscale.png — testdata_generate_test.go:13-113).
"""

import math
import os
import pathlib

import numpy as np
import pytest

import fennec_tpu as fennec
from fennec_tpu.codecs import decode_image, png as png_codec
from fennec_tpu.codecs.jpeg import encode_jpeg

TESTDATA = pathlib.Path(__file__).parent / "testdata"


def gen_if_missing(path: pathlib.Path, make_bytes):
    if not path.exists():
        TESTDATA.mkdir(exist_ok=True)
        path.write_bytes(make_bytes())
    return str(path)


def gradient_jpg():
    h, w = 300, 400
    y, x = np.mgrid[0:h, 0:w]
    img = np.zeros((h, w, 4), dtype=np.uint8)
    img[..., 0] = (x * 255 // w)
    img[..., 1] = (y * 255 // h)
    img[..., 2] = ((x + y) * 255 // (w + h))
    img[..., 3] = 255
    return encode_jpeg(img, 90)


def transparent_png():
    h = w = 200
    y, x = np.mgrid[0:h, 0:w]
    d = np.sqrt((x - w / 2) ** 2 + (y - h / 2) ** 2)
    img = np.zeros((h, w, 4), dtype=np.uint8)
    img[..., 0] = 220
    img[..., 1] = 60
    img[..., 2] = 60
    # anti-aliased circle edge
    alpha = np.clip((w / 3 - d) * 8, 0, 255)
    img[..., 3] = alpha.astype(np.uint8)
    return png_codec.encode_png_rgba(img)


def fewcolors_png():
    img = np.zeros((120, 160, 4), dtype=np.uint8)
    colors = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 0)]
    for i, (r, g, b) in enumerate(colors):
        img[:, i * 40:(i + 1) * 40] = (r, g, b, 255)
    return png_codec.encode_png_rgba(img)


def large_photo_jpg():
    rng = np.random.default_rng(42)
    h, w = 1080, 1920
    y, x = np.mgrid[0:h, 0:w]
    img = np.zeros((h, w, 4), dtype=np.uint8)
    base = 120 + 60 * np.sin(x / 97.0) + 50 * np.cos(y / 71.0)
    noise = rng.normal(0, 18, (h, w, 3))
    img[..., :3] = np.clip(base[..., None] + noise, 0, 255)
    img[..., 3] = 255
    return encode_jpeg(img, 92)


def grayscale_png():
    g = np.linspace(0, 255, 150 * 200).reshape(150, 200).astype(np.uint8)
    return png_codec.encode_png_gray(g)


@pytest.fixture(scope="module")
def fixtures():
    return {
        "gradient.jpg": gen_if_missing(TESTDATA / "gradient.jpg",
                                       gradient_jpg),
        "transparent.png": gen_if_missing(TESTDATA / "transparent.png",
                                          transparent_png),
        "fewcolors.png": gen_if_missing(TESTDATA / "fewcolors.png",
                                        fewcolors_png),
        "large_photo.jpg": gen_if_missing(TESTDATA / "large_photo.jpg",
                                          large_photo_jpg),
        "grayscale.png": gen_if_missing(TESTDATA / "grayscale.png",
                                        grayscale_png),
    }


class TestFullPipeline:
    def test_gradient_jpeg_balanced(self, fixtures, tmp_path):
        out = str(tmp_path / "g.jpg")
        res = fennec.compress_file(None, fixtures["gradient.jpg"], out)
        assert os.path.exists(out)
        assert res.ssim >= 0.92
        assert res.original_size > 0
        assert res.compressed_size == os.path.getsize(out)

    def test_transparent_keeps_alpha(self, fixtures, tmp_path):
        out = str(tmp_path / "t.png")
        res = fennec.compress_file(None, fixtures["transparent.png"], out)
        assert res.format == fennec.PNG
        decoded = decode_image(open(out, "rb").read())
        assert np.any(decoded[..., 3] < 255)

    def test_fewcolors_palettized_small(self, fixtures, tmp_path):
        out = str(tmp_path / "f.png")
        res = fennec.compress_file(None, fixtures["fewcolors.png"], out)
        assert res.format == fennec.PNG
        # 4-color image → tiny palette PNG
        assert res.compressed_size < 2000

    @pytest.mark.slow
    def test_large_photo_targetsize(self, fixtures, tmp_path):
        out = str(tmp_path / "l.jpg")
        target = 100 * 1024
        res = fennec.compress_file(
            None, fixtures["large_photo.jpg"], out,
            fennec.Options(target_size=target))
        # reference integration bound: within 3× (integration_test.go:111-133)
        assert res.compressed_size <= 3 * target

    def test_grayscale_roundtrip(self, fixtures, tmp_path):
        out = str(tmp_path / "gr.png")
        res = fennec.compress_file(None, fixtures["grayscale.png"], out,
                                   fennec.Options(format=fennec.PNG))
        decoded = decode_image(open(out, "rb").read())
        original = decode_image(open(fixtures["grayscale.png"], "rb").read())
        np.testing.assert_array_equal(decoded, original)

    def test_resize_large_photo(self, fixtures, tmp_path):
        out = str(tmp_path / "small.jpg")
        res = fennec.compress_file(
            None, fixtures["large_photo.jpg"], out,
            fennec.Options(max_width=640, format=fennec.JPEG))
        assert res.final_dimensions == (640, 360)
        ratio = res.final_dimensions[0] / res.final_dimensions[1]
        assert math.isclose(ratio, 1920 / 1080, rel_tol=0.02)

    def test_analyze_fixtures(self, fixtures):
        stats = fennec.analyze(fennec.open_image(fixtures["gradient.jpg"]))
        assert stats.width == 400 and stats.height == 300
        tstats = fennec.analyze(
            fennec.open_image(fixtures["transparent.png"]))
        assert tstats.has_alpha
        gstats = fennec.analyze(
            fennec.open_image(fixtures["grayscale.png"]))
        assert gstats.is_grayscale

    def test_batch_over_fixtures(self, fixtures, tmp_path):
        items = [fennec.BatchItem(src=p, dst=str(tmp_path / f"o{i}.jpg"))
                 for i, p in enumerate([fixtures["gradient.jpg"],
                                        fixtures["fewcolors.png"]])]
        results = fennec.compress_batch(None, items)
        summary = fennec.summarize(results)
        assert summary.succeeded == 2
        assert summary.failed == 0
