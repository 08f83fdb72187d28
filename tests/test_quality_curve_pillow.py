"""Quality→SSIM curve sanity band vs Pillow's JPEG encoder.

The Go reference's encoder is stdlib image/jpeg; with no Go toolchain
in this image (re-verified round 5: no go/gccgo/tinygo anywhere) the
SSIM/analyzer parity rests on float64 oracles (tests/oracles.py) plus
Pillow codec cross-validation (tests/test_codecs.py).  This suite adds
an independent BEHAVIORAL cross-check of the encode quality semantics:
at matched (quality, subsampling), our encoder's decoded-image SSIM —
measured by the f64 oracle — must track libjpeg's (Pillow) within a
band, and both curves must be monotone in quality.  Byte parity is
explicitly NOT the contract (three different DCT/round pipelines);
the reference's own tests assert SSIM contracts, not bytes
(fennec_test.go:233-259).
"""

import io

import numpy as np
import pytest
from PIL import Image

from conftest import make_test_image
from fennec_tpu.codecs.jpeg import encode_jpeg
from oracles import ssim_fast

QUALITIES = (50, 70, 85, 95)


def _photo(w, h, seed):
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:h, 0:w]
    img = np.empty((h, w, 4), np.uint8)
    base = np.stack([x * 255 / w, y * 255 / h,
                     (x + y) * 255 / (w + h)], axis=-1)
    img[..., :3] = np.clip(base + rng.normal(0, 12, (h, w, 3)), 0, 255)
    img[..., 3] = 255
    return img


def _ssim_ours(img, q):
    decoded = Image.open(io.BytesIO(encode_jpeg(img, q)))
    arr = np.dstack([np.asarray(decoded.convert("RGB"), np.uint8),
                     np.full(img.shape[:2], 255, np.uint8)])
    return ssim_fast(img, arr)


def _ssim_pillow(img, q):
    buf = io.BytesIO()
    Image.fromarray(img[..., :3]).save(buf, "JPEG", quality=q,
                                       subsampling=2)  # 4:2:0
    arr = np.dstack([
        np.asarray(Image.open(buf).convert("RGB"), np.uint8),
        np.full(img.shape[:2], 255, np.uint8)])
    return ssim_fast(img, arr)


@pytest.mark.parametrize("img_fn,seed", [(_photo, 3), (_photo, 9)])
def test_curve_tracks_pillow(img_fn, seed):
    img = img_fn(160, 120, seed)
    ours = [_ssim_ours(img, q) for q in QUALITIES]
    theirs = [_ssim_pillow(img, q) for q in QUALITIES]
    # Same quality scale (both Annex-K scaled by the T.81 50-point
    # rule): the SSIM curves must sit within a 0.02 band of each other
    # at every sampled quality.
    for q, a, b in zip(QUALITIES, ours, theirs):
        assert abs(a - b) <= 0.02, (q, a, b)
    # And both must be monotone non-decreasing in quality.
    assert all(x <= y + 1e-6 for x, y in zip(ours, ours[1:])), ours
    assert all(x <= y + 1e-6 for x, y in zip(theirs, theirs[1:]))


def test_curve_on_structured_image():
    img = make_test_image(160, 120)
    ours = [_ssim_ours(img, q) for q in QUALITIES]
    theirs = [_ssim_pillow(img, q) for q in QUALITIES]
    for q, a, b in zip(QUALITIES, ours, theirs):
        assert abs(a - b) <= 0.02, (q, a, b)
