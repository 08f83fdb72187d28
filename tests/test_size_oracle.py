"""Device JPEG size oracle: exact bit-count parity vs the real encoder."""

import jax.numpy as jnp
import numpy as np
import pytest

from conftest import make_noise_image, make_solid_image, make_test_image
from fennec_tpu.codecs.jpeg import (
    assemble_jpeg,
    encode_scan_from_quantized,
    forward_dct_device,
    quantize_coefs_device,
)
from fennec_tpu.engine.targetsize import _JpegSizer, jpeg_quality_search
from fennec_tpu.ops.dct import all_quality_tables
from fennec_tpu.ops.jpeg_size import scan_bits_device


def scan_len_actual(img, quality):
    """Real entropy-coded scan length (bytes, incl. stuffing)."""
    h, w = img.shape[:2]
    coefs = forward_dct_device(jnp.asarray(img, dtype=jnp.float32), True)
    qtabs = all_quality_tables()[quality]
    qc = quantize_coefs_device(coefs, jnp.asarray(qtabs), True)
    qy, qcb, qcr = [np.asarray(c, dtype=np.int32) for c in qc]
    ph, pw = h + (-h) % 16, w + (-w) % 16
    scan = encode_scan_from_quantized(qy, qcb, qcr, ph, pw, True)
    return len(scan), (qy, qcb, qcr, ph, pw)


def count_stuffing(img, quality):
    h, w = img.shape[:2]
    coefs = forward_dct_device(jnp.asarray(img, dtype=jnp.float32), True)
    qtabs = all_quality_tables()[quality]
    qc = quantize_coefs_device(coefs, jnp.asarray(qtabs), True)
    qy, qcb, qcr = [np.asarray(c, dtype=np.int32) for c in qc]
    ph, pw = h + (-h) % 16, w + (-w) % 16
    scan = encode_scan_from_quantized(qy, qcb, qcr, ph, pw, True)
    # stuffed zero bytes follow 0xFF
    stuffed = sum(1 for i in range(len(scan) - 1)
                  if scan[i] == 0xFF and scan[i + 1] == 0x00)
    return stuffed


class TestScanBitsParity:
    @pytest.mark.parametrize("quality", [10, 30, 60, 90])
    @pytest.mark.parametrize("maker,seed", [("noise", 3), ("grad", 0)])
    def test_exact_bits_modulo_stuffing(self, quality, maker, seed):
        img = (make_noise_image(80, 64, seed=seed) if maker == "noise"
               else make_test_image(80, 64))
        actual_len, (qy, qcb, qcr, ph, pw) = scan_len_actual(img, quality)
        stuffed = count_stuffing(img, quality)
        bits = int(scan_bits_device(
            jnp.asarray(qy), jnp.asarray(qcb), jnp.asarray(qcr),
            ph, pw, True))
        predicted = (bits + 7) // 8
        assert predicted == actual_len - stuffed

    def test_solid_image(self):
        img = make_solid_image(32, 32, 120, 40, 200)
        actual_len, (qy, qcb, qcr, ph, pw) = scan_len_actual(img, 75)
        stuffed = count_stuffing(img, 75)
        bits = int(scan_bits_device(
            jnp.asarray(qy), jnp.asarray(qcb), jnp.asarray(qcr),
            ph, pw, True))
        assert (bits + 7) // 8 == actual_len - stuffed


class TestDeviceSizeSearch:
    def test_search_matches_exhaustive(self):
        img = make_noise_image(96, 96, seed=5)
        sizer = _JpegSizer(img)
        target = 4000
        data, q = sizer.search(target, 1, 100)
        assert data is not None
        assert len(data) <= target
        # q must be maximal: q+1 must not fit (allow stuffing slack of
        # a couple bytes in the oracle's favor).
        if q < 100:
            assert len(sizer.encode(q + 1)) > target - 4

    def test_impossible_target(self):
        img = make_noise_image(64, 64, seed=6)
        sizer = _JpegSizer(img)
        data, q = sizer.search(100, 1, 100)  # 100 bytes: impossible
        assert data is None and q == 0

    def test_quality_search_wrapper(self):
        img = make_noise_image(128, 96, seed=7)
        r = jpeg_quality_search(img, 6000)
        assert r is not None
        assert len(r.data) <= 6000
        assert r.ssim > 0


class TestBitsFromHist:
    """bits_std_from_hist must equal the full scan_bits_device pass —
    the histogram paths size emission buffers from it."""

    @pytest.mark.parametrize("seed,h,w", [(0, 48, 48), (1, 64, 80),
                                          (2, 16, 16)])
    def test_matches_scan_bits(self, seed, h, w):
        import jax.numpy as jnp

        from fennec_tpu.ops.jpeg_emit import scan_symbol_hist_device
        from fennec_tpu.ops.jpeg_size import (
            bits_std_from_hist,
            scan_bits_device,
        )

        rng = np.random.default_rng(seed)
        ny = (h // 8) * (w // 8)
        nc = (h // 16) * (w // 16)
        qy = rng.integers(-120, 120, (ny, 64)).astype(np.int32)
        qcb = rng.integers(-25, 25, (nc, 64)).astype(np.int32)
        qcr = rng.integers(-25, 25, (nc, 64)).astype(np.int32)
        # Photo-like sparsity: zero most high-frequency coefficients.
        qy[:, 20:] = np.where(rng.random((ny, 44)) < 0.9, 0, qy[:, 20:])
        full = int(scan_bits_device(jnp.asarray(qy), jnp.asarray(qcb),
                                    jnp.asarray(qcr), h, w, True))
        dcf, acf = scan_symbol_hist_device(
            jnp.asarray(qy), jnp.asarray(qcb), jnp.asarray(qcr), h, w,
            True)
        assert int(bits_std_from_hist(dcf, acf)) == full
