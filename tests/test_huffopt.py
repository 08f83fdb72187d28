"""Per-image optimal Huffman tables: size wins at identical pixels."""

import io

import jax.numpy as jnp
import numpy as np
import pytest

from conftest import make_noise_image, make_solid_image, make_test_image
from fennec_tpu.codecs.huffopt import optimal_spec
from fennec_tpu.codecs.jpeg import (
    decode_jpeg,
    encode_jpeg_from_coefs,
    forward_dct_device,
)

try:
    from PIL import Image as PILImage
    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False


def encode_both(img, quality=60):
    h, w = img.shape[:2]
    coefs = forward_dct_device(jnp.asarray(img, dtype=jnp.float32), True)
    std = encode_jpeg_from_coefs(coefs, w, h, quality, True, optimize=False)
    opt = encode_jpeg_from_coefs(coefs, w, h, quality, True, optimize=True)
    return std, opt


class TestOptimalSpec:
    def test_valid_kraft_inequality(self):
        rng = np.random.default_rng(0)
        freq = rng.integers(0, 1000, 256).astype(np.int64)
        bits, vals = optimal_spec(freq)
        assert len(bits) == 16
        assert sum(bits) == len(vals)
        assert sum(bits) == int((freq > 0).sum())
        # Kraft: strictly decodable prefix code within 16 bits.
        kraft = sum(n * 2.0 ** -(i + 1) for i, n in enumerate(bits))
        assert kraft < 1.0  # strict: the all-ones code stays reserved

    def test_single_symbol(self):
        freq = np.zeros(16, dtype=np.int64)
        freq[5] = 100
        bits, vals = optimal_spec(freq)
        assert vals == [5]
        assert sum(bits) == 1

    def test_skewed_gets_short_codes(self):
        freq = np.ones(256, dtype=np.int64)
        freq[0] = 1_000_000
        bits, vals = optimal_spec(freq)
        assert vals[0] == 0  # most frequent symbol listed first


class TestOptimizedEncoding:
    @pytest.mark.parametrize("maker,seed", [("noise", 3), ("grad", 0),
                                            ("solid", 0)])
    def test_smaller_and_pixel_identical(self, maker, seed):
        img = {"noise": lambda: make_noise_image(100, 80, seed=seed),
               "grad": lambda: make_test_image(160, 120),
               "solid": lambda: make_solid_image(64, 64, 90, 20, 220),
               }[maker]()
        std, opt = encode_both(img)
        assert len(opt) <= len(std)
        np.testing.assert_array_equal(decode_jpeg(std), decode_jpeg(opt))

    @pytest.mark.skipif(not HAVE_PIL, reason="PIL unavailable")
    def test_pil_decodes_optimized(self):
        img = make_test_image(96, 64)
        _, opt = encode_both(img, quality=80)
        std, _ = encode_both(img, quality=80)[0], None
        pil_opt = np.asarray(PILImage.open(io.BytesIO(opt)).convert("RGBA"))
        pil_std = np.asarray(PILImage.open(io.BytesIO(std)).convert("RGBA"))
        # The optimized bitstream carries identical coefficients: PIL must
        # decode both files to the same pixels.
        np.testing.assert_array_equal(pil_opt, pil_std)
        # Our decoder differs from PIL only in chroma-upsampling rounding.
        ours = decode_jpeg(opt)
        d = np.abs(pil_opt[..., :3].astype(int) - ours[..., :3].astype(int))
        assert d.max() <= 8 and d.mean() < 1.5

    def test_engine_uses_optimization_by_default(self):
        import fennec_tpu as fennec
        img = make_test_image(128, 96)
        res_opt = fennec.compress_image(None, img, fennec.Options(
            format=fennec.JPEG))
        res_std = fennec.compress_image(None, img, fennec.Options(
            format=fennec.JPEG, optimize_huffman=False))
        assert res_opt.jpeg_quality == res_std.jpeg_quality
        assert res_opt.ssim == res_std.ssim
        assert res_opt.compressed_size <= res_std.compressed_size


class TestNativeSpecBuilder:
    """The C++ K.2 builder (native/entropy.cpp:fennec_build_optimal_specs)
    must reproduce the Python merge loop exactly — same tie-breaking
    (largest index among equal minima), same 16-bit length limiting, same
    (length, symbol) VALS order."""

    def test_matches_python_randomized(self):
        from fennec_tpu.codecs.huffopt import (
            _specs_from_frequencies_py,
            specs_from_frequencies_batch,
        )
        from fennec_tpu.native import native_available

        if not native_available():
            pytest.skip("native library unavailable")
        rng = np.random.default_rng(7)
        cases = []
        for i in range(60):
            dcf = rng.integers(0, 5000, (2, 16)).astype(np.int64)
            acf = (rng.zipf(1.35, (2, 256))
                   * rng.integers(0, 25)).astype(np.int64)
            if i % 5 == 0:
                acf[1] = 0                     # empty class
            if i % 7 == 0:
                dcf[:] = 0                     # all-empty class pair
            if i % 9 == 0:
                acf[0] = 0
                acf[0, 3] = 1                  # single live symbol
            if i % 11 == 0:
                acf[0] = 1                     # flat tiny frequencies
            cases.append((dcf, acf))
        batch = specs_from_frequencies_batch(
            np.stack([c[0] for c in cases]),
            np.stack([c[1] for c in cases]))
        for (dcf, acf), got in zip(cases, batch):
            want = _specs_from_frequencies_py(dcf, acf)
            for cls in range(2):
                assert list(got[0][cls][0]) == list(want[0][cls][0])
                assert list(got[0][cls][1]) == list(want[0][cls][1])
                assert list(got[1][cls][0]) == list(want[1][cls][0])
                assert list(got[1][cls][1]) == list(want[1][cls][1])


class TestCodeTablesBatch:
    """The vectorized canonical-code table builder must match the
    per-image _code_arrays walk exactly (code += 1 per symbol,
    code <<= 1 per length step, T.81 Annex C)."""

    def test_matches_code_arrays_randomized(self):
        from fennec_tpu.codecs.huffopt import (
            _specs_from_frequencies_py,
            specs_and_tables_batch,
        )
        from fennec_tpu.ops.jpeg_emit import _code_arrays

        rng = np.random.default_rng(13)
        dcfs, acfs = [], []
        for i in range(40):
            dcf = rng.integers(0, 5000, (2, 16)).astype(np.int64)
            acf = (rng.zipf(1.3, (2, 256))
                   * rng.integers(0, 30)).astype(np.int64)
            if i % 5 == 0:
                acf[1] = 0
            if i % 7 == 0:
                dcf[:] = 0
            if i % 9 == 0:
                acf[0] = 0
                acf[0, 250] = 1
            dcfs.append(dcf)
            acfs.append(acf)
        specs, dcp, acp = specs_and_tables_batch(
            np.stack(dcfs), np.stack(acfs))
        assert dcp.shape == (40, 2, 16) and acp.shape == (40, 2, 256)
        for j in range(40):
            want = _specs_from_frequencies_py(dcfs[j], acfs[j])
            for cls in range(2):
                c, ln = _code_arrays(*want[0][cls], 16)
                np.testing.assert_array_equal(dcp[j, cls],
                                              (c << 5) | ln)
                c, ln = _code_arrays(*want[1][cls], 256)
                np.testing.assert_array_equal(acp[j, cls],
                                              (c << 5) | ln)

    def test_fallback_path_matches(self, monkeypatch):
        import fennec_tpu.native as native
        from fennec_tpu.codecs import huffopt

        monkeypatch.setattr(native, "_load_native", lambda: None)
        rng = np.random.default_rng(3)
        dcf = rng.integers(0, 100, (4, 2, 16)).astype(np.int64)
        acf = rng.integers(0, 100, (4, 2, 256)).astype(np.int64)
        specs, dcp, acp = huffopt.specs_and_tables_batch(dcf, acf)
        from fennec_tpu.ops.jpeg_emit import _code_arrays
        for j in range(4):
            for cls in range(2):
                c, ln = _code_arrays(*specs[j][0][cls], 16)
                np.testing.assert_array_equal(dcp[j, cls], (c << 5) | ln)
                c, ln = _code_arrays(*specs[j][1][cls], 256)
                np.testing.assert_array_equal(acp[j, cls], (c << 5) | ln)


def _fibonacci_freqs(n_terms: int) -> np.ndarray:
    """Fibonacci frequencies force a maximally skewed Huffman tree whose
    deepest code length grows with the term count — the classic input
    that overflows the 32-bit codesize bound of T.81 K.2 builders."""
    acf = np.zeros((2, 256), np.int64)
    a, b = 1, 1
    for i in range(n_terms):
        acf[0, i] = a
        a, b = b, a + b
    acf[1, 0] = 1
    return acf


def test_overlong_code_raises_both_paths():
    """Python and C++ builders must agree on the >32-bit error: raise
    ValueError, never clamp into bits[32] (a clamped table is
    Kraft-inconsistent and the K.3 redistribution emits a broken DHT)."""
    from fennec_tpu.codecs.huffopt import (
        _specs_from_frequencies_py,
        specs_from_frequencies_batch,
    )
    from fennec_tpu.native import native_available

    dcf = np.zeros((2, 16), np.int64)
    dcf[:, 0] = 1
    acf = _fibonacci_freqs(70)
    with pytest.raises(ValueError, match="exceeds 32 bits"):
        _specs_from_frequencies_py(dcf, acf)
    if native_available():
        with pytest.raises(ValueError, match="exceeds 32 bits"):
            specs_from_frequencies_batch(dcf[None], acf[None])


def test_deep_but_legal_code_matches_native():
    """Just under the 32-bit bound both builders must still agree
    (the error path must not trigger early)."""
    from fennec_tpu.codecs.huffopt import (
        _specs_from_frequencies_py,
        specs_from_frequencies_batch,
    )
    from fennec_tpu.native import native_available

    if not native_available():
        pytest.skip("native library unavailable")
    dcf = np.zeros((2, 16), np.int64)
    dcf[:, 0] = 1
    acf = _fibonacci_freqs(60)
    got = specs_from_frequencies_batch(dcf[None], acf[None])[0]
    want = _specs_from_frequencies_py(dcf, acf)
    for cls in range(2):
        assert list(got[1][cls][0]) == list(want[1][cls][0])
        assert list(got[1][cls][1]) == list(want[1][cls][1])


def test_optimal_spec_all_zero_frequencies():
    """No coded symbols → empty spec, not an IndexError wraparound."""
    from fennec_tpu.codecs.huffopt import optimal_spec

    bits, vals = optimal_spec(np.zeros(16, np.int64))
    assert bits == [0] * 16
    assert vals == []
