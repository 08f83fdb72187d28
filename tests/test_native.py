"""Native C++ codec parity tests vs the pure-Python oracle."""

import numpy as np
import pytest

from conftest import make_noise_image, make_test_image
from fennec_tpu.codecs import entropy_py

try:
    from fennec_tpu.native import build as native_build
    LIB = native_build.load()
except Exception as e:  # pragma: no cover
    LIB = None
    BUILD_ERROR = e


pytestmark = pytest.mark.skipif(LIB is None, reason="native build failed")


def random_coefs(nblocks, seed=0, sparsity=0.8):
    """Realistic sparse quantized coefficients."""
    rng = np.random.default_rng(seed)
    c = rng.integers(-200, 200, size=(nblocks, 64)).astype(np.int32)
    mask = rng.random((nblocks, 64)) < sparsity
    c[mask] = 0
    c[:, 0] = rng.integers(-500, 500, size=nblocks)  # DC
    return c


def make_comps(seed=0, mcus=(3, 2), subsample=True):
    mx, my = mcus
    if subsample:
        y = entropy_py.ComponentSpec(random_coefs(mx * my * 4, seed),
                                     mx * 2, my * 2, 2, 2, chroma=False)
        cb = entropy_py.ComponentSpec(random_coefs(mx * my, seed + 1),
                                      mx, my, 1, 1, chroma=True)
        cr = entropy_py.ComponentSpec(random_coefs(mx * my, seed + 2),
                                      mx, my, 1, 1, chroma=True)
        return [y, cb, cr]
    comps = []
    for i, chroma in enumerate([False, True, True]):
        comps.append(entropy_py.ComponentSpec(
            random_coefs(mx * my, seed + i), mx, my, 1, 1, chroma=chroma))
    return comps


def decode_specs_from(comps):
    from fennec_tpu.codecs import tables as t
    out = []
    for c in comps:
        if c.chroma:
            dc = (t.DC_CHROMA_BITS, t.DC_CHROMA_VALS)
            ac = (t.AC_CHROMA_BITS, t.AC_CHROMA_VALS)
        else:
            dc = (t.DC_LUMA_BITS, t.DC_LUMA_VALS)
            ac = (t.AC_LUMA_BITS, t.AC_LUMA_VALS)
        out.append(entropy_py.DecodeComponentSpec(c.bw, c.bh, c.h, c.v,
                                                  dc, ac))
    return out


class TestEncodeParity:
    @pytest.mark.parametrize("subsample", [True, False])
    @pytest.mark.parametrize("seed", [0, 7, 42])
    def test_bitstream_identical_to_python(self, subsample, seed):
        comps = make_comps(seed=seed, subsample=subsample)
        py = entropy_py.encode_scan(comps)
        cc = LIB.encode_scan(comps)
        assert cc == py

    def test_restart_interval_identical(self):
        comps = make_comps(seed=3, mcus=(4, 3))
        py = entropy_py.encode_scan(comps, restart_interval=2)
        cc = LIB.encode_scan(comps, restart_interval=2)
        assert cc == py

    def test_grayscale(self):
        y = entropy_py.ComponentSpec(random_coefs(6, 9), 3, 2, 1, 1,
                                     chroma=False)
        assert LIB.encode_scan([y]) == entropy_py.encode_scan([y])


class TestDecodeParity:
    @pytest.mark.parametrize("subsample", [True, False])
    def test_roundtrip(self, subsample):
        comps = make_comps(seed=11, subsample=subsample)
        scan = entropy_py.encode_scan(comps)
        specs = decode_specs_from(comps)
        got = LIB.decode_scan(scan, 0, specs)
        want, _ = entropy_py.decode_scan(scan, 0, specs)
        for g, w, c in zip(got, want, comps):
            np.testing.assert_array_equal(g, w)
            np.testing.assert_array_equal(g, c.qcoefs.astype(np.int16))

    def test_restart_roundtrip(self):
        comps = make_comps(seed=13, mcus=(5, 4))
        scan = entropy_py.encode_scan(comps, restart_interval=3)
        specs = decode_specs_from(comps)
        got = LIB.decode_scan(scan, 0, specs, restart_interval=3)
        for g, c in zip(got, comps):
            np.testing.assert_array_equal(g, c.qcoefs.astype(np.int16))

    def test_corrupt_no_crash(self):
        # Truncated garbage must never crash: either a clean ValueError or
        # zero-filled trailing blocks (standard decoder zero-fill behavior).
        comps = make_comps(seed=1)
        scan = entropy_py.encode_scan(comps)
        bad_specs = decode_specs_from(make_comps(seed=1, mcus=(30, 30)))
        try:
            out = LIB.decode_scan(scan[:10], 0, bad_specs)
            assert all(o.shape == (s.bw * s.bh, 64)
                       for o, s in zip(out, bad_specs))
        except ValueError:
            pass


class TestPNGFilters:
    @pytest.mark.parametrize("bpp", [1, 3, 4])
    def test_filter_unfilter_roundtrip(self, bpp):
        rng = np.random.default_rng(5)
        data = rng.integers(0, 256, size=(20, 33 * bpp), dtype=np.uint8)
        raw = LIB.png_filter(data, bpp)
        out = LIB.png_unfilter(raw, 20, 33 * bpp, bpp)
        np.testing.assert_array_equal(out, data)

    def test_filter_matches_python(self):
        from fennec_tpu.native import _png_filter_py
        rng = np.random.default_rng(6)
        data = rng.integers(0, 256, size=(10, 40), dtype=np.uint8)
        assert LIB.png_filter(data, 4) == _png_filter_py(data, 4, True)

    def test_unfilter_matches_python(self):
        from fennec_tpu.native import _png_unfilter_py
        rng = np.random.default_rng(7)
        data = rng.integers(0, 256, size=(12, 24), dtype=np.uint8)
        raw = LIB.png_filter(data, 3)
        np.testing.assert_array_equal(
            LIB.png_unfilter(raw, 12, 24, 3),
            _png_unfilter_py(raw, 12, 24, 3))

    def test_bad_filter_type(self):
        raw = b"\x09" + b"\x00" * 8
        with pytest.raises(ValueError):
            LIB.png_unfilter(raw, 1, 8, 4)


class TestNativeInPipeline:
    def test_jpeg_roundtrip_via_native(self, monkeypatch):
        import fennec_tpu.native as native_mod
        monkeypatch.setattr(native_mod, "_lib", LIB)
        monkeypatch.setattr(native_mod, "_lib_tried", True)
        from fennec_tpu.codecs.jpeg import decode_jpeg, encode_jpeg
        from fennec_tpu.ops import ssim
        img = make_test_image(70, 54)
        data = encode_jpeg(img, 90)
        out = decode_jpeg(data)
        assert ssim(img, out) > 0.95

    def test_native_and_python_jpeg_bytes_identical(self, monkeypatch):
        import fennec_tpu.native as native_mod
        from fennec_tpu.codecs.jpeg import encode_jpeg
        img = make_noise_image(48, 40, seed=8)
        monkeypatch.setattr(native_mod, "_lib", None)
        monkeypatch.setattr(native_mod, "_lib_tried", True)
        py_bytes = encode_jpeg(img, 85)
        monkeypatch.setattr(native_mod, "_lib", LIB)
        cc_bytes = encode_jpeg(img, 85)
        assert py_bytes == cc_bytes
