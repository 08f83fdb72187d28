"""All-device JPEG→JPEG batch fast path: equivalence with the pixel path."""

import numpy as np
import pytest

import fennec_tpu as fennec
from conftest import make_noise_image, make_test_image
from fennec_tpu.codecs.jpeg import encode_jpeg
from fennec_tpu.codecs.png import encode_png_rgba
from fennec_tpu.engine.batched import compress_jpeg_bytes_batched


def jpeg_bytes(w, h, seed, quality=92):
    return encode_jpeg(make_noise_image(w, h, seed=seed), quality)


class TestQualification:
    def test_rejects_png(self):
        data = [encode_png_rgba(make_test_image(32, 32))]
        assert compress_jpeg_bytes_batched(
            None, data, fennec.Options(format=fennec.JPEG)) is None

    def test_rejects_auto_format(self):
        assert compress_jpeg_bytes_batched(
            None, [jpeg_bytes(32, 32, 1)], fennec.Options()) is None

    def test_resize_supported(self):
        out = compress_jpeg_bytes_batched(
            None, [jpeg_bytes(32, 32, 1)],
            fennec.Options(format=fennec.JPEG, max_width=16))
        assert out is not None
        assert out[0].final_dimensions == (16, 16)
        assert out[0].original_dimensions == (32, 32)

    def test_rejects_mixed_dims(self):
        datas = [jpeg_bytes(32, 32, 1), jpeg_bytes(48, 32, 2)]
        assert compress_jpeg_bytes_batched(
            None, datas, fennec.Options(format=fennec.JPEG)) is None

    def test_rejects_grayscale_jpeg(self):
        try:
            from PIL import Image as PILImage
        except ImportError:
            pytest.skip("PIL unavailable")
        import io
        buf = io.BytesIO()
        g = np.asarray(make_test_image(32, 32))[:, :, 0]
        PILImage.fromarray(g, "L").save(buf, "JPEG")
        assert compress_jpeg_bytes_batched(
            None, [buf.getvalue()],
            fennec.Options(format=fennec.JPEG)) is None


class TestEquivalence:
    """The two paths fuse differently in XLA, so float rounding can move a
    handful of coefficients by ±1 — assert the semantic contract (same
    quality decision, same SSIM, near-identical pixels and sizes), not
    byte equality."""

    def test_matches_pixel_path(self):
        from fennec_tpu.codecs import decode_image
        datas = [jpeg_bytes(64, 48, s) for s in range(5)]
        opts = fennec.Options(format=fennec.JPEG)
        fast = compress_jpeg_bytes_batched(None, datas, opts)
        assert fast is not None
        for data, got in zip(datas, fast):
            want = fennec.compress_bytes(None, data, fennec.Options(
                format=fennec.JPEG))
            assert got.jpeg_quality == want.jpeg_quality
            assert got.ssim == pytest.approx(want.ssim, abs=1e-5)
            assert abs(got.compressed_size - want.compressed_size) <= 16
            a = decode_image(got.compressed_data).astype(int)
            b = decode_image(want.compressed_data).astype(int)
            assert np.abs(a - b).max() <= 3

    def test_444_inputs(self):
        datas = [encode_jpeg(make_noise_image(40, 40, seed=s), 90,
                             subsample=False) for s in range(2)]
        fast = compress_jpeg_bytes_batched(
            None, datas, fennec.Options(format=fennec.JPEG))
        assert fast is not None
        want = fennec.compress_bytes(None, datas[0], fennec.Options(
            format=fennec.JPEG))
        assert fast[0].jpeg_quality == want.jpeg_quality
        assert abs(fast[0].compressed_size - want.compressed_size) <= 16

    def test_resize_matches_pixel_path(self):
        datas = [jpeg_bytes(64, 48, s) for s in range(2)]
        opts = fennec.Options(format=fennec.JPEG, max_width=32)
        fast = compress_jpeg_bytes_batched(None, datas, opts)
        assert fast is not None
        for data, got in zip(datas, fast):
            want = fennec.compress_bytes(None, data, fennec.Options(
                format=fennec.JPEG, max_width=32))
            assert got.final_dimensions == want.final_dimensions == (32, 24)
            assert got.jpeg_quality == want.jpeg_quality
            assert got.ssim == pytest.approx(want.ssim, abs=1e-4)

    def test_file_batch_uses_fast_path(self, tmp_path):
        paths = []
        for i in range(4):
            p = tmp_path / f"f{i}.jpg"
            p.write_bytes(jpeg_bytes(48, 48, i))
            paths.append(str(p))
        items = [fennec.BatchItem(src=p, dst=str(tmp_path / f"o{i}.jpg"))
                 for i, p in enumerate(paths)]
        res = fennec.compress_batch(
            None, items,
            fennec.BatchOptions(fused=True, default_opts=fennec.Options(
                format=fennec.JPEG)))
        assert all(r.err is None for r in res)
        # Equivalent to the unfused path byte-for-byte.
        items2 = [fennec.BatchItem(src=p, dst=str(tmp_path / f"p{i}.jpg"))
                  for i, p in enumerate(paths)]
        res2 = fennec.compress_batch(
            None, items2,
            fennec.BatchOptions(fused=False, default_opts=fennec.Options(
                format=fennec.JPEG)))
        for a, b in zip(res, res2):
            assert abs(a.result.compressed_size
                       - b.result.compressed_size) <= 16
            assert a.result.jpeg_quality == b.result.jpeg_quality


class TestDeviceEntropy:
    def test_device_entropy_matches_standard_tables(self):
        """device_entropy output must byte-match the pixel path with
        optimize_huffman disabled (same standard tables, same search)."""
        datas = [jpeg_bytes(64, 48, s) for s in range(3)]
        fast = compress_jpeg_bytes_batched(
            None, datas, fennec.Options(format=fennec.JPEG,
                                        device_entropy=True))
        assert fast is not None
        for data, got in zip(datas, fast):
            want = fennec.compress_bytes(
                None, data, fennec.Options(format=fennec.JPEG,
                                           optimize_huffman=False))
            assert got.jpeg_quality == want.jpeg_quality
            assert got.ssim == pytest.approx(want.ssim, abs=1e-5)
            from fennec_tpu.codecs import decode_image
            a = decode_image(got.compressed_data).astype(int)
            b = decode_image(want.compressed_data).astype(int)
            assert np.abs(a - b).max() <= 3

    def test_device_entropy_decodable(self):
        from fennec_tpu.codecs import decode_image
        from fennec_tpu.ops import ssim_fast
        datas = [jpeg_bytes(48, 48, 7)]
        orig = decode_image(datas[0])
        fast = compress_jpeg_bytes_batched(
            None, datas, fennec.Options(format=fennec.JPEG,
                                        device_entropy=True))
        out = decode_image(fast[0].compressed_data)
        assert ssim_fast(orig, out) == pytest.approx(fast[0].ssim, abs=0.01)

    def test_device_optimal_byte_identical_to_host_optimal(self):
        """The two-stage device path (symbol histograms on device → K.2
        tables on host → custom-LUT emission on device) must reproduce
        the host optimal-Huffman encoder byte for byte."""
        datas = [jpeg_bytes(72, 56, s) for s in range(4)]
        dev = compress_jpeg_bytes_batched(
            None, datas, fennec.Options(format=fennec.JPEG,
                                        device_entropy=True,
                                        optimize_huffman=True))
        host = compress_jpeg_bytes_batched(
            None, datas, fennec.Options(format=fennec.JPEG,
                                        device_entropy=False,
                                        optimize_huffman=True))
        for a, b in zip(dev, host):
            assert a.compressed_data == b.compressed_data

    def test_corrupt_file_does_not_degrade_fused_batch(self, tmp_path):
        """One undecodable file gets a per-item error; the rest still go
        through the fused coefficient fast path (reference semantics:
        batch.go:108-113 — one bad file never aborts the batch)."""
        import warnings

        paths = []
        for i in range(3):
            p = tmp_path / f"g{i}.jpg"
            p.write_bytes(jpeg_bytes(48, 48, i))
            paths.append(str(p))
        bad = tmp_path / "bad.jpg"
        bad.write_bytes(b"\xff\xd8\xff\xdbgarbage-not-a-real-jpeg")
        paths.append(str(bad))
        items = [fennec.BatchItem(src=p, dst=str(tmp_path / f"d{i}.jpg"))
                 for i, p in enumerate(paths)]
        with warnings.catch_warnings():
            warnings.simplefilter("error")  # no fused-path-failed warning
            res = fennec.compress_batch(
                None, items, fennec.BatchOptions(
                    fused=True,
                    default_opts=fennec.Options(format=fennec.JPEG)))
        assert [r.err is None for r in res] == [True, True, True, False]
        assert all(r.result.compressed_size > 0 for r in res[:3])

    def test_load_image_on_fast_path(self):
        """Result.image is None on the coefficient fast path (pixels
        never reach the host); load_image() decodes on demand."""
        datas = [jpeg_bytes(40, 32, 3)]
        rs = compress_jpeg_bytes_batched(
            None, datas, fennec.Options(format=fennec.JPEG))
        assert rs[0].image is None
        img = rs[0].load_image()
        assert img.shape == (32, 40, 4) and img.dtype == np.uint8
        assert rs[0].image is not None  # cached

    def test_device_std_byte_identical_to_host_std(self):
        datas = [jpeg_bytes(40, 40, 9)]
        dev = compress_jpeg_bytes_batched(
            None, datas, fennec.Options(format=fennec.JPEG,
                                        device_entropy=True,
                                        optimize_huffman=False))
        host = compress_jpeg_bytes_batched(
            None, datas, fennec.Options(format=fennec.JPEG,
                                        device_entropy=False,
                                        optimize_huffman=False))
        assert dev[0].compressed_data == host[0].compressed_data

    @pytest.mark.parametrize("optimize", [True, False])
    def test_device_entropy_444_output(self, optimize):
        """4:4:4 output (subsample=False) through the fused device
        emission, byte-identical to the host encoders."""
        datas = [jpeg_bytes(56, 40, s) for s in range(2)]
        dev = compress_jpeg_bytes_batched(
            None, datas, fennec.Options(format=fennec.JPEG,
                                        subsample=False,
                                        device_entropy=True,
                                        optimize_huffman=optimize))
        host = compress_jpeg_bytes_batched(
            None, datas, fennec.Options(format=fennec.JPEG,
                                        subsample=False,
                                        device_entropy=False,
                                        optimize_huffman=optimize))
        for a, b in zip(dev, host):
            assert a.compressed_data == b.compressed_data


class TestInt8Exceptions:
    def test_pack_roundtrip(self):
        from fennec_tpu import native
        rng = np.random.default_rng(1)
        arr = rng.integers(-400, 400, size=(3, 7, 64)).astype(np.int16)
        i8, idx, val = native.int16_to_int8_exc(arr)
        restored = i8.astype(np.int32).ravel()
        restored[idx] = val
        np.testing.assert_array_equal(restored.reshape(arr.shape), arr)

    def test_pack_no_exceptions(self):
        from fennec_tpu import native
        arr = np.arange(-100, 100, dtype=np.int16).reshape(2, -1)
        i8, idx, val = native.int16_to_int8_exc(arr)
        assert idx.size == 0
        np.testing.assert_array_equal(i8.astype(np.int16), arr)

    def test_python_fallback_matches_native(self):
        import fennec_tpu.native as nat
        if not nat.native_available():
            pytest.skip("native unavailable")
        rng = np.random.default_rng(2)
        arr = rng.integers(-300, 300, size=(5, 64)).astype(np.int16)
        lib_out = nat.int16_to_int8_exc(arr)
        os_env = __import__("os").environ
        os_env["FENNEC_NO_NATIVE"] = "1"
        try:
            nat._lib, nat._lib_tried = None, True
            py_out = nat.int16_to_int8_exc(arr)
        finally:
            del os_env["FENNEC_NO_NATIVE"]
            nat._lib_tried = False
        np.testing.assert_array_equal(lib_out[0], py_out[0])
        np.testing.assert_array_equal(lib_out[1], py_out[1])
        np.testing.assert_array_equal(lib_out[2], py_out[2])

    def test_high_quality_noisy_inputs_still_work(self):
        # Q99 noise → many |coef| > 127; must degrade gracefully.
        datas = [encode_jpeg(make_noise_image(48, 48, seed=s), 99)
                 for s in range(2)]
        out = compress_jpeg_bytes_batched(
            None, datas, fennec.Options(format=fennec.JPEG))
        assert out is not None
        assert all(r.compressed_size > 0 for r in out)


class TestMixedGeometryBatch:
    def test_mixed_sizes_grouped_through_fast_path(self, tmp_path):
        """Mixed-dimension JPEG folders: each geometry group rides the
        coefficient path; results match the per-file pool."""
        sizes = [(64, 48), (48, 48), (64, 48), (32, 32), (48, 48)]
        paths = []
        for i, (w, h) in enumerate(sizes):
            p = tmp_path / f"m{i}.jpg"
            p.write_bytes(jpeg_bytes(w, h, i))
            paths.append(str(p))
        opts = fennec.Options(format=fennec.JPEG)
        fused = fennec.compress_batch(
            None,
            [fennec.BatchItem(src=p, dst=str(tmp_path / f"fo{i}.jpg"))
             for i, p in enumerate(paths)],
            fennec.BatchOptions(fused=True, default_opts=opts))
        pooled = fennec.compress_batch(
            None,
            [fennec.BatchItem(src=p, dst=str(tmp_path / f"po{i}.jpg"))
             for i, p in enumerate(paths)],
            fennec.BatchOptions(fused=False, default_opts=opts))
        for (w, h), a, b in zip(sizes, fused, pooled):
            assert a.err is None and b.err is None
            assert a.result.final_dimensions == (w, h)
            assert a.result.jpeg_quality == b.result.jpeg_quality
            assert abs(a.result.compressed_size
                       - b.result.compressed_size) <= 16

    def test_mixed_jpeg_and_png_sources(self, tmp_path):
        from fennec_tpu.codecs.png import encode_png_rgba
        from conftest import make_noise_image
        jp = tmp_path / "a.jpg"
        jp.write_bytes(jpeg_bytes(48, 48, 1))
        pp = tmp_path / "b.png"
        pp.write_bytes(encode_png_rgba(make_noise_image(48, 48, seed=2)))
        res = fennec.compress_batch(
            None,
            [fennec.BatchItem(src=str(jp), dst=str(tmp_path / "a.out.jpg")),
             fennec.BatchItem(src=str(pp), dst=str(tmp_path / "b.out.jpg"))],
            fennec.BatchOptions(fused=True, default_opts=fennec.Options(
                format=fennec.JPEG)))
        assert all(r.err is None for r in res)
        assert all(r.result.compressed_size > 0 for r in res)


class TestFastPathActuallyTaken:
    def test_file_batch_routes_through_coef_path(self, tmp_path,
                                                 monkeypatch):
        """Guard against silent fallback: the fused file batch must invoke
        the coefficient path (a NameError once degraded it to the slow
        pool while all result-based tests still passed)."""
        import fennec_tpu.engine.batched as eb

        calls = []
        orig = eb.compress_jpeg_bytes_batched

        def spy(ctx, datas, opts, **kw):
            out = orig(ctx, datas, opts, **kw)
            calls.append((len(datas), out is not None))
            return out

        monkeypatch.setattr(eb, "compress_jpeg_bytes_batched", spy)
        paths = []
        for i in range(3):
            p = tmp_path / f"s{i}.jpg"
            p.write_bytes(jpeg_bytes(48, 48, i))
            paths.append(str(p))
        items = [fennec.BatchItem(src=p, dst=str(tmp_path / f"d{i}.jpg"))
                 for i, p in enumerate(paths)]
        res = fennec.compress_batch(
            None, items, fennec.BatchOptions(
                fused=True,
                default_opts=fennec.Options(format=fennec.JPEG)))
        assert all(r.err is None for r in res)
        assert calls == [(3, True)], \
            f"coef fast path not taken or failed: {calls}"


class TestExceptionLayout:
    """Sparse |v| > 127 exceptions ride as (image, offset) pairs — a flat
    whole-chunk int32 index overflows once B·NT·64 > 2^31 (large images ×
    deep chunks) and the device scatter would silently drop entries."""

    def test_i8_zigzag_to_natural_2d_exceptions(self):
        import jax.numpy as jnp

        from fennec_tpu.ops.dct import ZIGZAG
        from fennec_tpu.parallel.batched import _i8_zigzag_to_natural

        rng = np.random.default_rng(7)
        b, nt = 3, 5
        zz = rng.integers(-120, 121, (b, nt, 64)).astype(np.int16)
        zz[0, 0, 0] = 900      # DC exception
        zz[1, 3, 17] = -1400
        zz[2, 4, 63] = 300     # last zigzag slot
        i8 = zz.copy()
        exc_img, exc_t, exc_z = np.nonzero(np.abs(zz) > 127)
        exc_off = (exc_t * 64 + exc_z).astype(np.int32)
        exc_val = zz[exc_img, exc_t, exc_z]
        i8[exc_img, exc_t, exc_z] = 0
        # Padding rows: img == b is out of bounds → dropped on device.
        exc_img = np.concatenate([exc_img.astype(np.int32),
                                  np.full(5, b, np.int32)])
        exc_off = np.concatenate([exc_off, np.zeros(5, np.int32)])
        exc_val = np.concatenate([exc_val, np.full(5, 999, np.int16)])

        out = np.asarray(_i8_zigzag_to_natural(
            jnp.asarray(i8.astype(np.int8)), jnp.asarray(exc_img),
            jnp.asarray(exc_off), jnp.asarray(exc_val)))

        expected = np.zeros((b, nt, 64), np.int32)
        expected[:, :, np.asarray(ZIGZAG)] = zz  # zigzag → natural
        np.testing.assert_array_equal(out, expected)
        # The dropped padding values must not have landed anywhere.
        assert not np.any(out == 999)

    def test_high_magnitude_coefs_roundtrip_batch(self):
        """End-to-end: files whose coefficients exceed int8 (high-contrast
        blocks at high quality) must decode bit-correctly through the
        exception path of the fused engine."""
        img = np.zeros((48, 48, 4), np.uint8)
        img[..., 3] = 255
        img[::2, ::2, :3] = 255  # checkerboard → huge DCT magnitudes
        datas = [encode_jpeg(img, 98), jpeg_bytes(48, 48, 3, 95)]
        out = compress_jpeg_bytes_batched(
            None, datas, fennec.Options(format=fennec.JPEG))
        assert out is not None
        for r in out:
            assert r.compressed_data[:2] == b"\xff\xd8"
            assert r.ssim > 0.5


class TestUploadFormats:
    """The feeder picks the smaller of two upload layouts per chunk
    (sparse COO pairs for photo content, dense truncated int8 for noisy
    content); both must produce identical Results."""

    def test_photo_content_picks_coo_and_matches(self, monkeypatch):
        # Smooth gradients quantize to very sparse coefficients → the
        # sparse COO layout beats dense (CSR stays opt-in: it ships
        # fewer bytes but measured slower end to end — see
        # _prep_chunk_i8).
        img = np.zeros((64, 64, 4), np.uint8)
        yy, xx = np.mgrid[0:64, 0:64]
        img[..., 0] = (xx * 2).astype(np.uint8)
        img[..., 1] = (yy * 2).astype(np.uint8)
        img[..., 2] = 128
        img[..., 3] = 255
        datas = [encode_jpeg(img, 90) for _ in range(3)]
        opts = fennec.Options(format=fennec.JPEG)

        fmts = []
        from fennec_tpu.parallel import batched as pb

        orig_csr = pb.unpack_chunk_csr
        orig_coo = pb.unpack_chunk_coo
        orig_i8 = pb.unpack_chunk_buf
        monkeypatch.setattr(
            pb, "unpack_chunk_csr",
            lambda *a, **k: (fmts.append("csr"), orig_csr(*a, **k))[1])
        monkeypatch.setattr(
            pb, "unpack_chunk_coo",
            lambda *a, **k: (fmts.append("coo"), orig_coo(*a, **k))[1])
        monkeypatch.setattr(
            pb, "unpack_chunk_buf",
            lambda *a, **k: (fmts.append("i8"), orig_i8(*a, **k))[1])
        got = compress_jpeg_bytes_batched(None, datas, opts)
        assert fmts == ["coo"]
        want = [fennec.compress_bytes(None, d, opts) for d in datas]
        for g, w_ in zip(got, want):
            assert g.jpeg_quality == w_.jpeg_quality
            assert g.ssim == pytest.approx(w_.ssim, abs=2e-5)

    def test_forced_csr_matches(self, monkeypatch):
        # FENNEC_UPLOAD=csr pins the variable-length layout; results
        # must be identical to the per-image engine.
        monkeypatch.setenv("FENNEC_UPLOAD", "csr")
        img = np.zeros((64, 64, 4), np.uint8)
        yy, xx = np.mgrid[0:64, 0:64]
        img[..., 0] = (xx * 2).astype(np.uint8)
        img[..., 1] = 128
        img[..., 2] = (yy * 2).astype(np.uint8)
        img[..., 3] = 255
        datas = [encode_jpeg(img, 90) for _ in range(3)]
        opts = fennec.Options(format=fennec.JPEG)

        fmts = []
        from fennec_tpu.parallel import batched as pb

        orig_csr = pb.unpack_chunk_csr
        monkeypatch.setattr(
            pb, "unpack_chunk_csr",
            lambda *a, **k: (fmts.append("csr"), orig_csr(*a, **k))[1])
        got = compress_jpeg_bytes_batched(None, datas, opts)
        assert fmts == ["csr"]
        want = [fennec.compress_bytes(None, d, opts) for d in datas]
        for g, w_ in zip(got, want):
            assert g.jpeg_quality == w_.jpeg_quality
            assert g.ssim == pytest.approx(w_.ssim, abs=2e-5)

    def test_csr_slot_expansion_exact(self):
        # _csr_to_slots must reproduce the fixed-slot arrays exactly.
        import jax.numpy as jnp

        from fennec_tpu.parallel.batched import _csr_to_slots

        rng = np.random.default_rng(5)
        b, nt, rcap = 3, 40, 16
        counts = rng.integers(0, rcap + 1, (b, nt)).astype(np.int32)
        total = int(counts.sum())
        spos = rng.integers(1, 64, total).astype(np.int8)
        sval = rng.integers(-127, 128, total).astype(np.int8)
        m = 1
        while m < total:
            m *= 2
        spos_p = np.zeros(m, np.int8)
        sval_p = np.zeros(m, np.int8)
        spos_p[:total] = spos
        sval_p[:total] = sval
        per_img = counts.sum(axis=1)
        base = (np.cumsum(per_img) - per_img).astype(np.int32)
        pos, val = _csr_to_slots(jnp.asarray(counts), jnp.asarray(base),
                                 jnp.asarray(spos_p),
                                 jnp.asarray(sval_p), rcap)
        # Manual expansion.
        want_pos = np.zeros((b, nt, rcap), np.int8)
        want_val = np.zeros((b, nt, rcap), np.int8)
        k = 0
        for i in range(b):
            for n_ in range(nt):
                c = counts[i, n_]
                want_pos[i, n_, :c] = spos[k:k + c]
                want_val[i, n_, :c] = sval[k:k + c]
                k += c
        np.testing.assert_array_equal(np.asarray(pos), want_pos)
        np.testing.assert_array_equal(np.asarray(val), want_val)

    def test_noise_content_picks_dense_and_matches(self, monkeypatch):
        # High-frequency noise fills every zigzag slot → dense int8 wins.
        datas = [jpeg_bytes(64, 64, s, quality=98) for s in range(3)]
        opts = fennec.Options(format=fennec.JPEG)

        fmts = []
        from fennec_tpu.parallel import batched as pb

        orig_coo = pb.unpack_chunk_coo
        orig_i8 = pb.unpack_chunk_buf
        monkeypatch.setattr(
            pb, "unpack_chunk_coo",
            lambda *a, **k: (fmts.append("coo"), orig_coo(*a, **k))[1])
        monkeypatch.setattr(
            pb, "unpack_chunk_buf",
            lambda *a, **k: (fmts.append("i8"), orig_i8(*a, **k))[1])
        got = compress_jpeg_bytes_batched(None, datas, opts)
        assert fmts == ["i8"]
        want = [fennec.compress_bytes(None, d, opts) for d in datas]
        for g, w_ in zip(got, want):
            assert g.jpeg_quality == w_.jpeg_quality
            assert g.ssim == pytest.approx(w_.ssim, abs=2e-5)
