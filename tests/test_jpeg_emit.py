"""Device Huffman emission: byte-for-byte parity with the host encoder."""

import jax.numpy as jnp
import numpy as np
import pytest

from conftest import make_noise_image, make_solid_image, make_test_image
from fennec_tpu.codecs.jpeg import (
    encode_scan_from_quantized,
    forward_dct_device,
    quantize_coefs_device,
)
from fennec_tpu.ops.dct import all_quality_tables
from fennec_tpu.ops.jpeg_emit import emit_scan_device, finalize_scan_host


def quantized(img, quality, subsample=True):
    h, w = img.shape[:2]
    coefs = forward_dct_device(jnp.asarray(img, dtype=jnp.float32),
                               subsample)
    qt = all_quality_tables()[quality]
    qc = quantize_coefs_device(coefs, jnp.asarray(qt), subsample)
    mult = 16 if subsample else 8
    ph, pw = h + (-h) % mult, w + (-w) % mult
    return [np.asarray(c, dtype=np.int32) for c in qc], ph, pw


@pytest.mark.parametrize("quality", [10, 35, 75, 95])
@pytest.mark.parametrize("maker,wh", [("noise", (80, 64)),
                                      ("grad", (48, 48)),
                                      ("noise", (37, 21))])
def test_device_emission_matches_host_encoder(quality, maker, wh):
    w, h = wh
    img = (make_noise_image(w, h, seed=quality) if maker == "noise"
           else make_test_image(w, h))
    (qy, qcb, qcr), ph, pw = quantized(img, quality)

    want = encode_scan_from_quantized(qy, qcb, qcr, ph, pw, True)

    max_words = (qy.shape[0] + 2 * qcb.shape[0]) * 64 + 64
    words, bits = emit_scan_device(
        jnp.asarray(qy), jnp.asarray(qcb), jnp.asarray(qcr),
        ph, pw, True, max_words)
    got = finalize_scan_host(np.asarray(words), int(bits))
    assert got == want


def test_444_emission():
    img = make_noise_image(40, 32, seed=3)
    (qy, qcb, qcr), ph, pw = quantized(img, 80, subsample=False)
    want = encode_scan_from_quantized(qy, qcb, qcr, ph, pw, False)
    max_words = 3 * qy.shape[0] * 64 + 64
    words, bits = emit_scan_device(
        jnp.asarray(qy), jnp.asarray(qcb), jnp.asarray(qcr),
        ph, pw, False, max_words)
    assert finalize_scan_host(np.asarray(words), int(bits)) == want


def test_solid_image_emission():
    img = make_solid_image(32, 32, 200, 10, 99)
    (qy, qcb, qcr), ph, pw = quantized(img, 60)
    want = encode_scan_from_quantized(qy, qcb, qcr, ph, pw, True)
    words, bits = emit_scan_device(
        jnp.asarray(qy), jnp.asarray(qcb), jnp.asarray(qcr),
        ph, pw, True, 4096)
    assert finalize_scan_host(np.asarray(words), int(bits)) == want


def _emit_vs_host(qy, qcb, qcr, ph, pw, subsample=True):
    want = encode_scan_from_quantized(qy, qcb, qcr, ph, pw, subsample)
    max_words = (qy.shape[0] + qcb.shape[0] + qcr.shape[0]) * 64 + 64
    words, bits = emit_scan_device(
        jnp.asarray(qy), jnp.asarray(qcb), jnp.asarray(qcr),
        ph, pw, subsample, max_words)
    got = finalize_scan_host(np.asarray(words), int(bits))
    assert got == want


class TestAdversarialCoefficients:
    """Direct coefficient-tensor attacks on the emission kernel: maximal
    block lengths, ZRL-run extremes, and magnitude boundaries — cases a
    real encoder pipeline never produces together."""

    def _geom(self, blocks_w=4, blocks_h=4):
        ph, pw = blocks_h * 16, blocks_w * 16
        ny = (ph // 8) * (pw // 8)
        nc = (ph // 16) * (pw // 16)
        return ph, pw, ny, nc

    def test_all_coefficients_maximal(self):
        """Every coefficient at ±2047/±1023: the densest legal blocks
        (~1650 bits each — the LWORDS=64 local buffer's worst case)."""
        ph, pw, ny, nc = self._geom()
        rng = np.random.default_rng(0)
        sign = lambda shape: rng.choice([-1, 1], size=shape)
        qy = (sign((ny, 64)) * 1023).astype(np.int32)
        qy[:, 0] = rng.integers(-2047, 2048, ny)
        qcb = (sign((nc, 64)) * 255).astype(np.int32)
        qcr = (sign((nc, 64)) * 511).astype(np.int32)
        _emit_vs_host(qy, qcb, qcr, ph, pw)

    def test_zrl_runs(self):
        """Single nonzero at the last zigzag position → three ZRLs per
        block; also gaps of exactly 16/32/47."""
        from fennec_tpu.ops.dct import ZIGZAG
        ph, pw, ny, nc = self._geom()
        qy = np.zeros((ny, 64), np.int32)
        qy[:, ZIGZAG[63]] = 5          # gap 62: ZRL ZRL ZRL + code
        qy[1::3, ZIGZAG[17]] = -3      # gap 16: one ZRL
        qy[2::3, ZIGZAG[33]] = 7       # gap 32: two ZRLs
        qcb = np.zeros((nc, 64), np.int32)
        qcb[:, ZIGZAG[48]] = -1
        qcr = np.zeros((nc, 64), np.int32)
        qcr[:, 0] = 1024
        _emit_vs_host(qy, qcb, qcr, ph, pw)

    def test_magnitude_boundaries(self):
        """Values at every size-category boundary ±(2^k-1), ±2^k."""
        ph, pw, ny, nc = self._geom()
        vals = []
        for k in range(1, 11):
            vals += [(1 << k) - 1, 1 << k, -((1 << k) - 1), -(1 << k)]
        qy = np.zeros((ny, 64), np.int32)
        flat = np.resize(np.asarray(vals, np.int32), ny * 63)
        qy[:, 1:] = flat.reshape(ny, 63)
        qcb = np.zeros((nc, 64), np.int32)
        qcr = np.zeros((nc, 64), np.int32)
        _emit_vs_host(qy, qcb, qcr, ph, pw)

    def test_dc_only_alternating_extremes(self):
        """DC prediction chain swinging rail to rail (diff = ±4094)."""
        ph, pw, ny, nc = self._geom(blocks_w=8, blocks_h=2)
        qy = np.zeros((ny, 64), np.int32)
        qy[:, 0] = np.where(np.arange(ny) % 2 == 0, 2047, -2047)
        qcb = np.zeros((nc, 64), np.int32)
        qcr = np.zeros((nc, 64), np.int32)
        _emit_vs_host(qy, qcb, qcr, ph, pw)

    def test_fuzz_roundtrip_decode(self):
        """Random sparse tensors: emitted stream must decode back to the
        exact coefficients via the C++ scan decoder."""
        from fennec_tpu.codecs.jpeg import assemble_jpeg, decode_jpeg_to_coefs
        from fennec_tpu.ops.dct import all_quality_tables
        ph, pw, ny, nc = self._geom()
        rng = np.random.default_rng(7)
        qy = (rng.integers(-300, 300, (ny, 64))
              * (rng.random((ny, 64)) < 0.15)).astype(np.int32)
        qcb = (rng.integers(-80, 80, (nc, 64))
               * (rng.random((nc, 64)) < 0.1)).astype(np.int32)
        qcr = np.zeros((nc, 64), np.int32)
        max_words = (ny + 2 * nc) * 64 + 64
        words, bits = emit_scan_device(
            jnp.asarray(qy), jnp.asarray(qcb), jnp.asarray(qcr),
            ph, pw, True, max_words)
        scan = finalize_scan_host(np.asarray(words), int(bits))
        data = assemble_jpeg(pw, ph, all_quality_tables()[50], scan, True)
        hdr, coefs = decode_jpeg_to_coefs(data)
        np.testing.assert_array_equal(np.asarray(coefs[0], np.int32), qy)
        np.testing.assert_array_equal(np.asarray(coefs[1], np.int32), qcb)
        np.testing.assert_array_equal(np.asarray(coefs[2], np.int32), qcr)


class TestOptimisticLwords:
    """Optimistic per-block emit buffers (lwords < LWORDS) with the
    exact overflow flag: normal content is byte-identical at the small
    width, worst-case content trips the flag instead of corrupting."""

    def _geom(self, blocks_w=4, blocks_h=4):
        ph, pw = blocks_h * 16, blocks_w * 16
        ny = (ph // 8) * (pw // 8)
        nc = (ph // 16) * (pw // 16)
        return ph, pw, ny, nc

    def test_small_width_matches_default_on_normal_content(self):
        img = make_noise_image(64, 48, seed=9)
        (qy, qcb, qcr), ph, pw = quantized(img, 75)
        max_words = (qy.shape[0] + 2 * qcb.shape[0]) * 64 + 64
        w0, b0 = emit_scan_device(
            jnp.asarray(qy), jnp.asarray(qcb), jnp.asarray(qcr),
            ph, pw, True, max_words)
        w1, b1, ovf = emit_scan_device(
            jnp.asarray(qy), jnp.asarray(qcb), jnp.asarray(qcr),
            ph, pw, True, max_words, lwords=16)
        assert not bool(ovf)
        assert int(b0) == int(b1)
        np.testing.assert_array_equal(np.asarray(w0), np.asarray(w1))

    def test_overflow_flag_exact_on_maximal_blocks(self):
        """Densest legal blocks (~1650 bits) overflow any small width;
        the flag must fire, and the safe width must still match the
        host encoder byte for byte."""
        ph, pw, ny, nc = self._geom()
        rng = np.random.default_rng(0)
        sign = lambda shape: rng.choice([-1, 1], size=shape)
        qy = (sign((ny, 64)) * 1023).astype(np.int32)
        qy[:, 0] = rng.integers(-2047, 2048, ny)
        qcb = (sign((nc, 64)) * 255).astype(np.int32)
        qcr = (sign((nc, 64)) * 511).astype(np.int32)
        max_words = (ny + 2 * nc) * 64 + 64
        _w, _b, ovf = emit_scan_device(
            jnp.asarray(qy), jnp.asarray(qcb), jnp.asarray(qcr),
            ph, pw, True, max_words, lwords=16)
        assert bool(ovf)
        # lwords=53 covers the legal worst case (1680 bits): no flag,
        # exact bytes.
        w2, b2, ovf2 = emit_scan_device(
            jnp.asarray(qy), jnp.asarray(qcb), jnp.asarray(qcr),
            ph, pw, True, max_words, lwords=53)
        assert not bool(ovf2)
        want = encode_scan_from_quantized(qy, qcb, qcr, ph, pw, True)
        assert finalize_scan_host(np.asarray(w2), int(b2)) == want

    def test_batched_wrapper_flag_in_header(self):
        """batched_emit_std at a small width: the per-image flag rides
        bit 31 of column 0 and pull_emit_words strips it."""
        from fennec_tpu.parallel.batched import (
            batched_emit_std,
            pull_emit_words,
        )

        ph, pw, ny, nc = self._geom(blocks_w=2, blocks_h=2)
        rng = np.random.default_rng(3)
        normal = (rng.integers(-40, 40, (ny + 2 * nc, 64))
                  * (rng.random((ny + 2 * nc, 64)) < 0.05)).astype(
                      np.int16)
        dense = np.where(rng.random((ny + 2 * nc, 64)) < 0.5, 900,
                         -900).astype(np.int16)
        packed = jnp.asarray(np.stack([normal, dense]))
        max_words = 8192
        wb = batched_emit_std(packed, ph, pw, True, max_words, 8)
        words, bits, ovf = pull_emit_words(wb, max_words)
        assert not bool(ovf[0]) and bool(ovf[1])
        # The safe width agrees with the host encoder on BOTH lanes.
        wb0 = batched_emit_std(packed, ph, pw, True, max_words)
        words0, bits0, ovf0 = pull_emit_words(wb0, max_words)
        assert not ovf0.any()
        got = finalize_scan_host(words0[0], int(bits0[0]))
        want = encode_scan_from_quantized(
            normal[:ny].astype(np.int32),
            normal[ny:ny + nc].astype(np.int32),
            normal[ny + nc:].astype(np.int32), ph, pw, True)
        assert got == want
        # And the optimistic lane 0 (no overflow) matches the safe lane.
        assert int(bits[0]) == int(bits0[0])

    def test_engine_redo_under_tiny_width(self, monkeypatch):
        """EMIT_LWORDS=2 forces the overflow redo on real content: the
        single-image engine must still produce the identical file."""
        import fennec_tpu.ops.jpeg_emit as je
        from fennec_tpu.engine.compress import compress_jpeg_optimal
        from fennec_tpu.types import Options

        img = make_noise_image(48, 48, seed=11)
        opts = Options()
        opts.device_entropy = True
        q0, s0, d0 = compress_jpeg_optimal(img, 0.94, opts)
        monkeypatch.setattr(je, "EMIT_LWORDS", 2)
        q1, s1, d1 = compress_jpeg_optimal(img, 0.94, opts)
        assert (q0, d0) == (q1, d1)
