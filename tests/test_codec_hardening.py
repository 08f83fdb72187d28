"""Hardening against crafted/corrupt inputs and tRNS correctness.

The decoders are production input surfaces: a malformed file must raise a
clean Python error (ValueError / UnsupportedFormatError), never corrupt
memory or desynchronize silently.  The reference gets this for free from
Go stdlib's validated decoders (io.go:82); these tests pin the same
contract on our own codecs.
"""

import struct
import zlib

import numpy as np
import pytest

from fennec_tpu.codecs.jpeg import encode_jpeg, decode_jpeg
from fennec_tpu.codecs.png import decode_png, encode_png_rgba
from fennec_tpu.types import UnsupportedFormatError


def _img(h=32, w=32, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.integers(0, 256, (h, w, 4)).astype(np.uint8)
    a[..., 3] = 255
    return a


def _png_chunk(tag: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload)))


def _make_png(width, height, depth, color_type, raw_rows, extra=()):
    ihdr = struct.pack(">IIBBBBB", width, height, depth, color_type,
                       0, 0, 0)
    out = b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
    for tag, payload in extra:
        out += _png_chunk(tag, payload)
    out += _png_chunk(b"IDAT", zlib.compress(raw_rows))
    out += _png_chunk(b"IEND", b"")
    return out


class TestJPEGCrafted:
    def _find_segment(self, data: bytes, marker: int):
        i = 2
        while i < len(data) - 3:
            assert data[i] == 0xFF
            m = data[i + 1]
            ln = struct.unpack(">H", data[i + 2:i + 4])[0]
            if m == marker:
                return i, ln
            i += 2 + ln
        raise AssertionError(f"marker {marker:02x} not found")

    def test_oversized_dht_rejected(self):
        """A DHT whose BITS claim 16*255 values must fail cleanly (the
        native DecTable::build bound check), not smash the stack."""
        data = encode_jpeg(_img(), quality=80, subsample=True)
        i, ln = self._find_segment(data, 0xC4)
        # Replace the whole DHT with one crafted table: class 0 id 0,
        # BITS=[255]*16, 4080 VALS bytes.
        crafted = bytes([0x00]) + bytes([255] * 16) + bytes(4080)
        seg = struct.pack(">H", len(crafted) + 2) + crafted
        patched = data[:i + 2] + seg + data[i + 4 + ln - 2:]
        with pytest.raises((ValueError, UnsupportedFormatError)):
            decode_jpeg(patched)

    def test_truncated_dht_rejected(self):
        """BITS totals exceeding the VALS bytes actually present must not
        read out of bounds."""
        data = encode_jpeg(_img(), quality=80, subsample=True)
        i, ln = self._find_segment(data, 0xC4)
        # One table claiming 30 values but providing only 4 bytes.
        crafted = bytes([0x00]) + bytes([15, 15] + [0] * 14) + bytes(4)
        seg = struct.pack(">H", len(crafted) + 2) + crafted
        patched = data[:i + 2] + seg + data[i + 4 + ln - 2:]
        with pytest.raises((ValueError, UnsupportedFormatError)):
            decode_jpeg(patched)

    def test_sos_unknown_component_rejected(self):
        data = encode_jpeg(_img(), quality=80, subsample=True)
        i, ln = self._find_segment(data, 0xDA)
        body = bytearray(data[i + 4:i + 2 + ln + 2])
        body[1] = 9  # first scan component id: 1 → 9 (undeclared)
        patched = data[:i + 4] + bytes(body) + data[i + 2 + ln + 2:]
        with pytest.raises((ValueError, UnsupportedFormatError)):
            decode_jpeg(patched)


class TestPNGCrafted:
    def test_truncated_idat_raises(self):
        data = encode_png_rgba(_img())
        # Rebuild with an IDAT that inflates to too few bytes.
        i = data.index(b"IDAT") - 4
        ln = struct.unpack(">I", data[i:i + 4])[0]
        end = i + 8 + ln + 4
        short = zlib.compress(b"\x00" * 10)  # far less than h*(stride+1)
        patched = data[:i] + _png_chunk(b"IDAT", short) + data[end:]
        with pytest.raises(ValueError):
            decode_png(patched)

    def test_gray_1bit_trns_key(self):
        """depth-1 gray color key: px is scaled to {0,255}; key=1 must
        match the WHITE pixels."""
        # 2x2: rows (1, 0), (0, 1); stride=1 byte, filter 0.
        rows = bytes([0, 0b10000000, 0, 0b01000000])
        png = _make_png(2, 2, 1, 0, rows,
                        extra=((b"tRNS", struct.pack(">H", 1)),))
        out = decode_png(png)
        white = out[..., 0] == 255
        assert np.array_equal(out[..., 3] == 0, white)

    def test_gray_16bit_trns_key_high_byte(self):
        """depth-16 gray keeps the high byte; key 0xFF00 (white) must
        make white transparent, not black."""
        # 2x1: pixels 0xFF00 (white) and 0x0000 (black).
        rows = bytes([0]) + struct.pack(">HH", 0xFF00, 0x0000)
        png = _make_png(2, 1, 16, 0, rows,
                        extra=((b"tRNS", struct.pack(">H", 0xFF00)),))
        out = decode_png(png)
        assert out[0, 0, 3] == 0      # white pixel transparent
        assert out[0, 1, 3] == 255    # black pixel opaque

    def test_rgb_trns_color_key(self):
        """Truecolor tRNS: pixels matching the 6-byte RGB key get
        alpha 0 (PIL agrees)."""
        from PIL import Image
        import io as _io

        # 2x1 RGB: green key pixel and a red pixel.
        rows = bytes([0, 0, 255, 0, 255, 0, 0])
        key = struct.pack(">HHH", 0, 255, 0)
        png = _make_png(2, 1, 8, 2, rows, extra=((b"tRNS", key),))
        out = decode_png(png)
        assert out[0, 0, 3] == 0 and out[0, 1, 3] == 255
        ref = np.asarray(
            Image.open(_io.BytesIO(png)).convert("RGBA"))
        np.testing.assert_array_equal(out[..., 3], ref[..., 3])

    def test_progressive_interleaved_ac_scan_rejected(self):
        """A progressive AC scan declaring 2 components must raise, not
        desynchronize."""
        from fennec_tpu.codecs import progressive as prog

        # Build a valid progressive file via PIL, then patch its first
        # AC SOS to claim 2 components (structurally consistent header).
        from PIL import Image
        import io as _io

        buf = _io.BytesIO()
        Image.fromarray(_img(32, 32)[..., :3], "RGB").save(
            buf, "JPEG", progressive=True, quality=80)
        data = buf.getvalue()
        i = 2
        patched = None
        while i < len(data) - 3:
            if data[i] == 0xFF and data[i + 1] == 0xDA:
                ln = struct.unpack(">H", data[i + 2:i + 4])[0]
                body = bytearray(data[i + 4:i + 2 + ln + 2])
                ns, ss = body[0], body[1 + body[0] * 2]
                if ns == 1 and ss > 0:
                    # claim 2 components: duplicate the (cs, tables) pair
                    newbody = (bytes([2]) + bytes(body[1:3]) * 2
                               + bytes(body[3:]))
                    seg = struct.pack(">H", len(newbody) + 2) + newbody
                    patched = data[:i + 2] + seg + data[i + 4 + ln - 2:]
                    break
                i += 2 + ln
            else:
                i += 1
        assert patched is not None, "no AC scan found to patch"
        with pytest.raises((ValueError, UnsupportedFormatError)):
            prog.decode_progressive_to_coefs(patched)


class TestFuzzDecodersNoCrash:
    """Deterministic corpus fuzz: truncations and byte flips of valid
    files must raise clean Python errors or decode — never crash the
    process (the native paths run with no memory-safety net)."""

    def _jpeg_corpus(self):
        base = [encode_jpeg(_img(40, 56, seed=s), quality=q,
                            subsample=sub)
                for s, q, sub in ((0, 80, True), (1, 35, False))]
        rng = np.random.default_rng(42)
        out = []
        for data in base:
            for cut in (len(data) // 3, len(data) // 2, len(data) - 5):
                out.append(data[:cut])
            for _ in range(40):
                b = bytearray(data)
                for _ in range(rng.integers(1, 6)):
                    b[rng.integers(2, len(b))] = rng.integers(0, 256)
                out.append(bytes(b))
        return out

    def test_jpeg_decode_no_crash(self):
        ok = err = 0
        for data in self._jpeg_corpus():
            try:
                decode_jpeg(data)
                ok += 1
            except Exception:
                err += 1
        assert ok + err == 86  # every input handled, process alive

    def test_png_decode_no_crash(self):
        base = encode_png_rgba(_img(40, 56, seed=2))
        rng = np.random.default_rng(43)
        ok = err = 0
        for i in range(60):
            if i < 10:
                data = base[:len(base) * (i + 1) // 12]
            else:
                b = bytearray(base)
                for _ in range(rng.integers(1, 6)):
                    b[rng.integers(8, len(b))] = rng.integers(0, 256)
                data = bytes(b)
            try:
                decode_png(data)
                ok += 1
            except Exception:
                err += 1
        assert ok + err == 60


def test_rst_fill_bytes_accepted():
    """T.81 B.1.1.2 allows 0xFF fill bytes before RST markers; both
    decode paths must accept them (native and Python)."""
    import os

    data = encode_jpeg(_img(48, 48, seed=5), quality=85, subsample=True)
    # Re-encode with a restart interval to get RST markers: build via
    # our own encoder path with DRI by splicing is fragile — instead use
    # PIL, which honors the restart marker option.
    from PIL import Image
    import io as _io

    buf = _io.BytesIO()
    Image.fromarray(_img(48, 48, seed=5)[..., :3], "RGB").save(
        buf, "JPEG", quality=85, restart_marker_blocks=1)
    data = buf.getvalue()
    # Insert a fill byte before each RST marker (FF Dn -> FF FF Dn).
    out = bytearray()
    i = 0
    scan_started = False
    while i < len(data):
        if (scan_started and data[i] == 0xFF and i + 1 < len(data)
                and 0xD0 <= data[i + 1] <= 0xD7):
            out += b"\xff"
        if data[i] == 0xFF and i + 1 < len(data) and data[i + 1] == 0xDA:
            scan_started = True
        out.append(data[i])
        i += 1
    padded = bytes(out)
    assert padded != data, "no RST markers found to pad"
    ref = decode_jpeg(data)
    got = decode_jpeg(padded)
    np.testing.assert_array_equal(got, ref)
    # Python fallback path too.
    os.environ["FENNEC_NO_NATIVE"] = "1"
    try:
        import fennec_tpu.native as native
        native._lib, native._lib_tried = None, False
        got_py = decode_jpeg(padded)
        np.testing.assert_array_equal(got_py, ref)
    finally:
        del os.environ["FENNEC_NO_NATIVE"]
        native._lib, native._lib_tried = None, False
