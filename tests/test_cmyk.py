"""CMYK / YCCK / Adobe-RGB JPEG input decode.

The reference decodes these for free via Go stdlib image/jpeg
(io.go:82): Adobe APP14 4-component CMYK/YCCK frames (stored inverted)
and 3-component RGB frames (APP14 transform 0 or 'R','G','B' component
IDs).  fennec-tpu's decoder reproduces Go's conversion semantics:
rgb = base * k_raw / 255 with integer division (the double inversion of
image.CMYK + color.CMYKToRGB cancels).
"""

import io
import struct

import numpy as np
import pytest

from conftest import make_test_image

import fennec_tpu as fennec
from fennec_tpu.codecs.jpeg import decode_jpeg, jpeg_color_mode, parse_jpeg


def _pil_cmyk_jpeg(w=64, h=48):
    from PIL import Image

    rgb = make_test_image(w, h)[..., :3]
    img = Image.fromarray(rgb, "RGB").convert("CMYK")
    buf = io.BytesIO()
    img.save(buf, "JPEG", quality=95)
    return buf.getvalue(), img


def _assemble_4comp(w, h, qtab, scan, transform):
    """Minimal 4-component baseline JPEG container (4:4:4, shared
    quant/Huffman tables) with an Adobe APP14 marker."""
    from fennec_tpu.codecs.jpeg import (
        _dht_segment,
        _dqt_segment,
        _marker,
    )

    app14 = _marker(0xEE, b"Adobe" + struct.pack(">HHHB", 100, 0, 0,
                                                 transform))
    sof = struct.pack(">BHHB", 8, h, w, 4)
    for cid in (1, 2, 3, 4):
        sof += bytes([cid, 0x11, 0])
    sos = bytes([4])
    for cid in (1, 2, 3, 4):
        sos += bytes([cid, 0x00])
    sos += bytes([0, 63, 0])
    qt = np.stack([qtab, qtab])
    return (_marker(0xD8) + app14 + _dqt_segment(qt)
            + _marker(0xC0, sof) + _dht_segment()
            + _marker(0xDA, sos) + scan + _marker(0xD9))


def _encode_4comp(planes, w, h, quality, transform):
    """Encode four (H, W) uint8 planes as a 4:4:4 baseline scan."""
    from fennec_tpu.codecs import entropy_py
    from fennec_tpu.ops import dct as dct_ops

    ph, pw = h + (-h) % 8, w + (-w) % 8
    qtab = dct_ops.scale_quant_table(dct_ops.STD_LUMA_QUANT, quality)
    comps = []
    for plane in planes:
        p = np.pad(plane.astype(np.float32), ((0, ph - h), (0, pw - w)),
                   mode="edge")
        import jax.numpy as jnp

        blocks = dct_ops.to_blocks(jnp.asarray(p - 128.0))
        coefs = dct_ops.dct2d_blocks(blocks)
        q = np.asarray(dct_ops.quantize_blocks(
            coefs, jnp.asarray(qtab, dtype=jnp.float32))).astype(np.int32)
        comps.append(entropy_py.ComponentSpec(q, pw // 8, ph // 8, 1, 1))
    scan = entropy_py.encode_scan(comps, restart_interval=0)
    return _assemble_4comp(w, h, qtab, scan, transform)


class TestAdobeMarkers:
    def test_pil_cmyk_is_4comp(self):
        data, _ = _pil_cmyk_jpeg()
        hdr = parse_jpeg(data)
        assert hdr.ncomp == 4
        assert jpeg_color_mode(hdr) in ("cmyk", "ycck")

    def test_transform_parse(self):
        planes = [np.full((16, 16), 200, np.uint8)] * 4
        data = _encode_4comp(planes, 16, 16, 95, transform=2)
        hdr = parse_jpeg(data)
        assert hdr.adobe_transform == 2
        assert jpeg_color_mode(hdr) == "ycck"


class TestCMYKDecode:
    def test_pil_cmyk_roundtrip(self):
        """Decode a PIL-written Adobe CMYK JPEG; match Go-stdlib
        conversion of PIL's own decoded CMYK channels within ±3."""
        from PIL import Image

        data, _ = _pil_cmyk_jpeg()
        ours = decode_jpeg(data)
        pil = Image.open(io.BytesIO(data))
        assert pil.mode == "CMYK"
        cmyk = np.asarray(pil).astype(np.int32)  # true (un-inverted)
        c, m, y, k = [cmyk[..., i] for i in range(4)]
        want = np.stack([(255 - c) * (255 - k) // 255,
                         (255 - m) * (255 - k) // 255,
                         (255 - y) * (255 - k) // 255], axis=-1)
        diff = np.abs(ours[..., :3].astype(np.int32) - want)
        assert diff.max() <= 3, diff.max()
        assert (ours[..., 3] == 255).all()

    def test_cmyk_full_ink_k255(self):
        """Raw planes with k=255 pass base through unchanged
        (rgb = base * 255 // 255)."""
        rgb = make_test_image(32, 32)[..., :3]
        planes = [rgb[..., 0], rgb[..., 1], rgb[..., 2],
                  np.full((32, 32), 255, np.uint8)]
        data = _encode_4comp(planes, 32, 32, 98, transform=0)
        out = decode_jpeg(data)
        diff = np.abs(out[..., :3].astype(np.int32)
                      - rgb.astype(np.int32))
        assert diff.max() <= 6  # DCT quantization noise only

    def test_cmyk_k_scales(self):
        """k=128 halves every channel (integer division semantics)."""
        base = np.full((16, 16), 200, np.uint8)
        planes = [base, base, base, np.full((16, 16), 128, np.uint8)]
        data = _encode_4comp(planes, 16, 16, 100, transform=0)
        out = decode_jpeg(data).astype(np.int32)
        expect = 200 * 128 // 255
        assert np.abs(out[..., :3] - expect).max() <= 4

    def test_ycck_decode(self):
        """YCCK: YCbCr→RGB on the first three planes, scaled by k."""
        rgb = make_test_image(32, 32)[..., :3].astype(np.float32)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        yy = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        planes = [np.clip(np.round(p), 0, 255).astype(np.uint8)
                  for p in (yy, cb, cr)]
        planes.append(np.full((32, 32), 255, np.uint8))
        data = _encode_4comp(planes, 32, 32, 98, transform=2)
        out = decode_jpeg(data)
        diff = np.abs(out[..., :3].astype(np.int32)
                      - rgb.astype(np.int32))
        assert diff.max() <= 8  # color transform + DCT noise

    def test_cmyk_end_to_end_compress(self):
        """A CMYK JPEG input compresses through the public pipeline."""
        data, _ = _pil_cmyk_jpeg()
        res = fennec.compress_bytes(None, data,
                                    fennec.Options(format=fennec.JPEG))
        assert res.compressed_size > 0
        assert res.ssim > 0.8
        out = decode_jpeg(res.compressed_data)
        assert out.shape[:2] == (48, 64)


class TestAdobeRGB:
    def test_rgb_component_ids(self):
        """3-component frame with 'R','G','B' ids decodes without the
        YCbCr transform (Go reader heuristic)."""
        from fennec_tpu.codecs.jpeg import (
            _dht_segment,
            _dqt_segment,
            _marker,
        )
        from fennec_tpu.codecs import entropy_py
        from fennec_tpu.ops import dct as dct_ops
        import jax.numpy as jnp

        rgb = make_test_image(24, 24)[..., :3]
        w = h = 24
        qtab = dct_ops.scale_quant_table(dct_ops.STD_LUMA_QUANT, 98)
        comps = []
        for i in range(3):
            blocks = dct_ops.to_blocks(
                jnp.asarray(rgb[..., i].astype(np.float32) - 128.0))
            q = np.asarray(dct_ops.quantize_blocks(
                dct_ops.dct2d_blocks(blocks),
                jnp.asarray(qtab, dtype=jnp.float32))).astype(np.int32)
            comps.append(entropy_py.ComponentSpec(q, w // 8, h // 8, 1, 1))
        scan = entropy_py.encode_scan(comps, restart_interval=0)
        sof = struct.pack(">BHHB", 8, h, w, 3)
        for cid in (0x52, 0x47, 0x42):
            sof += bytes([cid, 0x11, 0])
        sos = bytes([3])
        for cid in (0x52, 0x47, 0x42):
            sos += bytes([cid, 0x00])
        sos += bytes([0, 63, 0])
        qt = np.stack([qtab, qtab])
        data = (_marker(0xD8) + _dqt_segment(qt) + _marker(0xC0, sof)
                + _dht_segment() + _marker(0xDA, sos) + scan
                + _marker(0xD9))
        hdr = parse_jpeg(data)
        assert jpeg_color_mode(hdr) == "rgb"
        out = decode_jpeg(data)
        diff = np.abs(out[..., :3].astype(np.int32)
                      - rgb.astype(np.int32))
        assert diff.max() <= 6
