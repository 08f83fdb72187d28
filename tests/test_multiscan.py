"""Baseline multi-scan (non-interleaved) JPEG decode tests.

Go's stdlib decodes these; fennec-tpu builds a synthetic 3-scan file with
its own entropy coder and checks pixel equality with the interleaved
encoding of the same coefficients.
"""

import struct

import jax.numpy as jnp
import numpy as np
import pytest

from conftest import make_noise_image, make_test_image
from fennec_tpu.codecs import entropy_py
from fennec_tpu.codecs.jpeg import (
    _dht_segment,
    _dqt_segment,
    _marker,
    _sof0_segment,
    decode_jpeg,
    encode_jpeg,
    forward_dct_device,
    quantize_coefs_device,
)
from fennec_tpu.ops.dct import all_quality_tables


def build_multiscan_jpeg(img, quality=85):
    """3 separate non-interleaved scans, 4:4:4."""
    h, w = img.shape[:2]
    coefs = forward_dct_device(jnp.asarray(img, dtype=jnp.float32), False)
    qt = all_quality_tables()[quality]
    qc = quantize_coefs_device(coefs, jnp.asarray(qt), False)
    qy, qcb, qcr = [np.asarray(c, dtype=np.int32) for c in qc]
    ph, pw = h + (-h) % 8, w + (-w) % 8
    by, bx = ph // 8, pw // 8

    out = (_marker(0xD8) + _dqt_segment(qt)
           + _sof0_segment(w, h, 3, False) + _dht_segment())
    for comp_id, blocks, chroma, tables in (
            (1, qy, False, 0x00), (2, qcb, True, 0x11),
            (3, qcr, True, 0x11)):
        spec = entropy_py.ComponentSpec(blocks, bx, by, 1, 1,
                                        chroma=chroma)
        scan = entropy_py.encode_scan([spec])
        sos = _marker(0xDA, bytes([1, comp_id, tables, 0, 63, 0]))
        out += sos + scan
    return out + _marker(0xD9)


class TestMultiScanDecode:
    @pytest.mark.parametrize("wh", [(48, 48), (40, 24), (33, 17)])
    def test_matches_interleaved(self, wh):
        w, h = wh
        img = make_noise_image(w, h, seed=w)
        multi = build_multiscan_jpeg(img, 85)
        inter = encode_jpeg(img, 85, subsample=False)
        got = decode_jpeg(multi)
        want = decode_jpeg(inter)
        np.testing.assert_array_equal(got, want)

    def test_gradient(self):
        img = make_test_image(64, 48)
        multi = build_multiscan_jpeg(img, 90)
        inter = encode_jpeg(img, 90, subsample=False)
        np.testing.assert_array_equal(decode_jpeg(multi),
                                      decode_jpeg(inter))

    def test_via_public_api(self):
        import fennec_tpu as fennec
        img = make_noise_image(32, 32, seed=2)
        multi = build_multiscan_jpeg(img)
        res = fennec.compress_bytes(None, multi,
                                    fennec.Options(format=fennec.JPEG))
        assert res.compressed_size > 0
