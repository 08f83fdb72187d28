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
