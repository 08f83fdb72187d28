"""Fuzz: custom-Huffman-encoded scans decode back to the exact coefficients."""

import numpy as np
import pytest

from fennec_tpu import native
from fennec_tpu.codecs import entropy_py, tables as std_tables
from fennec_tpu.codecs.huffopt import specs_from_frequencies


def random_comps(seed, mcus=(3, 2), subsample=True, spread=900):
    rng = np.random.default_rng(seed)
    mx, my = mcus

    def coefs(nblocks, sparsity):
        c = rng.integers(-spread, spread, size=(nblocks, 64)).astype(np.int32)
        c[rng.random((nblocks, 64)) < sparsity] = 0
        return c

    if subsample:
        return [
            entropy_py.ComponentSpec(coefs(mx * my * 4, 0.7), mx * 2,
                                     my * 2, 2, 2, chroma=False),
            entropy_py.ComponentSpec(coefs(mx * my, 0.85), mx, my, 1, 1,
                                     chroma=True),
            entropy_py.ComponentSpec(coefs(mx * my, 0.85), mx, my, 1, 1,
                                     chroma=True),
        ]
    return [entropy_py.ComponentSpec(coefs(mx * my, 0.6), mx, my, 1, 1,
                                     chroma=bool(i)) for i in range(3)]


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("subsample", [True, False])
def test_optimized_scan_roundtrip(seed, subsample):
    comps = random_comps(seed, subsample=subsample)
    dc_freq, ac_freq = native.jpeg_count_symbols(comps)
    dc_specs, ac_specs = specs_from_frequencies(dc_freq, ac_freq)
    scan = native.jpeg_encode_scan_custom(comps, dc_specs, ac_specs)

    decode_specs = []
    for c in comps:
        cls = 1 if c.chroma else 0
        decode_specs.append(entropy_py.DecodeComponentSpec(
            c.bw, c.bh, c.h, c.v, dc_specs[cls], ac_specs[cls]))
    out = native.jpeg_decode_scan(scan, 0, decode_specs)
    for got, c in zip(out, comps):
        np.testing.assert_array_equal(got, c.qcoefs.astype(np.int16))


def test_optimized_never_longer_than_standard():
    comps = random_comps(7)
    std = native.jpeg_encode_scan(comps)
    dc_freq, ac_freq = native.jpeg_count_symbols(comps)
    dc_specs, ac_specs = specs_from_frequencies(dc_freq, ac_freq)
    opt = native.jpeg_encode_scan_custom(comps, dc_specs, ac_specs)
    # Optimality: entropy-optimal tables can't lose to fixed tables by
    # more than rounding slack on the same symbol stream.
    assert len(opt) <= len(std) + 2


def test_count_symbols_native_matches_python():
    comps = random_comps(11)
    if not native.native_available():
        pytest.skip("native unavailable")
    n_dc, n_ac = native.jpeg_count_symbols(comps)
    p_dc, p_ac = entropy_py.count_symbols(comps)
    np.testing.assert_array_equal(n_dc, p_dc)
    np.testing.assert_array_equal(n_ac, p_ac)
