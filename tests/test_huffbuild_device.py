"""Device K.2 builder (ops/huffbuild.py) vs the host oracle.

The fused single-dispatch optimal-Huffman path builds per-image code
tables ON DEVICE; every spec (BITS/VALS) and packed table entry must be
bit-identical to codecs/huffopt.specs_and_tables_batch (itself pinned
against the pure-Python T.81 K.2 oracle in test_huffopt.py) or the
emitted files change.
"""

import numpy as np
import pytest

from fennec_tpu.codecs.huffopt import specs_and_tables_batch
from fennec_tpu.ops.huffbuild import build_tables_device


def _host(dc_freq, ac_freq):
    specs, dcp, acp = specs_and_tables_batch(
        dc_freq.astype(np.int64), ac_freq.astype(np.int64))
    b = dc_freq.shape[0]
    bits = np.zeros((b, 4, 16), np.int32)
    vals = np.zeros((b, 4, 256), np.int32)
    nvals = np.zeros((b, 4), np.int32)
    for j, (dc_specs, ac_specs) in enumerate(specs):
        for cls in range(2):
            for t, (bt, vt) in ((cls, dc_specs[cls]),
                                (2 + cls, ac_specs[cls])):
                bits[j, t] = bt
                nvals[j, t] = len(vt)
                vals[j, t, :len(vt)] = vt
    tables = np.concatenate([dcp, acp], axis=2)
    return tables, bits, vals, nvals


def _check(dc_freq, ac_freq):
    tables_h, bits_h, vals_h, nvals_h = _host(dc_freq, ac_freq)
    t, b16, v, nv, ov = build_tables_device(dc_freq, ac_freq)
    assert not np.asarray(ov).any()
    np.testing.assert_array_equal(np.asarray(b16), bits_h)
    np.testing.assert_array_equal(np.asarray(nv), nvals_h)
    np.testing.assert_array_equal(np.asarray(v), vals_h)
    np.testing.assert_array_equal(np.asarray(t), tables_h)


def test_random_dense():
    rng = np.random.default_rng(0)
    dc = rng.integers(0, 50_000, (8, 2, 16)).astype(np.int32)
    ac = rng.integers(0, 50_000, (8, 2, 256)).astype(np.int32)
    _check(dc, ac)


def test_random_sparse():
    # Photographic-looking: few dominant symbols, long zero tails, and
    # lots of frequency TIES (the tie-break is the risky part).
    rng = np.random.default_rng(1)
    dc = np.zeros((16, 2, 16), np.int32)
    ac = np.zeros((16, 2, 256), np.int32)
    for j in range(16):
        for c in range(2):
            kdc = rng.integers(1, 12)
            dc[j, c, rng.choice(16, kdc, replace=False)] = rng.integers(
                1, 10, kdc)
            kac = rng.integers(1, 80)
            ac[j, c, rng.choice(256, kac, replace=False)] = rng.integers(
                1, 8, kac)
    _check(dc, ac)


def test_single_symbol_and_empty_classes():
    dc = np.zeros((4, 2, 16), np.int32)
    ac = np.zeros((4, 2, 256), np.int32)
    dc[0, 0, 5] = 100                 # single DC symbol, empty AC
    ac[1, 1, 0xF0] = 1                # single AC symbol (ZRL), ties w/ rsv
    dc[2, :, :] = 1                   # all-ties DC
    ac[3, 0, :8] = 7                  # uniform small AC
    _check(dc, ac)


def test_skewed_heavy():
    # Extreme skew drives long codes → exercises the K.3 redistribution.
    dc = np.zeros((2, 2, 16), np.int32)
    ac = np.zeros((2, 2, 256), np.int32)
    f = 1
    for s in range(16):
        dc[0, 0, s] = f
        f = min(f * 2, 1 << 28)
    f = 1
    for s in range(40):
        ac[0, 0, s] = max(1, f)
        f = int(f * 1.6) + 1
        if f > (1 << 27):
            f = 1
    dc[1] = 1
    ac[1, :, ::3] = 2
    _check(dc, ac)


def test_fibonacci_long_codes():
    # Fibonacci frequencies force maximal code lengths; with 40+ AC
    # symbols the pre-redistribution tree exceeds 16 bits and K.3 must
    # redistribute exactly like the host.
    dc = np.ones((1, 2, 16), np.int32)
    ac = np.zeros((1, 2, 256), np.int32)
    a, b = 1, 1
    for s in range(36):
        ac[0, 0, s] = a
        a, b = b, min(a + b, 1 << 29)
    ac[0, 1, 0] = 1
    _check(dc, ac)


def test_matches_real_histograms():
    # Histograms from an actual encoded scan (the production input).
    import jax.numpy as jnp

    from fennec_tpu.ops.dct import all_quality_tables, quantize_blocks
    from fennec_tpu.codecs.jpeg import forward_dct_device
    from fennec_tpu.ops.jpeg_emit import scan_symbol_hist_device
    from conftest import make_test_image, make_noise_image

    dcs, acs = [], []
    for img in (make_test_image(80, 96), make_noise_image(80, 96)):
        qt = jnp.asarray(all_quality_tables()[85], jnp.float32)
        cy, ccb, ccr = forward_dct_device(
            jnp.asarray(img, jnp.float32), True)
        qy = quantize_blocks(cy, qt[0])
        qcb = quantize_blocks(ccb, qt[1])
        qcr = quantize_blocks(ccr, qt[1])
        df, af = scan_symbol_hist_device(qy, qcb, qcr, 96, 80, True)
        dcs.append(np.asarray(df))
        acs.append(np.asarray(af))
    _check(np.stack(dcs).astype(np.int32),
           np.stack(acs).astype(np.int32))
