"""Parity of the transpose-free coefficient-PLANE reconstruction
(engine/compress._reconstruct_rgb_planes, the probe-loop hot path)
against the (N, 64) Kronecker block formulation (_reconstruct_rgb).

Both implement the same arithmetic — quantize/dequantize at a traced
table, 8×8 IDCT, 4:2:0 upsample, YCbCr→RGB, clamp — so they must agree
to float tolerance on every shape/subsample combination, and the
batched quality search built on the plane path must pick the same
quality as the single-image block path.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from fennec_tpu.engine.compress import (
    _reconstruct_rgb,
    _reconstruct_rgb_planes,
)
from fennec_tpu.codecs.jpeg import forward_dct_device
from fennec_tpu.ops import dct as dct_ops


def _rand_img(h, w, seed):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, (h, w, 4)).astype(np.uint8)
    base[..., 3] = 255
    return base


@pytest.mark.parametrize("h,w,subsample", [
    (64, 64, True), (64, 64, False),
    (50, 70, True), (50, 70, False),   # non-multiple dims (crop path)
    (17, 23, True),                    # tiny, heavy padding
])
@pytest.mark.parametrize("quality", [8, 50, 92])
def test_plane_matches_block_reconstruction(h, w, subsample, quality):
    img = _rand_img(h, w, seed=h * w + quality).astype(np.float32)
    coefs = forward_dct_device(jnp.asarray(img), subsample)
    mult = 16 if subsample else 8
    ph, pw = h + (-h) % mult, w + (-w) % mult
    ch, cw = (ph // 2, pw // 2) if subsample else (ph, pw)

    qtab = jnp.asarray(dct_ops.all_quality_tables()[quality],
                       dtype=jnp.float32)
    rgb_block = np.asarray(_reconstruct_rgb(coefs, qtab, ph, pw,
                                            subsample, h, w))

    cplanes = (dct_ops.from_blocks(coefs[0], ph, pw),
               dct_ops.from_blocks(coefs[1], ch, cw),
               dct_ops.from_blocks(coefs[2], ch, cw))
    r, g, b = _reconstruct_rgb_planes(cplanes[0], cplanes[1], cplanes[2],
                                      qtab, subsample, h, w)
    rgb_plane = np.stack([np.asarray(r), np.asarray(g), np.asarray(b)],
                         axis=-1)
    # Identical math modulo f32 matmul summation order; values are
    # integral after clamp_u8 rounding, so they agree exactly except
    # where a value sits within float noise of a .5 boundary.
    assert np.mean(rgb_plane != rgb_block) < 1e-3
    np.testing.assert_allclose(rgb_plane, rgb_block, atol=1.0)


def test_batched_search_matches_blocks_semantics():
    """batched_quality_search_device (plane-based probes) picks the same
    quality as compress_jpeg_optimal's search on the same image."""
    from fennec_tpu.engine.compress import quality_search_device
    from fennec_tpu.parallel.batched import batched_quality_search

    imgs = np.stack([_rand_img(48, 48, seed=s) for s in range(4)])
    # Smooth images so SSIM actually varies with quality.
    imgs = (imgs.astype(np.float32) * 0.3 + 120.0).astype(np.uint8)
    imgs[..., 3] = 255
    targets = np.full((4,), 0.95, np.float32)
    q_b, s_b, f_b = batched_quality_search(jnp.asarray(imgs),
                                           jnp.asarray(targets))
    for i in range(4):
        q1, s1, f1 = quality_search_device(
            jnp.asarray(imgs[i], dtype=jnp.float32), jnp.float32(0.95))
        assert int(q_b[i]) == int(q1)
        assert bool(f_b[i]) == bool(f1)
        assert float(s_b[i]) == pytest.approx(float(s1), abs=1e-4)

def test_sub_unity_targets_not_clamped():
    """Targets in (0.999, 1.0) must pass through unclamped — only >= 1.0
    clamps to 0.999 (compress.go:24-26).  A noisy image that can reach
    SSIM 0.999 but not 0.9995 must report found=False at 0.9995, in both
    the single-image and batched engines."""
    from fennec_tpu.engine.compress import quality_search_device
    from fennec_tpu.parallel.batched import batched_quality_search

    img = _rand_img(48, 48, seed=7).astype(np.float32)  # noisy: hard
    q1, s1, f1 = quality_search_device(jnp.asarray(img),
                                       jnp.float32(0.9995))
    q_b, s_b, f_b = batched_quality_search(
        jnp.asarray(img[None]), jnp.asarray(np.float32([0.9995])))
    # Batched and single-image must agree exactly.
    assert int(q_b[0]) == int(q1)
    assert bool(f_b[0]) == bool(f1)
    # found would require a probe with SSIM >= 0.9995; if one was found
    # its SSIM must genuinely meet the unclamped target.
    if bool(f1):
        assert float(s1) >= 0.9995
    # target >= 1.0 still clamps: behaves as 0.999, not impossible.
    q2, s2, f2 = quality_search_device(jnp.asarray(img), jnp.float32(1.0))
    q3, s3, f3 = quality_search_device(jnp.asarray(img),
                                       jnp.float32(0.999))
    assert int(q2) == int(q3) and bool(f2) == bool(f3)


def test_emit_words_sizing_shared_rule():
    """emit_words_for_bits: floor 256, pow2, exact powers not doubled."""
    from fennec_tpu.ops.jpeg_emit import emit_words_for_bits

    assert emit_words_for_bits(0) == 256
    assert emit_words_for_bits(100) == 256
    # (16384 - 64) * 32 bits → exactly 16384 words → stays 16384.
    assert emit_words_for_bits((16384 - 64) * 32) == 16384
    assert emit_words_for_bits((16384 - 64) * 32 + 32) == 32768
