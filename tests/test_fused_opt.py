"""Fused single-dispatch optimal-Huffman path vs the two-stage path.

The fused path (FUSED_OPT, engine/batched.py) builds K.2 tables on
device (ops/huffbuild.py) and emits in the same dispatch as the search;
it must produce byte-identical files to the two-stage path (hist pull →
host K.2 → emit dispatch → words pull) on both batch engines.
"""

import numpy as np
import pytest

import fennec_tpu as fennec
import fennec_tpu.engine.batched as eb
from conftest import make_noise_image, make_test_image
from fennec_tpu.codecs.jpeg import encode_jpeg


@pytest.fixture
def _toggle(monkeypatch):
    def run(fn):
        monkeypatch.setattr(eb, "FUSED_OPT", False)
        base = fn()
        monkeypatch.setattr(eb, "FUSED_OPT", True)
        fused = fn()
        return base, fused
    return run


def test_coef_path_byte_identical(_toggle):
    datas = [encode_jpeg(make_test_image(80, 96), q)
             for q in (85, 92, 95) for _ in range(2)]
    datas += [encode_jpeg(make_noise_image(80, 96, seed=3), 90)]
    opts = fennec.Options(format=fennec.Format.JPEG,
                          device_entropy=True, optimize_huffman=True)

    base, fused = _toggle(
        lambda: eb.compress_jpeg_bytes_batched(None, datas, opts))
    for a, b in zip(base, fused):
        assert a.compressed_data == b.compressed_data
        assert a.jpeg_quality == b.jpeg_quality
        assert abs(a.ssim - b.ssim) < 1e-7


def test_pixel_path_byte_identical(_toggle):
    rng = np.random.default_rng(11)
    imgs = []
    for _ in range(5):
        im = np.clip(rng.normal(120, 45, (96, 80, 4)), 0,
                     255).astype(np.uint8)
        im[..., 3] = 255
        imgs.append(im)
    opts = fennec.Options(format=fennec.Format.JPEG,
                          device_entropy=True, optimize_huffman=True)

    base, fused = _toggle(
        lambda: eb.compress_images_batched(None, imgs, opts))
    for a, b in zip(base, fused):
        assert a.compressed_data == b.compressed_data
        assert a.jpeg_quality == b.jpeg_quality


def test_pixel_path_decodes(_toggle):
    # Independent decode check on the fused output.
    from PIL import Image
    import io

    img = make_test_image(120, 88)
    opts = fennec.Options(format=fennec.Format.JPEG,
                          device_entropy=True, optimize_huffman=True)
    rs = eb.compress_images_batched(None, [img], opts)
    got = Image.open(io.BytesIO(rs[0].compressed_data))
    assert got.size == (120, 88)
    assert got.mode == "RGB"


def test_sticky_coo_path_byte_identical():
    """Chunks after the first take the sticky zero-copy COO prep
    (engine/batched._prep_chunk_coo_sticky); outputs must be
    byte-identical to the census path (chunk 1) and to a single-chunk
    run of the same inputs."""
    datas = [encode_jpeg(make_test_image(80, 96), q)
             for q in (85, 90, 92, 95) for _ in range(3)]
    opts = fennec.Options(format=fennec.Format.JPEG,
                          device_entropy=True, optimize_huffman=True)
    one_chunk = eb.compress_jpeg_bytes_batched(None, datas, opts,
                                               chunk_size=16)
    multi = eb.compress_jpeg_bytes_batched(None, datas, opts,
                                           chunk_size=4)
    for a, b in zip(one_chunk, multi):
        assert a.compressed_data == b.compressed_data
        assert a.jpeg_quality == b.jpeg_quality


def test_sticky_coo_ecap_overflow_falls_back():
    """A later chunk whose exception count outgrows the pinned tail must
    rebuild via the census path (correctly) and bump the capacity."""
    from conftest import make_noise_image

    # Chunk 1: smooth images (few exceptions) arms a small ecap.
    smooth = [encode_jpeg(make_test_image(80, 96), 90) for _ in range(4)]
    # Chunk 2: high-quality noise (many |v|>127 exceptions).
    noisy = [encode_jpeg(make_noise_image(80, 96, seed=s), 97)
             for s in range(4)]
    datas = smooth + noisy
    opts = fennec.Options(format=fennec.Format.JPEG,
                          device_entropy=True, optimize_huffman=True)
    multi = eb.compress_jpeg_bytes_batched(None, datas, opts,
                                           chunk_size=4)
    single = [eb.compress_jpeg_bytes_batched(None, [d], opts,
                                             chunk_size=4)[0]
              for d in datas]
    for a, b in zip(single, multi):
        assert a.compressed_data == b.compressed_data


def test_sticky_coo_r_drift():
    """Content whose optimal R drifts between chunks stays byte-exact
    (the sticky width only moves exceptions, never meaning)."""
    from conftest import make_noise_image, make_striped_image

    datas = []
    for s in range(3):   # sparse chunk
        datas.append(encode_jpeg(make_test_image(80, 96), 85))
    for s in range(3):   # dense chunk (more AC nonzeros per block)
        datas.append(encode_jpeg(make_striped_image(80, 96), 95))
    for s in range(3):
        datas.append(encode_jpeg(make_noise_image(80, 96, seed=s), 92))
    opts = fennec.Options(format=fennec.Format.JPEG,
                          device_entropy=True, optimize_huffman=True)
    multi = eb.compress_jpeg_bytes_batched(None, datas, opts,
                                           chunk_size=3)
    one = eb.compress_jpeg_bytes_batched(None, datas, opts,
                                         chunk_size=16)
    for a, b in zip(one, multi):
        assert a.compressed_data == b.compressed_data
