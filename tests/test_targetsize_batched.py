"""Batched target-size engine: equivalence with the per-image engine and
the reference's target-size contracts (overshoot bounds, quality floor)."""

import numpy as np
import pytest

import fennec_tpu as fennec
from conftest import (
    make_noise_image,
    make_test_image,
    make_test_image_with_alpha,
)
from fennec_tpu.engine.batched import compress_images_batched
from fennec_tpu.engine.targetsize import hit_target_size
from fennec_tpu.engine.targetsize_batched import hit_target_size_batched
from fennec_tpu.image import to_nrgba


def photo(w, h, seed):
    rng = np.random.default_rng(seed)
    img = make_noise_image(w, h, seed=seed).astype(np.int16)
    img[..., :3] = np.clip(img[..., :3] // 3 + 80 + rng.integers(-5, 5),
                           0, 255)
    img[..., 3] = 255
    return img.astype(np.uint8)


def assert_equivalent(got, want, target):
    """Batched vs per-image equivalence contract.

    Quality, format, and output geometry must match exactly.  Bytes
    usually match too, but a vmapped Lanczos resize may round a single
    pixel differently from the per-image resize (f32 knife-edge), moving
    the entropy-coded size by a few bytes — the reference's own tests pin
    SSIM/size contracts, not byte equality (SURVEY §4)."""
    assert got.format == want.format
    assert got.quality == want.quality
    assert (got.final_w, got.final_h) == (want.final_w, want.final_h)
    assert got.ssim == pytest.approx(want.ssim, abs=1e-4)
    if got.data != want.data:
        assert abs(len(got.data) - len(want.data)) <= 8
        assert (len(got.data) <= target) == (len(want.data) <= target)


class TestHitTargetSizeBatched:
    def test_matches_per_image_jpeg(self):
        imgs = [to_nrgba(photo(96, 80, s)) for s in range(4)]
        target = 2500
        opts = fennec.Options(format=fennec.JPEG, target_size=target)
        batched = hit_target_size_batched(None, imgs, target, opts)
        for img, got in zip(imgs, batched):
            want = hit_target_size(None, img, target, opts)
            assert_equivalent(got, want, target)

    def test_matches_per_image_auto(self):
        # AUTO format: S2 (palette PNG) competes with S1/S3 per image.
        imgs = [to_nrgba(make_test_image(80, 64)),
                to_nrgba(photo(80, 64, 7))]
        target = 2000
        opts = fennec.Options(target_size=target)
        batched = hit_target_size_batched(None, imgs, target, opts)
        for img, got in zip(imgs, batched):
            want = hit_target_size(None, img, target, opts)
            assert_equivalent(got, want, target)

    def test_scale_divergence_lockstep(self):
        # Different content difficulty at a tight target forces the
        # binary scale searches to diverge between images — the lockstep
        # grouping must still reproduce each per-image result.
        imgs = [to_nrgba(make_test_image(120, 90)),     # easy gradient
                to_nrgba(make_noise_image(120, 90, 3)),  # incompressible
                to_nrgba(photo(120, 90, 11))]
        target = 1200
        opts = fennec.Options(format=fennec.JPEG, target_size=target)
        batched = hit_target_size_batched(None, imgs, target, opts)
        for img, got in zip(imgs, batched):
            want = hit_target_size(None, img, target, opts)
            assert_equivalent(got, want, target)

    def test_under_target_when_achievable(self):
        imgs = [to_nrgba(photo(96, 96, s)) for s in range(3)]
        target = 4000
        opts = fennec.Options(format=fennec.JPEG, target_size=target)
        out = hit_target_size_batched(None, imgs, target, opts)
        for r in out:
            assert len(r.data) <= target
            assert r.quality >= 20 or r.format == fennec.PNG

    def test_impossible_target_fallback(self):
        # 50 bytes is unreachable: every image must take the fallback
        # (Q=1 JPEG / best PNG) and overshoot minimally — ≤2× unit bound
        # does not apply here; just require a valid result per image.
        imgs = [to_nrgba(photo(64, 64, s)) for s in range(2)]
        opts = fennec.Options(format=fennec.JPEG, target_size=50)
        out = hit_target_size_batched(None, imgs, 50, opts)
        for img, r in zip(imgs, out):
            want = hit_target_size(None, img, 50, opts)
            assert_equivalent(r, want, 50)

    def test_mixed_alpha_routing(self):
        # A transparent image can't use JPEG under AUTO; it must still get
        # a valid (PNG) result from the same batch.
        imgs = [to_nrgba(make_test_image_with_alpha(64, 64)),
                to_nrgba(photo(64, 64, 5))]
        target = 3000
        opts = fennec.Options(target_size=target)
        out = hit_target_size_batched(None, imgs, target, opts)
        for img, got in zip(imgs, out):
            want = hit_target_size(None, img, target, opts)
            assert_equivalent(got, want, target)


class TestCompressImagesBatchedTargetSize:
    def test_routing_and_contracts(self):
        imgs = [photo(96, 80, s) for s in range(4)] + [photo(48, 48, 9)]
        target = 2200
        opts = fennec.Options(format=fennec.JPEG, target_size=target)
        out = compress_images_batched(None, imgs, opts)
        assert len(out) == 5
        for img, r in zip(imgs, out):
            want = fennec.compress_image(None, img, opts)
            assert r.jpeg_quality == want.jpeg_quality
            assert r.format == want.format
            assert r.final_dimensions == want.final_dimensions
            if r.compressed_data != want.compressed_data:
                assert abs(r.compressed_size - want.compressed_size) <= 8

    def test_resize_then_target(self):
        out = compress_images_batched(
            None, [photo(128, 96, 1), photo(128, 96, 2)],
            fennec.Options(format=fennec.JPEG, target_size=2000,
                           max_width=64))
        for r in out:
            assert r.final_dimensions[0] <= 64
            assert r.compressed_size > 0

    def test_cancelled_context(self):
        ctx = fennec.Context()
        ctx.cancel()
        with pytest.raises(fennec.CanceledError):
            compress_images_batched(
                ctx, [photo(32, 32, 1), photo(32, 32, 2)],
                fennec.Options(format=fennec.JPEG, target_size=1000))


class TestCompressBatchTargetSize:
    def test_end_to_end_files(self, tmp_path):
        from fennec_tpu.codecs import png as png_codec

        items = []
        for i in range(8):
            p = tmp_path / f"in_{i}.png"
            p.write_bytes(png_codec.encode_png_rgba(photo(80, 64, i)))
            items.append(fennec.BatchItem(src=str(p),
                                          dst=str(tmp_path / f"o_{i}.jpg")))
        target = 2000
        bo = fennec.BatchOptions(
            default_opts=fennec.Options(format=fennec.JPEG,
                                        target_size=target))
        res = fennec.compress_batch(None, items, bo)
        summary = fennec.summarize(res)
        assert summary.succeeded == 8
        for r in res:
            assert r.err is None
            assert 0 < r.result.compressed_size
            # ≤2× overshoot contract (reference fennec_test.go:284-298)
            assert r.result.compressed_size <= 2 * target


class TestProbeGeometry:
    """The scale-probe lattice: bounded XLA program set, exact finals."""

    def test_lattice_properties(self):
        from fennec_tpu.engine.targetsize import PROBE_LATTICE, probe_geometry

        for w, h in ((500, 500), (1920, 1080), (37, 23), (16, 16)):
            geoms = set()
            for k in range(1, 200):
                scale = 0.05 + (k / 200) * 0.95
                nw, nh = probe_geometry(w, h, int(w * scale), int(h * scale))
                assert nw % PROBE_LATTICE == 0 or nw == w
                assert nh % PROBE_LATTICE == 0 or nh == h
                assert PROBE_LATTICE <= nw <= max(w, PROBE_LATTICE)
                assert PROBE_LATTICE <= nh <= max(h, PROBE_LATTICE)
                geoms.add((nw, nh))
            # Bounded program set: every probe the search can ever ask
            # for lives on the lattice — per-axis value counts are
            # bounded by dim/16 (pairs follow the aspect line).
            assert len({g[0] for g in geoms}) <= w // PROBE_LATTICE + 1
            assert len({g[1] for g in geoms}) <= h // PROBE_LATTICE + 1

    def test_snap_is_monotone(self):
        from fennec_tpu.engine.targetsize import probe_geometry

        prev = 0
        for nw in range(8, 500, 7):
            got, _ = probe_geometry(500, 500, nw, nw)
            assert got >= prev  # snapping preserves search monotonicity
            prev = got

    def test_prober_memoizes(self, monkeypatch):
        import fennec_tpu.engine.targetsize as ts

        calls = []
        real = ts._scale_probe_jit

        def spy(*a, **kw):
            calls.append(1)
            return real(*a, **kw)

        monkeypatch.setattr(ts, "_scale_probe_jit", spy)
        prober = ts._ScaleProber(photo(64, 64, 3))
        r1 = prober.probe(33, 33, 1500)
        r2 = prober.probe(37, 37, 1500)  # same lattice point (32, 32)
        assert r1 == r2
        assert len(calls) == 1
