"""Unit tests for the type system (mirrors reference fennec_test.go
preset/validation/error assertions)."""

import io

import pytest

from fennec_tpu.types import (
    CanceledError,
    Context,
    Format,
    NoCompressedDataError,
    Options,
    Quality,
    Result,
    ValidationError,
    default_options,
    human_bytes,
)


class TestQuality:
    def test_zero_value_is_balanced(self):
        # reference types.go:61, fennec_test.go:1020-1029
        assert Quality(0) == Quality.BALANCED
        assert Options().quality == Quality.BALANCED

    def test_target_ssim_values(self):
        assert Quality.LOSSLESS.target_ssim() == 1.0
        assert Quality.ULTRA.target_ssim() == 0.99
        assert Quality.HIGH.target_ssim() == 0.97
        assert Quality.BALANCED.target_ssim() == 0.94
        assert Quality.AGGRESSIVE.target_ssim() == 0.90
        assert Quality.MAXIMUM.target_ssim() == 0.85

    def test_monotone_ordering(self):
        ordered = [Quality.LOSSLESS, Quality.ULTRA, Quality.HIGH,
                   Quality.BALANCED, Quality.AGGRESSIVE, Quality.MAXIMUM]
        targets = [q.target_ssim() for q in ordered]
        assert targets == sorted(targets, reverse=True)

    def test_strings(self):
        assert str(Quality.BALANCED) == "Balanced"
        assert str(Quality.LOSSLESS) == "Lossless"
        assert str(Format.JPEG) == "JPEG"
        assert str(Format.PNG) == "PNG"
        assert str(Format.AUTO) == "Auto"


class TestOptionsValidate:
    def test_defaults_valid(self):
        default_options().validate()
        Options().validate()

    @pytest.mark.parametrize("field,value", [
        ("max_width", -1),
        ("max_height", -5),
        ("target_ssim", -0.1),
        ("target_ssim", 1.5),
        ("target_size", -100),
    ])
    def test_invalid(self, field, value):
        opts = Options()
        setattr(opts, field, value)
        with pytest.raises(ValidationError):
            opts.validate()

    def test_valid_edge_values(self):
        Options(target_ssim=0.0).validate()
        Options(target_ssim=1.0).validate()
        Options(max_width=0, max_height=0, target_size=0).validate()


class TestResult:
    def test_write_to_empty_raises(self):
        with pytest.raises(NoCompressedDataError):
            Result().write_to(io.BytesIO())

    def test_write_to(self):
        r = Result(compressed_data=b"abc")
        buf = io.BytesIO()
        assert r.write_to(buf) == 3
        assert buf.getvalue() == b"abc"

    def test_compute_stats(self):
        r = Result(original_size=1000, compressed_size=250)
        r.compute_stats()
        assert r.ratio == pytest.approx(4.0)
        assert r.savings_percent == pytest.approx(75.0)

    def test_str_contains_fields(self):
        r = Result(format=Format.JPEG, jpeg_quality=80, ssim=0.95,
                   original_size=1000, compressed_size=100,
                   original_dimensions=(10, 20), final_dimensions=(10, 20))
        r.compute_stats()
        s = str(r)
        assert "JPEG" in s and "Q=80" in s and "0.9500" in s


class TestContext:
    def test_fresh_not_done(self):
        ctx = Context.background()
        assert ctx.err() is None
        assert not ctx.done()

    def test_cancel(self):
        ctx = Context.background().with_cancel()
        ctx.cancel()
        assert isinstance(ctx.err(), CanceledError)
        with pytest.raises(CanceledError):
            ctx.raise_if_done()

    def test_parent_cancel_propagates(self):
        parent = Context.background().with_cancel()
        child = parent.with_cancel()
        parent.cancel()
        assert child.done()

    def test_timeout(self):
        ctx = Context.background().with_timeout(-1.0)
        assert ctx.done()


class TestHumanBytes:
    @pytest.mark.parametrize("n,expected", [
        (0, "0 B"),
        (512, "512 B"),
        (1024, "1.0 KB"),
        (1536, "1.5 KB"),
        (1048576, "1.0 MB"),
        (3 * 1024 * 1024 * 1024, "3.0 GB"),
    ])
    def test_format(self, n, expected):
        assert human_bytes(n) == expected
