"""CLI end-to-end tests: real subprocess invocations of python -m fennec_tpu
(reference cmd/fennec/main_test.go drives the built binary the same way)."""

import os
import pathlib
import subprocess
import sys

import numpy as np
import pytest

from conftest import make_noise_image, make_test_image
from fennec_tpu.cli import default_output, parse_format, parse_quality, parse_size
from fennec_tpu.codecs import png as png_codec
from fennec_tpu.types import Format, Quality

REPO = str(pathlib.Path(__file__).resolve().parent.parent)


def run_cli(*args, cwd=None):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO
    env["FENNEC_FORCE_CPU"] = "1"
    return subprocess.run(
        [sys.executable, "-m", "fennec_tpu", *args],
        capture_output=True, text=True, cwd=cwd or REPO, env=env,
        timeout=300)


@pytest.fixture(scope="module")
def photo_png(tmp_path_factory):
    p = tmp_path_factory.mktemp("cli") / "photo.png"
    p.write_bytes(png_codec.encode_png_rgba(make_noise_image(96, 72, seed=1)))
    return str(p)


class TestParseSize:
    # reference cmd/fennec/main_test.go:272-308
    @pytest.mark.parametrize("s,expected", [
        ("", 0), ("0", 0), ("100", 100), ("51200", 51200),
        ("100KB", 102400), ("2MB", 2 * 1024 * 1024),
        ("1.5MB", int(1.5 * 1024 * 1024)), ("1GB", 1024 ** 3),
        ("100kb", 102400), ("5B", 5), ("0.5KB", 512),
    ])
    def test_valid(self, s, expected):
        assert parse_size(s) == expected

    @pytest.mark.parametrize("s", ["abc", "12XB", "KB"])
    def test_invalid(self, s):
        with pytest.raises(ValueError):
            parse_size(s)


class TestParsers:
    def test_quality(self):
        assert parse_quality("ultra") == Quality.ULTRA
        assert parse_quality("MAX") == Quality.MAXIMUM
        assert parse_quality("junk") == Quality.BALANCED

    def test_format(self):
        assert parse_format("jpg") == Format.JPEG
        assert parse_format("PNG") == Format.PNG
        assert parse_format("whatever") == Format.AUTO

    def test_default_output(self):
        assert default_output("a/b/photo.jpg") == "a/b/photo_fennec.jpg"
        assert default_output("x.png") == "x_fennec.jpg"
        assert default_output("noext") == "noext_fennec.jpg"


@pytest.mark.slow
class TestCLIEndToEnd:
    def test_basic_compression(self, photo_png, tmp_path):
        out = str(tmp_path / "out.jpg")
        r = run_cli(photo_png, out)
        assert r.returncode == 0, r.stderr
        assert os.path.exists(out)
        assert "SSIM" in r.stdout

    def test_analyze_mode(self, photo_png):
        r = run_cli("--analyze", photo_png)
        assert r.returncode == 0, r.stderr
        assert "Image Analysis" in r.stdout
        assert "Entropy" in r.stdout

    def test_quality_flag(self, photo_png, tmp_path):
        hi = str(tmp_path / "hi.jpg")
        lo = str(tmp_path / "lo.jpg")
        assert run_cli("--quality", "ultra", "--format", "jpeg",
                       photo_png, hi).returncode == 0
        assert run_cli("--quality", "maximum", "--format", "jpeg",
                       photo_png, lo).returncode == 0
        assert os.path.getsize(hi) >= os.path.getsize(lo)

    def test_max_width(self, photo_png, tmp_path):
        out = str(tmp_path / "small.jpg")
        r = run_cli("--max-width", "48", "--format", "jpeg", photo_png, out)
        assert r.returncode == 0, r.stderr
        from fennec_tpu.codecs import decode_image
        img = decode_image(open(out, "rb").read())
        assert img.shape[1] == 48

    def test_target_size(self, photo_png, tmp_path):
        out = str(tmp_path / "ts.jpg")
        r = run_cli("--target-size", "4KB", photo_png, out)
        assert r.returncode == 0, r.stderr
        assert os.path.getsize(out) <= 8 * 1024

    def test_verbose(self, photo_png, tmp_path):
        r = run_cli("-v", photo_png, str(tmp_path / "v.jpg"))
        assert r.returncode == 0
        assert "Fennec Result" in r.stdout
        # -v also prints the per-stage wall-time table (StageTimer).
        assert "Stages:" in r.stderr
        assert "ms avg" in r.stderr

    def test_missing_input_error(self, tmp_path):
        r = run_cli(str(tmp_path / "missing.png"), str(tmp_path / "o.jpg"))
        assert r.returncode == 1
        assert "Error" in r.stderr

    def test_bad_ssim_flag(self, photo_png, tmp_path):
        r = run_cli("--ssim", "1.5", photo_png, str(tmp_path / "o.jpg"))
        assert r.returncode == 1

    def test_no_args_usage(self):
        r = run_cli()
        assert r.returncode != 0


@pytest.mark.slow
class TestCLIBatchMode:
    def test_batch_directory(self, tmp_path):
        from fennec_tpu.codecs.jpeg import encode_jpeg
        indir = tmp_path / "in"
        indir.mkdir()
        for i in range(3):
            (indir / f"p{i}.jpg").write_bytes(
                encode_jpeg(make_noise_image(48, 48, seed=i), 92))
        outdir = tmp_path / "out"
        r = run_cli("--batch", "--format", "jpeg", str(indir), str(outdir))
        assert r.returncode == 0, r.stderr
        assert "3/3 succeeded" in r.stdout
        assert sorted(os.listdir(outdir)) == ["p0.jpg", "p1.jpg", "p2.jpg"]

    def test_batch_skip_existing(self, tmp_path):
        from fennec_tpu.codecs.jpeg import encode_jpeg
        indir = tmp_path / "in"
        indir.mkdir()
        (indir / "a.jpg").write_bytes(
            encode_jpeg(make_noise_image(32, 32, seed=0), 92))
        outdir = tmp_path / "out"
        outdir.mkdir()
        (outdir / "a.jpg").write_bytes(b"placeholder")
        r = run_cli("--batch", "--skip-existing", "--format", "jpeg",
                    str(indir), str(outdir))
        assert r.returncode == 0, r.stderr
        assert (outdir / "a.jpg").read_bytes() == b"placeholder"

    def test_batch_not_a_directory(self, tmp_path):
        r = run_cli("--batch", str(tmp_path / "nope"), str(tmp_path / "o"))
        assert r.returncode == 1
