"""Run the documented examples end-to-end (reference example_test.go)."""

import os
import pathlib
import subprocess
import sys

import pytest

REPO = str(pathlib.Path(__file__).resolve().parent.parent)


@pytest.mark.slow
def test_examples_run_clean():
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env["FENNEC_FORCE_CPU"] = "1"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", "basic_usage.py")],
        capture_output=True, text=True, env=env, timeout=500)
    assert r.returncode == 0, r.stderr
    out = r.stdout
    assert "compress_file:" in out
    assert "compress_bytes:" in out
    assert "target_size:" in out
    assert "analyze:" in out
    assert "Batch: 4/4 succeeded" in out
    assert "target_size batch:" in out
    assert "ssim(black, nearly-black)" in out
