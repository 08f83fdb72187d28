"""Examples for the five main APIs (reference example_test.go).

Run: python examples/basic_usage.py  (creates outputs in a temp dir)
"""

import os
import tempfile

import numpy as np

import fennec_tpu as fennec
from fennec_tpu.codecs import png as png_codec


def make_demo_photo(path: str) -> None:
    rng = np.random.default_rng(7)
    h, w = 480, 640
    y, x = np.mgrid[0:h, 0:w]
    img = np.zeros((h, w, 4), dtype=np.uint8)
    img[..., 0] = np.clip(120 + 80 * np.sin(x / 60) + rng.normal(0, 8, (h, w)), 0, 255)
    img[..., 1] = np.clip(100 + 80 * np.cos(y / 45) + rng.normal(0, 8, (h, w)), 0, 255)
    img[..., 2] = np.clip((x + y) / 5 + rng.normal(0, 8, (h, w)), 0, 255)
    img[..., 3] = 255
    with open(path, "wb") as f:
        f.write(png_codec.encode_png_rgba(img))


def example_compress_file(src: str, tmp: str) -> None:
    """Simplest usage: compress with defaults (Balanced ⇒ SSIM ≥ 0.94)."""
    result = fennec.compress_file(None, src, os.path.join(tmp, "out.jpg"))
    print("compress_file:", result)


def example_compress_bytes(src: str) -> None:
    """Server-side: bytes in → smaller bytes out."""
    data = open(src, "rb").read()
    result = fennec.compress_bytes(None, data, fennec.Options(
        quality=fennec.HIGH, format=fennec.JPEG))
    print(f"compress_bytes: {len(data)} → {len(result.bytes())} bytes, "
          f"SSIM {result.ssim:.4f}")


def example_target_size(src: str, tmp: str) -> None:
    """Hit an exact byte budget (e.g., an avatar upload limit)."""
    result = fennec.compress_file(
        None, src, os.path.join(tmp, "small.jpg"),
        fennec.Options(target_size=20 * 1024))
    print(f"target_size: {result.compressed_size} bytes "
          f"(target 20480), Q={result.jpeg_quality}")


def example_analyze(src: str) -> None:
    """Inspect an image before deciding how to compress it."""
    stats = fennec.analyze(fennec.open_image(src))
    print(f"analyze: {stats.width}x{stats.height} "
          f"entropy={stats.entropy:.2f} edges={stats.edge_density:.2%} "
          f"→ {stats.recommended_format}/{stats.recommended_quality}")


def example_batch(src: str, tmp: str) -> None:
    """Concurrent batch with progress reporting."""
    items = [fennec.BatchItem(src=src,
                              dst=os.path.join(tmp, f"batch{i}.jpg"))
             for i in range(4)]
    results = fennec.compress_batch(
        None, items,
        fennec.BatchOptions(on_item=lambda done, total: print(
            f"  batch progress {done}/{total}")))
    print("batch:", fennec.summarize(results))


def example_target_size_batch(src: str, tmp: str) -> None:
    """Byte budgets over a whole batch: same-shape buckets run the
    4-strategy search lockstep on device (engine/targetsize_batched.py)."""
    items = [fennec.BatchItem(src=src,
                              dst=os.path.join(tmp, f"ts{i}.jpg"))
             for i in range(4)]
    results = fennec.compress_batch(
        None, items,
        fennec.BatchOptions(default_opts=fennec.Options(
            target_size=20 * 1024)))
    sizes = [r.result.compressed_size for r in results if r.result]
    print(f"target_size batch: sizes={sizes} (target 20480)")


def example_ssim() -> None:
    """Direct metric access."""
    a = np.zeros((64, 64, 4), dtype=np.uint8)
    a[..., 3] = 255
    b = a.copy()
    b[..., 0] = 10
    print(f"ssim(black, nearly-black) = {fennec.ssim(a, b):.4f}")
    print(f"ms_ssim(black, nearly-black) = {fennec.ms_ssim(a, b):.4f}")


if __name__ == "__main__":
    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "demo.png")
        make_demo_photo(src)
        example_compress_file(src, tmp)
        example_compress_bytes(src)
        example_target_size(src, tmp)
        example_analyze(src)
        example_batch(src, tmp)
        example_target_size_batch(src, tmp)
        example_ssim()
