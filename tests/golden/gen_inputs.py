"""Generate deterministic PNG input pairs for the Go-golden parity pack.

Run from the repo root:  python tests/golden/gen_inputs.py
Writes tests/golden/inputs/*.png — bit-exact across runs (seeded numpy,
lossless PNG).  The Go generator (main.go) reads these same files, so
both implementations score IDENTICAL pixels.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("FENNEC_FORCE_CPU", "1")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

from conftest import (  # noqa: E402
    make_noise_image,
    make_solid_image,
    make_striped_image,
    make_test_image,
    make_test_image_with_alpha,
)

from fennec_tpu.codecs.png import encode_png_rgba  # noqa: E402


def jpeg_degrade(arr: np.ndarray, quality: int) -> np.ndarray:
    """Round-trip through our JPEG codec at a fixed quality — produces a
    deterministic 'compressed-looking' pair partner (saved as PNG so the
    Go side decodes identical pixels with no codec variance)."""
    from fennec_tpu.codecs.jpeg import decode_jpeg, encode_jpeg

    return decode_jpeg(encode_jpeg(arr, quality))


def main() -> None:
    out = os.path.join(os.path.dirname(__file__), "inputs")
    os.makedirs(out, exist_ok=True)
    images = {
        "gradient_256x192": make_test_image(256, 192),
        "gradient_100x80": make_test_image(100, 80),
        "striped_128x128": make_striped_image(128, 128),
        "noise_120x90": make_noise_image(120, 90, seed=3),
        "solid_64x64": make_solid_image(64, 64, 90, 140, 200),
        "alpha_96x72": make_test_image_with_alpha(96, 72),
        "tiny_7x5": make_test_image(7, 5),
        "gray_48x48": make_solid_image(48, 48, 77, 77, 77),
    }
    for name, arr in list(images.items()):
        if name.startswith(("gradient", "striped", "noise")):
            images[name + "_q50"] = jpeg_degrade(arr, 50)
            images[name + "_q85"] = jpeg_degrade(arr, 85)
    for name, arr in images.items():
        path = os.path.join(out, f"{name}.png")
        with open(path, "wb") as f:
            f.write(encode_png_rgba(arr))
        print("wrote", path)


if __name__ == "__main__":
    main()
