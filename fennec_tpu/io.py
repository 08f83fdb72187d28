"""File I/O: open/save/encode with EXIF orientation handling.

Host-side boundary (reference io.go): file bytes in/out, format dispatch by
extension, EXIF orientation read before decode.
"""

from __future__ import annotations

import os
from typing import BinaryIO, Optional, Tuple

import numpy as np

from .codecs import decode_image
from .codecs import png as png_codec
from .engine.compress import compress_jpeg_optimal, compress_png
from .exif import Orientation, apply_orientation, read_orientation
from .image import to_nrgba, to_nrgba_ref
from .types import Format, Options, UnsupportedFormatError


def open_image(filename: str) -> np.ndarray:
    """Load an image file into (H, W, 4) uint8 NRGBA; EXIF orientation is
    read but NOT applied (reference io.go:17-29).  Use open_and_orient for
    automatic correction."""
    with open(filename, "rb") as f:
        data = f.read()
    return decode_image(data)


def open_and_orient(filename: str) -> np.ndarray:
    """Load an image and correct its EXIF orientation
    (reference io.go:34-61)."""
    with open(filename, "rb") as f:
        data = f.read()
    orient = read_orientation(data)
    img = decode_image(data)
    if orient <= Orientation.NORMAL:
        return img
    return apply_orientation(to_nrgba(img), orient)


def open_with_orientation(filename: str
                          ) -> Tuple[np.ndarray, Orientation, int]:
    """(image, orientation, file size) — used by compress_file
    (reference io.go:65-88)."""
    with open(filename, "rb") as f:
        data = f.read()
    orient = read_orientation(data)
    # len(data) is the authoritative size of the bytes actually
    # compressed (a separate stat would race concurrent writers).
    return decode_image(data), orient, len(data)


def save(img: np.ndarray, filename: str, opts: Optional[Options] = None
         ) -> None:
    """Save with format auto-detected from extension (reference io.go:91-110)."""
    opts = opts if opts is not None else Options()
    ext = os.path.splitext(filename)[1].lower()
    if ext in (".jpg", ".jpeg"):
        fmt = Format.JPEG
    elif ext == ".png":
        fmt = Format.PNG
    else:
        raise UnsupportedFormatError(
            f"fennec: unsupported extension {ext!r} (use .jpg or .png)")
    with open(filename, "wb") as f:
        encode(f, img, fmt, opts)


def encode(w: BinaryIO, img: np.ndarray, fmt: Format,
           opts: Optional[Options] = None) -> None:
    """Write img to w in the given format with fennec optimization
    (reference io.go:113-129)."""
    opts = opts if opts is not None else Options()
    src = to_nrgba_ref(np.asarray(img))
    if fmt == Format.JPEG:
        target = opts.quality.target_ssim()
        if opts.target_ssim > 0:
            target = opts.target_ssim
        _, _, data = compress_jpeg_optimal(src, target, opts)
        w.write(data)
    elif fmt == Format.PNG:
        w.write(compress_png(src, opts))
    else:
        raise UnsupportedFormatError(
            "fennec: unsupported format for encode (use JPEG or PNG)")


def encode_to_bytes(img: np.ndarray, fmt: Format, quality: int) -> bytes:
    """Plain (non-optimizing) encode at a fixed quality
    (reference io.go:131-149)."""
    from .codecs.jpeg import encode_jpeg

    src = to_nrgba_ref(np.asarray(img))
    if fmt == Format.JPEG:
        return encode_jpeg(src, quality if quality > 0 else 75)
    if fmt == Format.PNG:
        return png_codec.encode_png_rgba(src)
    raise UnsupportedFormatError()
