"""Codecs: baseline JPEG (device DCT path) and PNG (host DEFLATE path)."""

from .jpeg import decode_jpeg, encode_jpeg  # noqa: F401
from .png import (  # noqa: F401
    decode_png,
    encode_png_gray,
    encode_png_paletted,
    encode_png_rgb,
    encode_png_rgba,
)


def sniff_format(data: bytes):
    """Return 'jpeg', 'png', or None from magic bytes."""
    if data[:2] == b"\xFF\xD8":
        return "jpeg"
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    return None


def decode_image(data: bytes):
    """Decode JPEG or PNG bytes to (H, W, 4) uint8 NRGBA."""
    fmt = sniff_format(data)
    if fmt == "jpeg":
        return decode_jpeg(data)
    if fmt == "png":
        return decode_png(data)
    from ..types import UnsupportedFormatError
    raise UnsupportedFormatError("fennec: unrecognized image data")
