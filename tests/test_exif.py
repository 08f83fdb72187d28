"""EXIF orientation parser and applier tests (reference exif.go semantics)."""

import io
import struct

import numpy as np

from conftest import make_test_image
from fennec_tpu.exif import (
    Orientation,
    apply_orientation,
    read_orientation,
    write_exif_orientation,
)


def jpeg_with_orientation(orient: int, little_endian=False) -> bytes:
    """Build a minimal JPEG header containing an EXIF orientation tag."""
    if little_endian:
        e = "<"
        tiff = b"II" + struct.pack("<HI", 42, 8)
    else:
        e = ">"
        tiff = b"MM" + struct.pack(">HI", 42, 8)
    tiff += struct.pack(e + "H", 1)
    tiff += struct.pack(e + "HHIHH", 0x0112, 3, 1, orient, 0)
    tiff += struct.pack(e + "I", 0)
    payload = b"Exif\x00\x00" + tiff
    app1 = b"\xFF\xE1" + struct.pack(">H", len(payload) + 2) + payload
    return b"\xFF\xD8" + app1 + b"\xFF\xDA\x00\x02"


class TestReadOrientation:
    def test_not_jpeg(self):
        assert read_orientation(b"\x89PNG\r\n") == Orientation.NORMAL

    def test_no_exif(self):
        assert read_orientation(b"\xFF\xD8\xFF\xDA\x00\x02") == \
            Orientation.NORMAL

    def test_all_orientations_big_endian(self):
        for o in range(1, 9):
            assert read_orientation(jpeg_with_orientation(o)) == \
                Orientation(o)

    def test_all_orientations_little_endian(self):
        for o in range(1, 9):
            got = read_orientation(
                jpeg_with_orientation(o, little_endian=True))
            assert got == Orientation(o)

    def test_invalid_value_is_normal(self):
        assert read_orientation(jpeg_with_orientation(9)) == \
            Orientation.NORMAL
        assert read_orientation(jpeg_with_orientation(0)) == \
            Orientation.NORMAL

    def test_truncated_stream(self):
        data = jpeg_with_orientation(6)
        for cut in (0, 1, 2, 5, 10, len(data) - 3):
            read_orientation(data[:cut])  # must not raise

    def test_stream_input(self):
        assert read_orientation(
            io.BytesIO(jpeg_with_orientation(3))) == Orientation.ROTATE_180

    def test_skips_other_segments(self):
        app0 = b"\xFF\xE0" + struct.pack(">H", 4) + b"\x00\x00"
        data = b"\xFF\xD8" + app0 + jpeg_with_orientation(6)[2:]
        assert read_orientation(data) == Orientation.ROTATE_90_CW

    def test_writer_roundtrip(self):
        for o in range(1, 9):
            seg = write_exif_orientation(Orientation(o))
            data = b"\xFF\xD8" + seg + b"\xFF\xDA\x00\x02"
            assert read_orientation(data) == Orientation(o)


class TestApplyOrientation:
    def test_normal_identity_object(self):
        img = make_test_image(8, 6)
        assert apply_orientation(img, Orientation.NORMAL) is img

    def test_dimension_swaps(self):
        img = make_test_image(8, 6)  # (6, 8, 4)
        for o in (Orientation.TRANSPOSE, Orientation.ROTATE_90_CW,
                  Orientation.TRANSVERSE, Orientation.ROTATE_270_CW):
            out = apply_orientation(img, o)
            assert out.shape == (8, 6, 4), o

    def test_no_dimension_swap(self):
        img = make_test_image(8, 6)
        for o in (Orientation.FLIP_H, Orientation.ROTATE_180,
                  Orientation.FLIP_V):
            assert apply_orientation(img, o).shape == img.shape

    def test_round_trips(self):
        img = make_test_image(8, 6)
        # 180 twice = identity
        np.testing.assert_array_equal(
            apply_orientation(apply_orientation(img, Orientation.ROTATE_180),
                              Orientation.ROTATE_180), img)
        # flips are involutions
        for o in (Orientation.FLIP_H, Orientation.FLIP_V):
            np.testing.assert_array_equal(
                apply_orientation(apply_orientation(img, o), o), img)

    def test_rotate90_inverse_of_rotate270(self):
        img = make_test_image(8, 6)
        out = apply_orientation(
            apply_orientation(img, Orientation.ROTATE_90_CW),
            Orientation.ROTATE_270_CW)
        np.testing.assert_array_equal(out, img)


class TestPILParity:
    def test_all_corrections_match_pil(self):
        """apply_orientation matches PIL's exif_transpose mapping for
        every orientation — the reference's own exif.go:188-197 swaps
        the 5/7 corrections; we deliberately follow the EXIF standard."""
        from PIL import Image

        pil_ops = {
            2: Image.Transpose.FLIP_LEFT_RIGHT,
            3: Image.Transpose.ROTATE_180,
            4: Image.Transpose.FLIP_TOP_BOTTOM,
            5: Image.Transpose.TRANSPOSE,
            6: Image.Transpose.ROTATE_270,
            7: Image.Transpose.TRANSVERSE,
            8: Image.Transpose.ROTATE_90,
        }
        img = make_test_image(8, 6)
        for o, op in pil_ops.items():
            expect = np.asarray(Image.fromarray(img, "RGBA").transpose(op))
            got = apply_orientation(img, Orientation(o))
            np.testing.assert_array_equal(got, expect, err_msg=f"o={o}")

    def test_xmp_app1_before_exif(self):
        """A non-Exif APP1 (XMP) before the Exif block must not abort
        the orientation scan."""
        from fennec_tpu.exif import read_orientation, \
            write_exif_orientation

        xmp = b"http://ns.adobe.com/xap/1.0/\x00<x:xmpmeta/>"
        app1_xmp = b"\xff\xe1" + (len(xmp) + 2).to_bytes(2, "big") + xmp
        exif_seg = write_exif_orientation(Orientation.ROTATE_90_CW)
        data = b"\xff\xd8" + app1_xmp + exif_seg + b"\xff\xd9"
        assert read_orientation(data) == Orientation.ROTATE_90_CW
