"""BMP codec exactness (raster/bmp.py) — hand-packed spec vectors +
roundtrips. The RLE8 vector is the canonical example from the public
BITMAPINFOHEADER documentation."""

import struct

import numpy as np
import pytest

from gis_scripts_spark.raster import codec
from gis_scripts_spark.raster.bmp import bmp_decode, bmp_encode, bmp_probe_shape


def _headers(w, h, bpp, comp, pal=b"", data_len=0):
    off = 14 + 40 + len(pal)
    fh = b"BM" + struct.pack("<IHHI", off + data_len, 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, bpp, comp, data_len,
                       2835, 2835, len(pal) // 4, 0)
    return fh + info + pal


def _gray_pal(n=256):
    g = np.arange(n, dtype=np.uint8)
    return np.stack([g, g, g, np.zeros(n, np.uint8)], axis=1).tobytes()


class TestHandPacked:
    def test_24bit_bottom_up_with_padding(self):
        # 2x2, stride 8 (2 px * 3 B = 6, padded to 8); rows bottom-up, BGR
        rows = (bytes([30, 20, 10]) + bytes([60, 50, 40]) + b"\x00\x00"   # bottom
                + bytes([3, 2, 1]) + bytes([6, 5, 4]) + b"\x00\x00")      # top
        buf = _headers(2, 2, 24, 0, data_len=len(rows)) + rows
        want = np.array([[[1, 2, 3], [4, 5, 6]],
                         [[10, 20, 30], [40, 50, 60]]], dtype=np.uint8)
        assert np.array_equal(bmp_decode(buf), want)

    def test_top_down_negative_height(self):
        rows = (bytes([3, 2, 1]) + bytes([6, 5, 4]) + b"\x00\x00"
                + bytes([30, 20, 10]) + bytes([60, 50, 40]) + b"\x00\x00")
        buf = _headers(2, -2, 24, 0, data_len=len(rows)) + rows
        want = np.array([[[1, 2, 3], [4, 5, 6]],
                         [[10, 20, 30], [40, 50, 60]]], dtype=np.uint8)
        assert np.array_equal(bmp_decode(buf), want)

    def test_32bit_bgrx(self):
        rows = bytes([3, 2, 1, 0, 6, 5, 4, 0])
        buf = _headers(2, 1, 32, 0, data_len=len(rows)) + rows
        want = np.array([[[1, 2, 3], [4, 5, 6]]], dtype=np.uint8)
        assert np.array_equal(bmp_decode(buf), want)

    def test_8bit_color_palette(self):
        pal = bytes([0, 0, 255, 0,  0, 255, 0, 0,  255, 0, 0, 0])  # RGB in BGRX
        rows = bytes([0, 1, 2, 0])  # stride 4
        buf = _headers(3, 1, 8, 0, pal=pal, data_len=len(rows)) + rows
        want = np.array([[[255, 0, 0], [0, 255, 0], [0, 0, 255]]], dtype=np.uint8)
        assert np.array_equal(bmp_decode(buf), want)

    def test_4bit_and_1bit(self):
        pal4 = _gray_pal(16)
        rows4 = bytes([0x12, 0x30, 0x00])  # 3 px: 1,2,3; padded to stride 4
        buf4 = _headers(3, 1, 4, 0, pal=pal4, data_len=4) + rows4 + b"\x00"
        assert np.array_equal(bmp_decode(buf4), np.array([[[1], [2], [3]]], np.uint8))

        pal1 = bytes([0, 0, 0, 0, 255, 255, 255, 0])
        rows1 = bytes([0b10100000, 0, 0, 0])  # 3 px: 1,0,1
        buf1 = _headers(3, 1, 1, 0, pal=pal1, data_len=4) + rows1
        assert np.array_equal(
            bmp_decode(buf1), np.array([[[255], [0], [255]]], np.uint8))

    def test_rle8_spec_example(self):
        # The documented BI_RLE8 example: runs, absolute mode (word-
        # padded), delta (+5,+1), end-of-line, end-of-bitmap
        rle = bytes([
            0x03, 0x04,                    # 04 04 04
            0x05, 0x06,                    # 06 x5
            0x00, 0x03, 0x45, 0x56, 0x67, 0x00,  # absolute: 45 56 67 (pad)
            0x02, 0x78,                    # 78 78
            0x00, 0x02, 0x05, 0x01,        # delta +5 x, +1 y
            0x02, 0x78,                    # 78 78
            0x00, 0x00,                    # end of line
            0x09, 0x1E,                    # 1E x9
            0x00, 0x01,                    # end of bitmap
        ])
        buf = _headers(20, 3, 8, 1, pal=_gray_pal(), data_len=len(rle)) + rle
        want = np.zeros((3, 20), dtype=np.uint8)
        want[0, :13] = [4, 4, 4, 6, 6, 6, 6, 6, 0x45, 0x56, 0x67, 0x78, 0x78]
        want[1, 18:20] = 0x78          # after delta
        want[2, :9] = 0x1E             # row after EOL
        # storage rows are bottom-up -> flip for image order
        assert np.array_equal(bmp_decode(buf)[:, :, 0], want[::-1])

    def test_unsupported_raise(self):
        buf = _headers(2, 2, 32, 3, data_len=16) + b"\x00" * 16
        with pytest.raises(NotImplementedError):
            bmp_decode(buf)
        with pytest.raises(ValueError):
            bmp_decode(b"XX" + b"\x00" * 60)


class TestRoundtrip:
    def test_rgb(self):
        rng = np.random.RandomState(2)
        img = rng.randint(0, 256, size=(33, 21, 3)).astype(np.uint8)
        assert np.array_equal(bmp_decode(bmp_encode(img)), img)

    def test_gray_one_band(self):
        rng = np.random.RandomState(5)
        img = rng.randint(0, 256, size=(17, 19, 1)).astype(np.uint8)
        out = bmp_decode(bmp_encode(img))
        assert out.shape == img.shape
        assert np.array_equal(out, img)

    def test_probe_shape(self):
        img = np.zeros((9, 11, 3), dtype=np.uint8)
        assert bmp_probe_shape(bmp_encode(img)) == (9, 11, 3)
        g = np.zeros((9, 11, 1), dtype=np.uint8)
        assert bmp_probe_shape(bmp_encode(g)) == (9, 11, 1)


class TestCodecDispatch:
    def test_encode_decode_and_sniff(self):
        rng = np.random.RandomState(8)
        img = rng.randint(0, 256, size=(12, 14, 3)).astype(np.uint8)
        buf = codec.encode(img, "bmp")
        assert np.array_equal(codec.decode(buf), img)  # magic sniff
        assert codec.probe_shape(buf) == (12, 14, 3)
        assert codec.probe_dtype(buf) == np.uint8
        got = codec.decode_window(buf, "bmp", 2, 3, 5, 6)
        assert np.array_equal(got, img[3:9, 2:7])
