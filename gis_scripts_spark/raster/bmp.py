"""Windows BMP codec, pure numpy + stdlib (public BITMAPINFOHEADER spec).

- decode: BITMAPFILEHEADER + BITMAPINFO/V4/V5 headers (extra header
  bytes skipped by the declared size), bottom-up AND top-down rows,
  4-byte row padding, 1/4/8-bit paletted, 24-bit BGR, 32-bit BGRX
  (BI_RGB), and BI_RLE8 (run / absolute / EOL / EOD / delta escapes).
  Gray palettes decode to (h, w, 1) — mirrors gif.py so encode->decode
  roundtrips are band-exact; anything else is (h, w, 3) RGB.
  BI_BITFIELDS and BI_RLE4 raise NotImplementedError loudly.
- encode: 24-bit BI_RGB for 3-band, 8-bit gray palette for 1-band.

Entirely numpy except the RLE8 escape walk (sequential by construction).
"""

from __future__ import annotations

import struct

import numpy as np

_BI_RGB = 0
_BI_RLE8 = 1
_BI_RLE4 = 2
_BI_BITFIELDS = 3


def _parse_headers(buf: bytes):
    if buf[:2] != b"BM":
        raise ValueError("not a BMP")
    data_off = struct.unpack_from("<I", buf, 10)[0]
    hsz = struct.unpack_from("<I", buf, 14)[0]
    if hsz < 40:
        raise NotImplementedError(f"BITMAPCOREHEADER ({hsz}) not supported")
    w, h = struct.unpack_from("<ii", buf, 18)
    planes, bpp = struct.unpack_from("<HH", buf, 26)
    comp, _isz = struct.unpack_from("<II", buf, 30)
    clr_used = struct.unpack_from("<I", buf, 46)[0]
    pal = None
    if bpp <= 8:
        n = clr_used or (1 << bpp)
        pal_off = 14 + hsz
        raw = np.frombuffer(buf, np.uint8, n * 4, pal_off).reshape(n, 4)
        pal = raw[:, [2, 1, 0]].copy()  # BGRX -> RGB
    return w, h, bpp, comp, pal, data_off


def _pal_out(idx: np.ndarray, pal: np.ndarray) -> np.ndarray:
    if np.all(pal[:, 0] == pal[:, 1]) and np.all(pal[:, 1] == pal[:, 2]):
        return pal[idx][:, :, :1].copy()
    return pal[idx]


def bmp_decode(buf: bytes) -> np.ndarray:
    buf = bytes(buf)
    w, h, bpp, comp, pal, off = _parse_headers(buf)
    top_down = h < 0
    h = abs(h)
    if comp == _BI_RLE8:
        if bpp != 8:
            raise ValueError("RLE8 requires 8bpp")
        idx = _rle8(buf, off, w, h)
        img = _pal_out(idx, pal)
    elif comp == _BI_RGB:
        stride = ((w * bpp + 31) // 32) * 4
        rows = np.frombuffer(buf, np.uint8, stride * h, off).reshape(h, stride)
        if bpp == 24:
            img = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1].copy()
        elif bpp == 32:
            img = rows[:, : w * 4].reshape(h, w, 4)[:, :, [2, 1, 0]].copy()
        elif bpp == 8:
            img = _pal_out(rows[:, :w].copy(), pal)
        elif bpp == 4:
            nib = np.empty((h, (w + 1) // 2 * 2), dtype=np.uint8)
            nib[:, 0::2] = rows[:, : (w + 1) // 2] >> 4
            nib[:, 1::2] = rows[:, : (w + 1) // 2] & 0x0F
            img = _pal_out(nib[:, :w].copy(), pal)
        elif bpp == 1:
            bits = np.unpackbits(rows, axis=1)
            img = _pal_out(bits[:, :w].copy(), pal)
        else:
            raise NotImplementedError(f"BI_RGB bpp={bpp}")
    elif comp == _BI_RLE4:
        raise NotImplementedError("BI_RLE4 not supported")
    elif comp == _BI_BITFIELDS:
        raise NotImplementedError("BI_BITFIELDS not supported")
    else:
        raise NotImplementedError(f"BMP compression {comp}")
    if not top_down:
        img = img[::-1].copy()
    return img


def _rle8(buf: bytes, off: int, w: int, h: int) -> np.ndarray:
    """BI_RLE8 per the public spec: (count, value) runs; count==0 escapes
    to EOL(0) / EOD(1) / delta(2, dx, dy) / absolute(n literal bytes,
    word-aligned). Rows are stored bottom-up like BI_RGB."""
    idx = np.zeros((h, w), dtype=np.uint8)
    x = y = 0
    i = off
    n = len(buf)
    while i + 1 < n:
        cnt, val = buf[i], buf[i + 1]
        i += 2
        if cnt > 0:
            idx[y, x : x + cnt] = val
            x += cnt
            continue
        if val == 0:  # end of line
            x, y = 0, y + 1
        elif val == 1:  # end of data
            break
        elif val == 2:  # delta
            x += buf[i]
            y += buf[i + 1]
            i += 2
        else:  # absolute run of `val` bytes, padded to 16-bit boundary
            lit = np.frombuffer(buf, np.uint8, val, i)
            idx[y, x : x + val] = lit
            x += val
            i += val + (val & 1)
    return idx  # storage order (row 0 = bottom); caller applies the flip


def bmp_probe_shape(buf: bytes) -> tuple[int, int, int]:
    """(h, w, bands) from the headers (+ palette grayness) only."""
    w, h, bpp, comp, pal, _ = _parse_headers(bytes(buf))
    if comp in (_BI_BITFIELDS, _BI_RLE4):
        raise NotImplementedError(f"BMP compression {comp}")
    if pal is not None and np.all(pal[:, 0] == pal[:, 1]) and np.all(
        pal[:, 1] == pal[:, 2]
    ):
        bands = 1
    else:
        bands = 3
    return abs(h), w, bands


def bmp_encode(img: np.ndarray) -> bytes:
    """3-band -> 24-bit BI_RGB; 1-band -> 8-bit gray palette. uint8 only."""
    if img.ndim == 2:
        img = img[:, :, None]
    if img.dtype != np.uint8:
        raise ValueError("BMP encodes uint8 only")
    h, w, bands = img.shape
    if bands == 3:
        stride = ((w * 3 + 3) // 4) * 4
        rows = np.zeros((h, stride), dtype=np.uint8)
        rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)
        pal = b""
        bpp = 24
    elif bands == 1:
        stride = ((w + 3) // 4) * 4
        rows = np.zeros((h, stride), dtype=np.uint8)
        rows[:, :w] = img[::-1, :, 0]
        g = np.arange(256, dtype=np.uint8)
        pal = np.stack([g, g, g, np.zeros(256, np.uint8)], axis=1).tobytes()
        bpp = 8
    else:
        raise ValueError(f"BMP encodes 1- or 3-band images, got {bands}")
    data = rows.tobytes()
    off = 14 + 40 + len(pal)
    file_hdr = b"BM" + struct.pack("<IHHI", off + len(data), 0, 0, off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, bpp, _BI_RGB, len(data), 2835, 2835,
        256 if pal else 0, 0,
    )
    return file_hdr + info + pal + data
