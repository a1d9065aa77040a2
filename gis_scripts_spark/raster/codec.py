"""Image codecs, pure numpy + stdlib zlib (no PIL/GDAL in the sandbox).

- PNG: real spec-compliant encoder/decoder (8-bit gray / RGB; encoder
  writes filter-0 scanlines; decoder handles all five standard filters).
  This is the lossless path of the input_hint invariant ("decoded pixels
  identical").
- QNT: deterministic lossy codec (6-bit quantization + zlib) — max
  per-pixel error 2 → PSNR ≈ 46 dB; kept as the cheap deterministic lossy
  path.
- JPEG: real from-scratch ITU-T T.81 baseline sequential codec (see
  raster/jpeg.py) — Huffman + DCT encode/decode, 4:4:4 / 4:2:0, restart
  markers, abbreviated streams for JPEG-in-TIFF. The `fmt='jpeg'` column
  of the input_hint schema decodes for real (PSNR >= 40 dB invariant
  verified in tests/test_jpeg.py).
- GIF: real from-scratch GIF87a/89a codec (raster/gif.py) — LSB-first
  variable-width LZW, interlace, transparency, animated multi-frame
  decode with disposal compositing; exact-palette encoder (lossless).
- BMP: BITMAPINFO/V4/V5 decode (1/4/8/24/32-bit BI_RGB + RLE8) and
  24-bit / 8-bit-gray encode (raster/bmp.py).
- phash: classic 64-bit perceptual hash (area-downsample to 32×32, DCT-II,
  top-left 8×8 sans DC, median threshold).

Reference parity: the reference reads multi-band rasters as
(bands, rows, cols) numpy arrays (`global_match.py:146-147`); decode()
returns (h, w, bands) uint8 — band-last, the image-table convention.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def png_encode(img: np.ndarray) -> bytes:
    """img: (h, w) or (h, w, 1|3) uint8 -> PNG bytes (filter 0 rows)."""
    img = np.asarray(img, np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, bands = img.shape
    if bands == 1:
        color_type = 0
    elif bands == 3:
        color_type = 2
    else:
        raise ValueError(f"unsupported band count {bands}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = np.concatenate(
        [np.zeros((h, 1), np.uint8), img.reshape(h, w * bands)], axis=1
    ).tobytes()
    idat = zlib.compress(raw, 6)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def png_decode(buf: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, bands) uint8. Handles filters 0-4, 8-bit
    grayscale/RGB, non-interlaced."""
    if buf[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    off = 8
    w = h = bands = None
    idat = []
    while off < len(buf):
        (length,) = struct.unpack_from(">I", buf, off)
        tag = buf[off + 4 : off + 8]
        payload = buf[off + 8 : off + 8 + length]
        off += 12 + length
        if tag == b"IHDR":
            w, h, depth, color_type, comp, filt, interlace = struct.unpack(">IIBBBBB", payload)
            if depth != 8 or interlace != 0:
                raise ValueError("only 8-bit non-interlaced PNG supported")
            bands = {0: 1, 2: 3}.get(color_type)
            if bands is None:
                raise ValueError(f"unsupported color type {color_type}")
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"IEND":
            break
    raw = zlib.decompress(b"".join(idat))
    stride = w * bands
    raw = np.frombuffer(raw, np.uint8).reshape(h, stride + 1)
    filters = raw[:, 0]
    data = raw[:, 1:].copy()
    bpp = bands
    prev = np.zeros(stride, np.uint8)
    for r in range(h):
        f = filters[r]
        row = data[r]
        if f == 0:
            pass
        elif f == 1:  # Sub
            for x in range(bpp, stride):
                row[x] = (int(row[x]) + int(row[x - bpp])) & 0xFF
        elif f == 2:  # Up
            row += prev
        elif f == 3:  # Average
            for x in range(stride):
                left = int(row[x - bpp]) if x >= bpp else 0
                row[x] = (int(row[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for x in range(stride):
                a = int(row[x - bpp]) if x >= bpp else 0
                c = int(prev[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[x] = (int(row[x]) + pred) & 0xFF
        else:
            raise ValueError(f"bad filter {f}")
        prev = row
    return data.reshape(h, w, bands)


# ------------------------------------------------------------- QNT (lossy)
_QNT_MAGIC = b"QNT1"
_QNT_BITS = 6


def qnt_encode(img: np.ndarray) -> bytes:
    """Deterministic lossy codec: quantize uint8 to 6 bits (max err 2,
    PSNR ≈ 46 dB) + zlib."""
    img = np.asarray(img, np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, bands = img.shape
    shift = 8 - _QNT_BITS
    q = (img >> shift).astype(np.uint8)
    head = _QNT_MAGIC + struct.pack("<HHBB", w, h, bands, _QNT_BITS)
    return head + zlib.compress(q.tobytes(), 6)


def qnt_decode(buf: bytes) -> np.ndarray:
    if buf[:4] != _QNT_MAGIC:
        raise ValueError("not QNT")
    w, h, bands, bits = struct.unpack_from("<HHBB", buf, 4)
    shift = 8 - bits
    q = np.frombuffer(zlib.decompress(buf[10:]), np.uint8).reshape(h, w, bands)
    # dequantize to bin centers
    return ((q.astype(np.uint16) << shift) + (1 << (shift - 1))).clip(0, 255).astype(np.uint8)


# --------------------------------------------------- RAW (typed, lossless)
# The non-uint8 path: the reference's dominant data is int16/float32 GeoTIFF
# with -9999/-32768 nodata sentinels (global_match.py:212, local_match.py:436,
# seagrass_lib.py:244). No GDAL in the sandbox, so RAW1 is the typed lossless
# band container: magic + dtype code + shape + zlib(native-endian pixels).
_RAW_MAGIC = b"RAW1"
_RAW_DTYPES = {0: np.dtype(np.uint8), 1: np.dtype(np.int16), 2: np.dtype(np.float32),
               3: np.dtype(np.float64), 4: np.dtype(np.int32)}
_RAW_CODES = {v: k for k, v in _RAW_DTYPES.items()}


def raw_encode(img: np.ndarray) -> bytes:
    """img: (h, w[, bands]) uint8/int16/int32/float32/float64 -> RAW1 bytes
    (lossless, dtype-preserving)."""
    img = np.asarray(img)
    if img.ndim == 2:
        img = img[:, :, None]
    dt = np.dtype(img.dtype)
    code = _RAW_CODES.get(dt)
    if code is None:
        raise ValueError(f"unsupported raw dtype {dt}")
    h, w, bands = img.shape
    head = _RAW_MAGIC + struct.pack("<BIIB", code, w, h, bands)
    return head + zlib.compress(np.ascontiguousarray(img).tobytes(), 6)


def raw_decode(buf: bytes) -> np.ndarray:
    if buf[:4] != _RAW_MAGIC:
        raise ValueError("not RAW1")
    code, w, h, bands = struct.unpack_from("<BIIB", buf, 4)
    dt = _RAW_DTYPES[code]
    data = np.frombuffer(zlib.decompress(buf[14:]), dt)
    return data.reshape(h, w, bands).copy()


def encode(img: np.ndarray, fmt: str) -> bytes:
    if fmt == "png":
        return png_encode(img)
    if fmt == "qnt":
        return qnt_encode(img)
    if fmt == "raw":
        return raw_encode(img)
    if fmt in ("tif", "tiff", "gtiff"):
        from gis_scripts_spark.raster import geotiff

        return geotiff.tiff_encode(img)
    if fmt == "jpeg":
        from gis_scripts_spark.raster import jpeg

        return jpeg.jpeg_encode(img, quality=92, subsampling="4:4:4")
    if fmt == "jpegp":  # progressive (SOF2) — the dominant web-crawl layout
        from gis_scripts_spark.raster import jpeg

        return jpeg.jpeg_encode_progressive(img, quality=92, subsampling="4:4:4")
    if fmt == "gif":
        from gis_scripts_spark.raster import gif

        return gif.gif_encode(img)
    if fmt == "bmp":
        from gis_scripts_spark.raster import bmp

        return bmp.bmp_encode(img)
    raise ValueError(f"unknown fmt {fmt}")


def decode(buf: bytes, fmt: str | None = None) -> np.ndarray:
    """(h, w, bands) array from encoded bytes; sniffs format if fmt None.
    uint8 for png/qnt; native dtype (int16/float32/...) for raw."""
    head = bytes(buf[:8])
    if fmt == "png" or head.startswith(_PNG_SIG[:4]):
        return png_decode(bytes(buf))
    if fmt == "qnt" or head.startswith(_QNT_MAGIC):
        return qnt_decode(bytes(buf))
    if fmt == "raw" or head.startswith(_RAW_MAGIC):
        return raw_decode(bytes(buf))
    if fmt in ("tif", "tiff", "gtiff") or head[:2] in (b"II", b"MM"):
        from gis_scripts_spark.raster import geotiff

        return geotiff.tiff_decode(bytes(buf))[0]
    if fmt in ("jpeg", "jpegp") or head[:2] == b"\xff\xd8":
        from gis_scripts_spark.raster import jpeg

        return jpeg.jpeg_decode(bytes(buf))
    if fmt == "gif" or head[:4] == b"GIF8":
        from gis_scripts_spark.raster import gif

        return gif.gif_decode(bytes(buf))
    if fmt == "bmp" or head[:2] == b"BM":
        from gis_scripts_spark.raster import bmp

        return bmp.bmp_decode(bytes(buf))
    raise ValueError("unknown image format")


def decode_window(
    buf: bytes, fmt: str | None, x0: int, y0: int, w: int, h: int
) -> np.ndarray:
    """Windowed decode: pixels [y0:y0+h, x0:x0+w] only. For TIFF this is
    the COG access path — only the strips/tiles intersecting the window
    are decompressed (see geotiff.tiff_decode_window), so cropping 256 px
    from a multi-GB raster does bounded work. Other codecs (PNG/QNT/RAW —
    whole-image zlib streams with no random access by design) decode
    fully and crop."""
    head = bytes(buf[:8])
    if fmt in ("tif", "tiff", "gtiff") or head[:2] in (b"II", b"MM"):
        from gis_scripts_spark.raster import geotiff

        return geotiff.tiff_decode_window(bytes(buf), x0, y0, w, h)[0]
    # same out-of-bounds contract as the TIFF path (r4 advice): validate
    # against the header shape before slicing instead of silently
    # returning a truncated/empty array
    ih, iw, _b = probe_shape(buf, fmt)
    if not (0 <= x0 and 0 <= y0 and x0 + w <= iw and y0 + h <= ih):
        raise ValueError(f"window [{x0}:{x0+w}) x [{y0}:{y0+h}) outside {iw}x{ih}")
    return decode(buf, fmt)[y0 : y0 + h, x0 : x0 + w]


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    mse = float(np.mean((a - b) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)


# ------------------------------------------------------------------- phash
def _dct_matrix(n: int) -> np.ndarray:
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    m = np.cos(np.pi * (2 * i + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
    m[0] /= np.sqrt(2.0)
    return m

_DCT32 = _dct_matrix(32)


def phash64(img: np.ndarray) -> int:
    """Classic pHash: grayscale -> area-resample 32×32 -> 2-D DCT-II ->
    top-left 8×8 minus DC -> median threshold -> 64-bit int."""
    img = np.asarray(img, np.float64)
    if img.ndim == 3:
        img = img.mean(axis=2)
    h, w = img.shape
    # exact area duplication/averaging onto a 32x32 grid
    ry = np.floor(np.arange(32) * h / 32).astype(np.int64)
    rx = np.floor(np.arange(32) * w / 32).astype(np.int64)
    small = img[np.ix_(ry, rx)] if (h < 32 or w < 32) else _area_resize32(img)
    d = _DCT32 @ small @ _DCT32.T
    block = d[:8, :8].flatten()[1:]
    med = np.median(block)
    bits = block > med
    val = 0
    for b in bits:
        val = (val << 1) | int(b)
    # two's-complement int64
    return val - (1 << 64) if val >= (1 << 63) else val


def _area_resize32(img: np.ndarray) -> np.ndarray:
    return _area_resize(img, 32)


def _area_resize(img: np.ndarray, n: int) -> np.ndarray:
    h, w = img.shape
    if h % n == 0 and w % n == 0:
        return img.reshape(n, h // n, n, w // n).mean(axis=(1, 3))
    ry = np.floor(np.arange(n) * h / n).astype(np.int64)
    rx = np.floor(np.arange(n) * w / n).astype(np.int64)
    return img[np.ix_(ry, rx)]


_DCT64 = _dct_matrix(64)


def phash256(img: np.ndarray) -> list[int]:
    """256-bit pHash (the documented 10^12-row image-dedup scale knob —
    wider bands at the same hamming threshold): grayscale -> area-resample
    64×64 -> 2-D DCT-II -> low-frequency 16×16 block -> median threshold
    (imagehash's hash_size=16 formulation: the DC term stays in the block,
    the median makes it one bit like any other). Returns 4 int64 words;
    global bit k = flattened-block position k, packed MSB-first within
    word k // 64 (same packing style as phash64)."""
    img = np.asarray(img, np.float64)
    if img.ndim == 3:
        img = img.mean(axis=2)
    h, w = img.shape
    ry = np.floor(np.arange(64) * h / 64).astype(np.int64)
    rx = np.floor(np.arange(64) * w / 64).astype(np.int64)
    small = img[np.ix_(ry, rx)] if (h < 64 or w < 64) else _area_resize(img, 64)
    d = _DCT64 @ small @ _DCT64.T
    block = d[:16, :16].flatten()
    bits = block > np.median(block)
    words = []
    for j in range(4):
        val = 0
        for b in bits[64 * j : 64 * (j + 1)]:
            val = (val << 1) | int(b)
        words.append(val - (1 << 64) if val >= (1 << 63) else val)
    return words


def probe_dtype(buf: bytes, fmt: str | None = None) -> np.dtype:
    """Dtype of the encoded image from its HEADER only — no pixel decode.
    Lets group kernels (mosaic dtype promotion) inspect every source
    cheaply and decode one image at a time."""
    head = bytes(buf[:16])
    if fmt == "png" or head.startswith(_PNG_SIG[:4]):
        return np.dtype(np.uint8)
    if fmt == "qnt" or head.startswith(_QNT_MAGIC):
        return np.dtype(np.uint8)
    if fmt in ("jpeg", "jpegp") or head[:2] == b"\xff\xd8":
        return np.dtype(np.uint8)
    if fmt == "gif" or head[:4] == b"GIF8":
        return np.dtype(np.uint8)
    if fmt == "bmp" or head[:2] == b"BM":
        return np.dtype(np.uint8)
    if fmt == "raw" or head.startswith(_RAW_MAGIC):
        return _RAW_DTYPES[head[4]]
    if fmt in ("tif", "tiff", "gtiff") or head[:2] in (b"II", b"MM"):
        from gis_scripts_spark.raster import geotiff

        bo = "<" if head[:2] == b"II" else ">"
        t = geotiff._read_ifd(bytes(buf), bo)
        bits = int(t.get(geotiff.TAG_BITS, [8])[0])
        sfmt = int(t.get(geotiff.TAG_SAMPLE_FORMAT, [1])[0])
        return np.dtype({1: "u", 2: "i", 3: "f"}.get(sfmt, "u") + str(bits // 8))
    raise ValueError("unknown image format")


def probe_shape(buf: bytes, fmt: str | None = None) -> tuple[int, int, int]:
    """(h, w, bands) of the encoded image from its HEADER only — no pixel
    decode. Lets group kernels (mosaic band-count validation) inspect every
    source cheaply before committing to a canvas layout."""
    head = bytes(buf[:33])
    if fmt == "png" or head.startswith(_PNG_SIG[:4]):
        # IHDR payload starts at byte 16: width, height (u32be), depth, color
        w, h = struct.unpack_from(">II", head, 16)
        color_type = head[25]
        bands = {0: 1, 2: 3}.get(color_type)
        if bands is None:
            raise ValueError(f"unsupported color type {color_type}")
        return int(h), int(w), bands
    if fmt == "qnt" or head.startswith(_QNT_MAGIC):
        w, h, bands, _bits = struct.unpack_from("<HHBB", head, 4)
        return int(h), int(w), int(bands)
    if fmt == "raw" or head.startswith(_RAW_MAGIC):
        _code, w, h, bands = struct.unpack_from("<BIIB", head, 4)
        return int(h), int(w), int(bands)
    if fmt in ("jpeg", "jpegp") or head[:2] == b"\xff\xd8":
        from gis_scripts_spark.raster import jpeg

        return jpeg.probe_jpeg_shape(bytes(buf))
    if fmt == "gif" or head[:4] == b"GIF8":
        from gis_scripts_spark.raster import gif

        return gif.gif_probe_shape(bytes(buf))
    if fmt == "bmp" or head[:2] == b"BM":
        from gis_scripts_spark.raster import bmp

        return bmp.bmp_probe_shape(bytes(buf))
    if fmt in ("tif", "tiff", "gtiff") or head[:2] in (b"II", b"MM"):
        from gis_scripts_spark.raster import geotiff

        bo = "<" if head[:2] == b"II" else ">"
        t = geotiff._read_ifd(bytes(buf), bo)
        return (
            int(t[geotiff.TAG_HEIGHT][0]),
            int(t[geotiff.TAG_WIDTH][0]),
            int(t.get(geotiff.TAG_SAMPLES_PER_PIXEL, [1])[0]),
        )
    raise ValueError("unknown image format")
