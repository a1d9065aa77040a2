"""Minimal GeoTIFF codec, pure numpy + stdlib zlib (no GDAL/rasterio/PIL in
the sandbox) — closes the reference's dominant container format
(every reference script reads/writes .tif via gdal/rasterio, e.g.
``global_match.py:146-147,212``, ``seagrass_lib.py:244``).

Supported (the subset the reference's data actually uses):
- read: little/big endian classic TIFF; strip or tile organization;
  compression none (1) or DEFLATE (8/32946); 8/16/32-bit unsigned,
  signed and 32/64-bit float samples (SampleFormat 1/2/3); chunky planar
  config; band-interleaved pixels -> (h, w, bands)
- write: little-endian, chunky, strips, compression none or DEFLATE
- GeoTIFF geo-referencing: ModelPixelScale (33550) + ModelTiepoint (33922)
  and the GDAL nodata ASCII tag (42113) survive a roundtrip

Format reference: TIFF 6.0 specification (Adobe, public) + OGC GeoTIFF 1.1.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8, 11: 4, 12: 8}
_TYPE_FMT = {3: "H", 4: "I", 8: "h", 9: "i", 11: "f", 12: "d"}

TAG_WIDTH = 256
TAG_HEIGHT = 257
TAG_BITS = 258
TAG_COMPRESSION = 259
TAG_PHOTOMETRIC = 262
TAG_STRIP_OFFSETS = 273
TAG_SAMPLES_PER_PIXEL = 277
TAG_ROWS_PER_STRIP = 278
TAG_STRIP_COUNTS = 279
TAG_PLANAR = 284
TAG_PREDICTOR = 317
TAG_SAMPLE_FORMAT = 339
TAG_TILE_WIDTH = 322
TAG_TILE_LENGTH = 323
TAG_TILE_OFFSETS = 324
TAG_TILE_COUNTS = 325
TAG_MODEL_PIXEL_SCALE = 33550
TAG_MODEL_TIEPOINT = 33922
TAG_GDAL_NODATA = 42113


def _read_ifd(buf: bytes, bo: str):
    (off,) = struct.unpack_from(bo + "I", buf, 4)
    (n,) = struct.unpack_from(bo + "H", buf, off)
    tags: dict[int, list] = {}
    for i in range(n):
        tag, typ, cnt = struct.unpack_from(bo + "HHI", buf, off + 2 + 12 * i)
        size = _TYPE_SIZES.get(typ, 1) * cnt
        if size <= 4:
            data_off = off + 2 + 12 * i + 8
        else:
            (data_off,) = struct.unpack_from(bo + "I", buf, off + 2 + 12 * i + 8)
        if typ in _TYPE_FMT:
            vals = list(struct.unpack_from(bo + str(cnt) + _TYPE_FMT[typ], buf, data_off))
        elif typ == 2:  # ascii
            vals = [buf[data_off : data_off + cnt].split(b"\0")[0].decode("ascii", "replace")]
        else:
            vals = [buf[data_off : data_off + size]]
        tags[tag] = vals
    return tags


def _dtype_of(bits: int, fmt: int, bo: str) -> np.dtype:
    kind = {1: "u", 2: "i", 3: "f"}.get(fmt, "u")
    dt = np.dtype(f"{kind}{bits // 8}")
    return dt.newbyteorder("<" if bo == "<" else ">")


def tiff_decode(buf: bytes) -> tuple[np.ndarray, dict]:
    """TIFF bytes -> ((h, w, bands) array in native byte order, meta dict
    with pixel_scale / tiepoint / nodata when present)."""
    buf = bytes(buf)
    if buf[:2] == b"II":
        bo = "<"
    elif buf[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("not a TIFF")
    if struct.unpack_from(bo + "H", buf, 2)[0] != 42:
        raise ValueError("not a classic TIFF")
    t = _read_ifd(buf, bo)
    w = int(t[TAG_WIDTH][0])
    h = int(t[TAG_HEIGHT][0])
    spp = int(t.get(TAG_SAMPLES_PER_PIXEL, [1])[0])
    bits = int(t.get(TAG_BITS, [8])[0])
    comp = int(t.get(TAG_COMPRESSION, [1])[0])
    fmt = int(t.get(TAG_SAMPLE_FORMAT, [1])[0])
    planar = int(t.get(TAG_PLANAR, [1])[0])
    if planar != 1:
        raise ValueError("only chunky planar config supported")
    if comp not in (1, 8, 32946):
        raise NotImplementedError(f"TIFF compression {comp} not supported (none/deflate only)")
    predictor = int(t.get(TAG_PREDICTOR, [1])[0])
    if predictor not in (1, 2):
        # 3 = floating-point byte-shuffle differencing; fail loudly instead
        # of silently decoding garbage (GDAL writes PREDICTOR=2/3 DEFLATE)
        raise NotImplementedError(f"TIFF predictor {predictor} not supported (none/horizontal only)")
    dt = _dtype_of(bits, fmt, bo)

    def undo_predictor(arr: np.ndarray) -> np.ndarray:
        """Undo horizontal differencing (predictor 2, TIFF 6.0 §14): each
        row stores per-sample deltas vs the previous column; the inverse is
        a modular cumsum along the width axis. Rows restart at each
        strip/tile's left edge, which both callers respect."""
        if predictor != 2:
            return arr
        acc = np.cumsum(arr.astype(np.int64), axis=1)
        return acc.astype(arr.dtype)  # wraps mod 2^bits, matching the delta encode

    def blocks(offsets, counts):
        for o, c in zip(offsets, counts):
            raw = buf[int(o) : int(o) + int(c)]
            yield zlib.decompress(raw) if comp in (8, 32946) else raw

    if TAG_TILE_OFFSETS in t:
        tw = int(t[TAG_TILE_WIDTH][0])
        th = int(t[TAG_TILE_LENGTH][0])
        out = np.zeros((h, w, spp), dt.newbyteorder("="))
        tiles_x = (w + tw - 1) // tw
        for idx, data in enumerate(blocks(t[TAG_TILE_OFFSETS], t[TAG_TILE_COUNTS])):
            ty, tx = divmod(idx, tiles_x)
            arr = np.frombuffer(data, dt, count=tw * th * spp).reshape(th, tw, spp)
            arr = undo_predictor(arr.astype(dt.newbyteorder("=")))
            y0, x0 = ty * th, tx * tw
            hh, ww = min(th, h - y0), min(tw, w - x0)
            out[y0 : y0 + hh, x0 : x0 + ww] = arr[:hh, :ww]
        return out, _geo_meta(t)
    rps = int(t.get(TAG_ROWS_PER_STRIP, [h])[0])
    parts = []
    for data in blocks(t[TAG_STRIP_OFFSETS], t[TAG_STRIP_COUNTS]):
        parts.append(np.frombuffer(data, dt))
    flat = np.concatenate(parts)[: h * w * spp]
    _ = rps
    img = flat.reshape(h, w, spp).astype(dt.newbyteorder("="))
    # strips are full-width rows, so per-row differencing never crosses a
    # strip boundary — the whole-image cumsum is exact
    return undo_predictor(img), _geo_meta(t)


def _geo_meta(t: dict) -> dict:
    meta: dict = {}
    if TAG_MODEL_PIXEL_SCALE in t:
        meta["pixel_scale"] = tuple(float(v) for v in t[TAG_MODEL_PIXEL_SCALE][:3])
    if TAG_MODEL_TIEPOINT in t:
        meta["tiepoint"] = tuple(float(v) for v in t[TAG_MODEL_TIEPOINT][:6])
    if TAG_GDAL_NODATA in t:
        try:
            meta["nodata"] = float(str(t[TAG_GDAL_NODATA][0]).strip())
        except ValueError:
            pass
    return meta


def tiff_encode(
    img: np.ndarray,
    compress: bool = True,
    pixel_scale: tuple | None = None,
    tiepoint: tuple | None = None,
    nodata: float | None = None,
    predictor: int = 1,
) -> bytes:
    """(h, w[, bands]) uint8/16/32, int8/16/32, float32/64 -> little-endian
    classic TIFF (chunky, one strip per 64 rows, optional DEFLATE).
    predictor=2 writes horizontal differencing (integer dtypes only), the
    layout GDAL commonly emits with DEFLATE."""
    img = np.asarray(img)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, spp = img.shape
    dt = img.dtype
    if dt.kind not in "uif":
        raise ValueError(f"unsupported dtype {dt}")
    if predictor not in (1, 2):
        raise ValueError("predictor must be 1 (none) or 2 (horizontal)")
    if predictor == 2 and dt.kind == "f":
        raise ValueError("predictor 2 applies to integer samples only")
    fmt = {"u": 1, "i": 2, "f": 3}[dt.kind]
    bits = dt.itemsize * 8
    if predictor == 2:
        d = img.astype(np.int64)
        d[:, 1:] -= img[:, :-1].astype(np.int64)
        img = d.astype(dt)  # wraps mod 2^bits; decode cumsum inverts exactly
    le = img.astype(dt.newbyteorder("<"))

    rps = min(64, h)
    strips = []
    for y0 in range(0, h, rps):
        raw = np.ascontiguousarray(le[y0 : y0 + rps]).tobytes()
        strips.append(zlib.compress(raw, 6) if compress else raw)

    entries: list[tuple[int, int, int, object]] = [
        (TAG_WIDTH, 4, 1, w),
        (TAG_HEIGHT, 4, 1, h),
        (TAG_BITS, 3, spp, [bits] * spp),
        (TAG_COMPRESSION, 3, 1, 8 if compress else 1),
        (TAG_PHOTOMETRIC, 3, 1, 1),
        (TAG_SAMPLES_PER_PIXEL, 3, 1, spp),
        (TAG_ROWS_PER_STRIP, 4, 1, rps),
        (TAG_PLANAR, 3, 1, 1),
        (TAG_SAMPLE_FORMAT, 3, spp, [fmt] * spp),
    ]
    if predictor == 2:
        entries.append((TAG_PREDICTOR, 3, 1, 2))
    if pixel_scale is not None:
        entries.append((TAG_MODEL_PIXEL_SCALE, 12, 3, list(pixel_scale)[:3]))
    if tiepoint is not None:
        entries.append((TAG_MODEL_TIEPOINT, 12, 6, list(tiepoint)[:6]))
    if nodata is not None:
        nd = (repr(float(nodata)) + "\0").encode()
        entries.append((TAG_GDAL_NODATA, 2, len(nd), nd))
    n_strips = len(strips)
    entries.append((TAG_STRIP_OFFSETS, 4, n_strips, "STRIP_OFFSETS"))
    entries.append((TAG_STRIP_COUNTS, 4, n_strips, [len(s) for s in strips]))
    entries.sort(key=lambda e: e[0])

    # layout: header(8) | IFD | overflow values | strip data
    ifd_off = 8
    ifd_size = 2 + 12 * len(entries) + 4
    overflow_off = ifd_off + ifd_size
    overflow = bytearray()

    def value_bytes(typ, cnt, val):
        if typ == 2:
            return bytes(val)
        if typ == 12:
            return struct.pack("<" + str(cnt) + "d", *val)
        fmtc = _TYPE_FMT[typ]
        vals = val if isinstance(val, (list, tuple)) else [val]
        return struct.pack("<" + str(cnt) + fmtc, *vals)

    # strip offsets resolved after overflow size is known: two passes
    placeholder = {}
    packed_entries = []
    for tag, typ, cnt, val in entries:
        if val == "STRIP_OFFSETS":
            vb = b"\0" * (4 * n_strips)
            placeholder[tag] = True
        else:
            vb = value_bytes(typ, cnt, val)
        if len(vb) <= 4:
            packed_entries.append((tag, typ, cnt, vb.ljust(4, b"\0"), None))
        else:
            packed_entries.append((tag, typ, cnt, None, len(overflow)))
            overflow += vb
    data_off = overflow_off + len(overflow)
    # actual strip offsets
    offs = []
    pos = data_off
    for s in strips:
        offs.append(pos)
        pos += len(s)
    strip_off_bytes = struct.pack("<" + str(n_strips) + "I", *offs)
    # patch: rebuild overflow with real strip offsets
    out_entries = []
    overflow2 = bytearray()
    for (tag, typ, cnt, inline, ov_pos), (otag, otyp, ocnt, oval) in zip(packed_entries, entries):
        if oval == "STRIP_OFFSETS":
            vb = strip_off_bytes
        elif inline is not None:
            out_entries.append((tag, typ, cnt, inline))
            continue
        else:
            vb = value_bytes(otyp, ocnt, oval)
        if len(vb) <= 4:
            out_entries.append((tag, typ, cnt, vb.ljust(4, b"\0")))
        else:
            out_entries.append((tag, typ, cnt, struct.pack("<I", overflow_off + len(overflow2))))
            overflow2 += vb
    assert len(overflow2) == len(overflow)

    head = b"II" + struct.pack("<HI", 42, ifd_off)
    ifd = struct.pack("<H", len(out_entries))
    for tag, typ, cnt, four in out_entries:
        ifd += struct.pack("<HHI", tag, typ, cnt) + four
    ifd += struct.pack("<I", 0)
    return head + ifd + bytes(overflow2) + b"".join(strips)
