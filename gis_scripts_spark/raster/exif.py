"""EXIF APP1 metadata: parse + build (public EXIF 2.x / TIFF 6.0 layout).

The north-star input is GEOTAGGED imagery; a real web-crawl JPEG carries
its geotag inside an EXIF APP1 segment — a little TIFF file (IFD0 ->
GPS sub-IFD holding degree/minute/second RATIONALs), not as table
columns. This module gives the engine that last mile:

- ``exif_parse`` walks the JPEG markers to the APP1 "Exif\\0\\0" segment
  (or accepts a bare TIFF), reuses the geotiff IFD machinery on the
  embedded TIFF (both byte orders), and decodes the GPS rationals with a
  FIXED float evaluation order (deg + min/60 + sec/3600, each rational
  as num/den) so a SQL oracle can replay the decode bit-for-bit;
- ``exif_build`` emits a spec-shaped little-endian segment (IFD0 with
  Orientation/DateTime + GPS sub-IFD) for self-checking roundtrips;
- ``jpeg_with_exif`` splices the segment after SOI — the engine's T.81
  decoder skips APPn, so spliced files stay decodable.

Reference parity: the reference reads image geotags through GDAL's
metadata surface (e.g. the WorldView XML/metadata flow,
``seagrass_lib.py:168-242``); EXIF is the equivalent public container
for crawled imagery.
"""

from __future__ import annotations

import struct

from gis_scripts_spark.raster.geotiff import _first_ifd_offset, _read_ifd_at

_TAG_ORIENTATION = 0x0112
_TAG_DATETIME = 0x0132
_TAG_GPS_IFD = 0x8825
_GPS_LAT_REF, _GPS_LAT = 1, 2
_GPS_LON_REF, _GPS_LON = 3, 4

_EXIF_HDR = b"Exif\x00\x00"


# ------------------------------------------------------------------ build
def _encode_ifd(entries: list[tuple[int, int, object]], base: int) -> bytes:
    """Little-endian classic-TIFF IFD at absolute offset `base`:
    [count][12B entries][next=0][data area]. entries = (tag, type, value);
    type 2 = ascii str, 3 = shorts, 4 = longs, 5 = rationals [(num,den)]."""
    packed = []
    for tag, typ, val in entries:
        if typ == 2:
            data = val.encode("ascii") + b"\x00"
            cnt = len(data)
        elif typ == 3:
            data = struct.pack(f"<{len(val)}H", *val)
            cnt = len(val)
        elif typ == 4:
            data = struct.pack(f"<{len(val)}I", *val)
            cnt = len(val)
        elif typ == 5:
            data = b"".join(struct.pack("<II", n, d) for n, d in val)
            cnt = len(val)
        else:  # pragma: no cover - builder only emits the types above
            raise ValueError(f"unsupported type {typ}")
        packed.append((tag, typ, cnt, data))
    n = len(packed)
    data_off = base + 2 + 12 * n + 4
    table = struct.pack("<H", n)
    tail = b""
    for tag, typ, cnt, data in sorted(packed):
        table += struct.pack("<HHI", tag, typ, cnt)
        if len(data) <= 4:
            table += data.ljust(4, b"\x00")
        else:
            table += struct.pack("<I", data_off + len(tail))
            tail += data
    table += struct.pack("<I", 0)  # next IFD
    return table + tail


def _ifd_size(entries: list[tuple[int, int, object]]) -> int:
    return len(_encode_ifd(entries, 0))


def _dms_rationals(abs_millideg: int) -> list[tuple[int, int]]:
    """Exact D/M/S rationals for |millidegrees|: whole degrees, zero
    minutes, and the sub-degree remainder as seconds = rem_md * 18 / 5
    (rem_md/1000 deg * 3600 sec/deg, reduced)."""
    return [(abs_millideg // 1000, 1), (0, 1), ((abs_millideg % 1000) * 18, 5)]


def exif_build(
    lat_millideg: int,
    lon_millideg: int,
    dt: str | None = None,
    orientation: int = 1,
) -> bytes:
    """APP1 payload ("Exif\\0\\0" + little-endian TIFF) carrying a GPS
    geotag at millidegree resolution plus Orientation and DateTime."""
    gps_entries = [
        (_GPS_LAT_REF, 2, "N" if lat_millideg >= 0 else "S"),
        (_GPS_LAT, 5, _dms_rationals(abs(lat_millideg))),
        (_GPS_LON_REF, 2, "E" if lon_millideg >= 0 else "W"),
        (_GPS_LON, 5, _dms_rationals(abs(lon_millideg))),
    ]
    ifd0_entries = [(_TAG_ORIENTATION, 3, [orientation])]
    if dt is not None:
        ifd0_entries.append((_TAG_DATETIME, 2, dt))
    ifd0_entries.append((_TAG_GPS_IFD, 4, [0]))  # placeholder offset
    gps_off = 8 + _ifd_size(ifd0_entries)
    ifd0_entries[-1] = (_TAG_GPS_IFD, 4, [gps_off])
    tiff = b"II*\x00" + struct.pack("<I", 8)
    tiff += _encode_ifd(ifd0_entries, 8)
    tiff += _encode_ifd(gps_entries, gps_off)
    return _EXIF_HDR + tiff


def exif_geotag_offsets(dt_len: int, with_dt: bool = True) -> dict:
    """Byte offsets of the per-row fields inside an exif_build APP1 whose
    datetime has a FIXED length — the vectorized-batch contract. Offsets
    are DISCOVERED by diffing exif_build outputs (never re-deriving the
    layout), so they cannot drift from the scalar builder."""
    dt0 = "0" * dt_len if with_dt else None
    dt1 = "1" * dt_len if with_dt else None
    base = exif_build(0, 0, dt=dt0, orientation=1)
    offs: dict = {"length": len(base)}

    def _diff1(other: bytes) -> int:
        d = [i for i, (a, b) in enumerate(zip(base, other)) if a != b]
        if not d:
            raise ValueError("no diff found for offset discovery")
        return d[0]

    offs["orient"] = _diff1(exif_build(0, 0, dt=dt0, orientation=2))
    if with_dt:
        offs["dt"] = _diff1(exif_build(0, 0, dt=dt1, orientation=1))
    # lat 1 deg exactly: only the degree numerator (uint32) changes
    offs["lat_deg"] = _diff1(exif_build(1000, 0, dt=dt0, orientation=1))
    # lat 1 millideg: only the seconds numerator changes (= 18)
    offs["lat_sec"] = _diff1(exif_build(1, 0, dt=dt0, orientation=1))
    offs["lat_ref"] = _diff1(exif_build(-1000, 0, dt=dt0, orientation=1))
    offs["lon_deg"] = _diff1(exif_build(0, 1000, dt=dt0, orientation=1))
    offs["lon_sec"] = _diff1(exif_build(0, 1, dt=dt0, orientation=1))
    offs["lon_ref"] = _diff1(exif_build(0, -1000, dt=dt0, orientation=1))
    return offs


def exif_build_batch(
    lat_md: "np.ndarray",
    lon_md: "np.ndarray",
    dts: "np.ndarray | None",
    orients: "np.ndarray",
) -> "np.ndarray":
    """(n, L) uint8 matrix of APP1 payloads, byte-identical to calling
    exif_build per row (asserted on the first row of every batch) — the
    vectorized write path for crawl-scale geotagging. Requires all
    datetimes the same length (the exif_gps fixture shape); falls back to
    the caller's scalar loop otherwise."""
    import numpy as np

    n = len(lat_md)
    with_dt = dts is not None
    dt_len = len(dts[0]) if with_dt else 0
    offs = exif_geotag_offsets(dt_len, with_dt)
    tmpl = np.frombuffer(
        exif_build(0, 0, dt=("0" * dt_len if with_dt else None), orientation=1),
        dtype=np.uint8,
    )
    out = np.broadcast_to(tmpl, (n, len(tmpl))).copy()

    def _u32(col_off: int, vals: np.ndarray) -> None:
        out[:, col_off:col_off + 4] = (
            vals.astype("<u4").view(np.uint8).reshape(n, 4)
        )

    def _u16(col_off: int, vals: np.ndarray) -> None:
        out[:, col_off:col_off + 2] = (
            vals.astype("<u2").view(np.uint8).reshape(n, 2)
        )

    lat_md = np.asarray(lat_md, np.int64)
    lon_md = np.asarray(lon_md, np.int64)
    alat, alon = np.abs(lat_md), np.abs(lon_md)
    _u16(offs["orient"], np.asarray(orients, np.int64))
    _u32(offs["lat_deg"], alat // 1000)
    _u32(offs["lat_sec"], (alat % 1000) * 18)
    out[:, offs["lat_ref"]] = np.where(lat_md >= 0, ord("N"), ord("S"))
    _u32(offs["lon_deg"], alon // 1000)
    _u32(offs["lon_sec"], (alon % 1000) * 18)
    out[:, offs["lon_ref"]] = np.where(lon_md >= 0, ord("E"), ord("W"))
    if with_dt:
        db = np.asarray(dts, dtype=f"S{dt_len}").view(np.uint8).reshape(n, dt_len)
        out[:, offs["dt"]:offs["dt"] + dt_len] = db
    # exactness guard: row 0 must equal the scalar builder bit for bit
    ref0 = exif_build(
        int(lat_md[0]), int(lon_md[0]),
        dt=(str(dts[0]) if with_dt else None), orientation=int(orients[0]),
    )
    if out[0].tobytes() != ref0:
        raise AssertionError("exif_build_batch diverged from exif_build")
    return out


def jpeg_with_exif(jpeg: bytes, app1_payload: bytes) -> bytes:
    """Splice an APP1 segment right after SOI (byte surgery, no pixel
    re-encode; the engine's decoder skips APPn)."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    seg = struct.pack(">HH", 0xFFE1, len(app1_payload) + 2) + app1_payload
    return jpeg[:2] + seg + jpeg[2:]


# ------------------------------------------------------------------ parse
def _find_app1(buf: bytes) -> bytes | None:
    """The APP1 Exif payload of a JPEG, scanning the marker stream from
    SOI (stops at SOS — EXIF precedes entropy data by spec)."""
    if buf[:2] != b"\xff\xd8":
        return None
    i = 2
    while i + 4 <= len(buf):
        if buf[i] != 0xFF:
            return None
        marker = buf[i + 1]
        if marker == 0xD8:
            i += 2
            continue
        if marker in (0xD9, 0xDA):  # EOI / SOS: no APP1 ahead
            return None
        (ln,) = struct.unpack_from(">H", buf, i + 2)
        if marker == 0xE1 and buf[i + 4 : i + 4 + 6] == _EXIF_HDR:
            return bytes(buf[i + 4 : i + 2 + ln])
        i += 2 + ln
    return None


def _rationals(raw: bytes, bo: str) -> list[tuple[int, int]]:
    return [struct.unpack_from(bo + "II", raw, 8 * i) for i in range(len(raw) // 8)]


def _decode_dms(raw: bytes, bo: str, ref: str) -> float:
    """FIXED evaluation order (mirrored by the SQL oracle): each rational
    as num/den IEEE division, then d + m/60 + s/3600, negated for S/W."""
    rs = _rationals(raw, bo)
    d = rs[0][0] / rs[0][1] if len(rs) > 0 else 0.0
    m = rs[1][0] / rs[1][1] if len(rs) > 1 else 0.0
    s = rs[2][0] / rs[2][1] if len(rs) > 2 else 0.0
    deg = d + m / 60.0 + s / 3600.0
    return -deg if ref in ("S", "W") else deg


def apply_orientation(img, orientation: int):
    """Pixels as the scene looked: apply the EXIF display transform
    (TIFF 6.0 / EXIF 2.x orientation 1-8). 1 = as stored; 2 = mirror
    horizontal; 3 = rotate 180; 4 = mirror vertical; 5 = transpose;
    6 = rotate 90 CW; 7 = transverse; 8 = rotate 90 CCW — the standard
    table every viewer implements. Works on (h, w) or (h, w, bands)
    arrays; returns a contiguous copy."""
    import numpy as np

    if orientation in (None, 1):
        return img
    if not 1 <= int(orientation) <= 8:
        raise ValueError(f"EXIF orientation must be 1..8, got {orientation}")
    o = int(orientation)
    if o == 2:
        out = img[:, ::-1]
    elif o == 3:
        out = img[::-1, ::-1]
    elif o == 4:
        out = img[::-1, :]
    else:
        swapped = np.swapaxes(img, 0, 1)
        if o == 5:  # transpose (mirror along the top-left diagonal)
            out = swapped
        elif o == 6:  # rotate 90 CW: out[y][x] = in[h-1-x][y]
            out = swapped[:, ::-1]
        elif o == 7:  # transverse (mirror along the other diagonal)
            out = swapped[::-1, ::-1]
        else:  # 8: rotate 90 CCW: out[y][x] = in[x][w-1-y]
            out = swapped[::-1, :]
    return np.ascontiguousarray(out)


def _find_app1_span(buf: bytes) -> tuple[int, int] | None:
    """(payload_start, segment_end) byte offsets of the APP1 Exif segment
    — the structural region a parse can ever read ends at segment_end."""
    if buf[:2] != b"\xff\xd8":
        return None
    i = 2
    while i + 4 <= len(buf):
        if buf[i] != 0xFF:
            return None
        marker = buf[i + 1]
        if marker == 0xD8:
            i += 2
            continue
        if marker in (0xD9, 0xDA):
            return None
        (ln,) = struct.unpack_from(">H", buf, i + 2)
        if marker == 0xE1 and buf[i + 4 : i + 4 + 6] == _EXIF_HDR:
            return i + 4, i + 2 + ln
        i += 2 + ln
    return None


def _ifd_value_spans(buf: bytes, tiff_base: int, bo: str, off: int) -> dict:
    """{tag: (abs_value_off, typ, cnt)} for a CLASSIC-TIFF IFD at `off`
    (relative to the TIFF header at abs offset `tiff_base`)."""
    (n,) = struct.unpack_from(bo + "H", buf, tiff_base + off)
    ent0 = tiff_base + off + 2
    out: dict = {}
    for i in range(n):
        tag, typ, cnt = struct.unpack_from(bo + "HHI", buf, ent0 + 12 * i)
        size = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}.get(typ, 1) * cnt
        if size <= 4:
            voff = ent0 + 12 * i + 8
        else:
            (rel,) = struct.unpack_from(bo + "I", buf, ent0 + 12 * i + 8)
            voff = tiff_base + rel
        out[tag] = (voff, typ, cnt)
    return out


def exif_parse_batch(bufs: list) -> list:
    """Batch exif_parse: same result per row as exif_parse (None for rows
    that fail to parse, matching the caller's exception handling), but
    rows sharing one STRUCTURE are decoded vectorized (guide §4.2 — the
    crawl-scale shape: one camera/pipeline emits byte-identical layouts).

    Safety: per length-group, the structural bytes (everything inside the
    APP1 region except the value spans of the fields the parser reads)
    must equal row 0's bytes — verified with one vectorized compare; any
    row differing structurally, any zero rational denominator, BigTIFF,
    or a non-JPEG layout falls back to the scalar parser for that row.
    Bytes AFTER the APP1 segment (the entropy-coded image) never
    influence the parse and may differ freely."""
    import numpy as np

    out: list = [None] * len(bufs)

    def scalar(i: int) -> None:
        try:
            out[i] = exif_parse(bufs[i])
        except Exception:
            out[i] = None

    groups: dict[int, list[int]] = {}
    for i, b in enumerate(bufs):
        groups.setdefault(len(b), []).append(i)
    for L, idxs in groups.items():
        if len(idxs) < 4 or L < 12:
            for i in idxs:
                scalar(i)
            continue
        b0 = bytes(bufs[idxs[0]])
        try:
            meta0 = exif_parse(b0)
        except Exception:
            meta0 = None
        span = _find_app1_span(b0)
        if meta0 is None or span is None:
            for i in idxs:
                scalar(i)
            continue
        try:
            pay0, app1_end = span
            tiff_base = pay0 + len(_EXIF_HDR)
            bo = "<" if b0[tiff_base:tiff_base + 2] == b"II" else ">"
            if struct.unpack_from(bo + "H", b0, tiff_base + 2)[0] != 42:
                raise ValueError("BigTIFF: scalar path")
            (ifd0_off,) = struct.unpack_from(bo + "I", b0, tiff_base + 4)
            ifd0 = _ifd_value_spans(b0, tiff_base, bo, ifd0_off)
            spans = []  # (abs_off, nbytes)
            for tag in (_TAG_ORIENTATION, _TAG_DATETIME):
                if tag in ifd0:
                    voff, typ, cnt = ifd0[tag]
                    spans.append((voff, {2: 1, 3: 2}.get(typ, 1) * cnt))
            gps = {}
            if _TAG_GPS_IFD in ifd0:
                (goff,) = struct.unpack_from(bo + "I", b0, ifd0[_TAG_GPS_IFD][0])
                gps = _ifd_value_spans(b0, tiff_base, bo, goff)
                for tag in (_GPS_LAT, _GPS_LON):
                    if tag in gps:
                        spans.append((gps[tag][0], 8 * gps[tag][2]))
                for tag in (_GPS_LAT_REF, _GPS_LON_REF):
                    if tag in gps:
                        spans.append((gps[tag][0], gps[tag][2]))
            mat = np.frombuffer(
                b"".join(bytes(bufs[i]) for i in idxs), np.uint8
            ).reshape(len(idxs), L)
            struct_mask = np.zeros(L, bool)
            struct_mask[:app1_end] = True
            for voff, nb in spans:
                struct_mask[voff:voff + nb] = False
            ok = (mat[:, struct_mask] == mat[0, struct_mask]).all(axis=1)
            u = bo + "u4"
            lat = lon = None
            den_ok = np.ones(len(idxs), bool)
            deg = {}
            for name, tag in (("lat", _GPS_LAT), ("lon", _GPS_LON)):
                rtag = _GPS_LAT_REF if tag == _GPS_LAT else _GPS_LON_REF
                if tag in gps and rtag in gps and meta0.get(name) is not None:
                    voff = gps[tag][0]
                    v = mat[:, voff:voff + 24].copy().view(u).reshape(len(idxs), 6)
                    v = v.astype(np.float64)
                    den_ok &= (v[:, 1] != 0) & (v[:, 3] != 0) & (v[:, 5] != 0)
                    with np.errstate(divide="ignore", invalid="ignore"):
                        d = v[:, 0] / v[:, 1] + (v[:, 2] / v[:, 3]) / 60.0 \
                            + (v[:, 4] / v[:, 5]) / 3600.0
                    roff, _, rcnt = gps[rtag]
                    refraw = mat[:, roff:roff + rcnt]
                    refc = refraw[:, 0]
                    # scalar semantics: the DECODED string must be exactly
                    # "S"/"W" — first byte matches AND the rest are NULs
                    neg = (refc == ord("S")) | (refc == ord("W"))
                    if rcnt > 1:
                        neg &= (refraw[:, 1:] == 0).all(axis=1)
                    deg[name] = np.where(neg, -d, d)
            ok &= den_ok
            ori = None
            if _TAG_ORIENTATION in ifd0 and meta0.get("orientation") is not None:
                voff = ifd0[_TAG_ORIENTATION][0]
                ori = mat[:, voff:voff + 2].copy().view(bo + "u2").ravel()
            dt_span = None
            if _TAG_DATETIME in ifd0 and meta0.get("datetime") is not None:
                dt_span = (ifd0[_TAG_DATETIME][0], ifd0[_TAG_DATETIME][2])
            for row, i in enumerate(idxs):
                if not ok[row]:
                    scalar(i)
                    continue
                dt = None
                if dt_span is not None:
                    raw = mat[row, dt_span[0]:dt_span[0] + dt_span[1]].tobytes()
                    dt = raw.split(b"\0")[0].decode("ascii", "replace")
                out[i] = {
                    "orientation": int(ori[row]) if ori is not None else meta0.get("orientation"),
                    "datetime": dt if dt_span is not None else meta0.get("datetime"),
                    "lat": float(deg["lat"][row]) if "lat" in deg else meta0.get("lat"),
                    "lon": float(deg["lon"][row]) if "lon" in deg else meta0.get("lon"),
                }
        except Exception:
            for i in idxs:
                scalar(i)
    return out


def exif_parse(buf: bytes) -> dict | None:
    """GPS lat/lon (decoded degrees), orientation and datetime from a
    JPEG's APP1 EXIF (or a bare TIFF buffer). None when absent; missing
    individual fields come back as None."""
    buf = bytes(buf)
    if buf[:2] == b"\xff\xd8":
        payload = _find_app1(buf)
        if payload is None:
            return None
        tiff = payload[len(_EXIF_HDR):]
    elif buf[:4] in (b"II*\x00", b"MM\x00*"):
        tiff = buf
    elif buf[:6] == _EXIF_HDR:
        tiff = buf[len(_EXIF_HDR):]
    else:
        return None
    bo = "<" if tiff[:2] == b"II" else ">"
    ifd0, _ = _read_ifd_at(tiff, bo, _first_ifd_offset(tiff, bo))
    out: dict = {
        "orientation": int(ifd0[_TAG_ORIENTATION][0]) if _TAG_ORIENTATION in ifd0 else None,
        "datetime": ifd0[_TAG_DATETIME][0] if _TAG_DATETIME in ifd0 else None,
        "lat": None,
        "lon": None,
    }
    if _TAG_GPS_IFD in ifd0:
        gps, _ = _read_ifd_at(tiff, bo, int(ifd0[_TAG_GPS_IFD][0]))
        if _GPS_LAT in gps and _GPS_LAT_REF in gps:
            out["lat"] = _decode_dms(gps[_GPS_LAT][0], bo, gps[_GPS_LAT_REF][0])
        if _GPS_LON in gps and _GPS_LON_REF in gps:
            out["lon"] = _decode_dms(gps[_GPS_LON][0], bo, gps[_GPS_LON_REF][0])
    return out
