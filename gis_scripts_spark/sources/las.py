"""LAS 1.2 point-cloud scan (SURVEY.md §2.1 S5), pure numpy + struct per
the public ASPRS LAS 1.2 specification — no laspy/PDAL in the sandbox.

Reference parity: the point_cloud/ scripts read LAS through laspy/PDAL and
filter ground points by classification before gridding
(``point_cloud/create_dem_tiles_from_array.py:224-241`` — class==2 ->
DEM interpolation). This scan feeds the same downstream path:
``read_las(...).filter(F.col("classification") == 2)`` -> operators.idw.

Supported: LAS 1.x little-endian; point record formats 0-3 (core 20-byte
record; +GPS time for 1/3; +RGB for 2/3). Coordinates are descaled to
doubles via the header's scale/offset. Extra per-record bytes (record
length > format size) are skipped, as the spec allows.

Spark shape: one file per task via binaryFile -> vectorized
np.frombuffer(structured dtype) in mapInPandas; files parse in parallel,
points never pass through Python loops.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_FMT_SIZES = {0: 20, 1: 28, 2: 26, 3: 34}

LAS_SCHEMA = StructType(
    [
        StructField("path", StringType(), False),
        StructField("point_id", LongType(), False),
        StructField("x", DoubleType(), False),
        StructField("y", DoubleType(), False),
        StructField("z", DoubleType(), False),
        StructField("intensity", IntegerType(), False),
        StructField("return_num", IntegerType(), False),
        StructField("num_returns", IntegerType(), False),
        StructField("classification", IntegerType(), False),
        StructField("point_source_id", IntegerType(), False),
        StructField("gps_time", DoubleType(), True),
        StructField("red", IntegerType(), True),
        StructField("green", IntegerType(), True),
        StructField("blue", IntegerType(), True),
    ]
)


def _point_dtype(fmt: int, rec_len: int) -> np.dtype:
    fields = [
        ("X", "<i4"), ("Y", "<i4"), ("Z", "<i4"),
        ("intensity", "<u2"), ("flags", "u1"), ("classification", "u1"),
        ("scan_angle", "i1"), ("user_data", "u1"), ("point_source_id", "<u2"),
    ]
    if fmt in (1, 3):
        fields.append(("gps_time", "<f8"))
    if fmt in (2, 3):
        fields += [("red", "<u2"), ("green", "<u2"), ("blue", "<u2")]
    base = _FMT_SIZES[fmt]
    if rec_len > base:  # spec-allowed extra bytes per record
        fields.append(("_extra", f"V{rec_len - base}"))
    return np.dtype(fields)


def parse_las(buf: bytes) -> pd.DataFrame:
    """LAS bytes -> point table with descaled double coordinates."""
    buf = bytes(buf)
    if buf[:4] != b"LASF":
        raise ValueError("not a LAS file")
    ver_major, ver_minor = buf[24], buf[25]
    if ver_major != 1:
        raise ValueError(f"unsupported LAS version {ver_major}.{ver_minor}")
    if buf[104] & 0x80:  # compressed (LAZ): route to the chunked codec
        from gis_scripts_spark.sources import laz as _laz

        return _laz.parse_laz(buf)
    (pt_off,) = struct.unpack_from("<I", buf, 96)
    fmt = buf[104] & 0x3F
    (rec_len,) = struct.unpack_from("<H", buf, 105)
    (n_pts,) = struct.unpack_from("<I", buf, 107)
    sx, sy, sz = struct.unpack_from("<3d", buf, 131)
    ox, oy, oz = struct.unpack_from("<3d", buf, 155)
    if fmt not in _FMT_SIZES:
        raise NotImplementedError(f"LAS point format {fmt} not supported (0-3 only)")
    dt = _point_dtype(fmt, rec_len)
    avail = (len(buf) - pt_off) // rec_len
    n = min(n_pts, avail)
    pts = np.frombuffer(buf, dt, count=n, offset=pt_off)
    flags = pts["flags"]
    out = pd.DataFrame(
        {
            "point_id": np.arange(n, dtype=np.int64),
            "x": pts["X"] * sx + ox,
            "y": pts["Y"] * sy + oy,
            "z": pts["Z"] * sz + oz,
            "intensity": pts["intensity"].astype(np.int32),
            "return_num": (flags & 0x07).astype(np.int32),
            "num_returns": ((flags >> 3) & 0x07).astype(np.int32),
            # LAS 1.2 packs synthetic/key-point/withheld in the top 3 bits
            "classification": (pts["classification"] & 0x1F).astype(np.int32),
            "point_source_id": pts["point_source_id"].astype(np.int32),
        }
    )
    out["gps_time"] = pts["gps_time"].astype(np.float64) if fmt in (1, 3) else None
    for c in ("red", "green", "blue"):
        out[c] = pts[c].astype(np.int32) if fmt in (2, 3) else None
    return out


def read_las(spark: SparkSession, path_glob: str) -> DataFrame:
    """Distributed LAS scan: (path, point_id, x, y, z, intensity,
    return_num, num_returns, classification, point_source_id, gps_time?,
    red?, green?, blue?). One file per task; unreadable files are skipped
    (OGR/laspy warning behavior)."""
    files = spark.read.format("binaryFile").load(path_glob).select("path", "content")

    def run(batches):
        for pdf in batches:
            outs = []
            for _, row in pdf.iterrows():
                try:
                    pts = parse_las(bytes(row["content"]))
                except (ValueError, NotImplementedError):
                    continue
                pts.insert(0, "path", str(row["path"]))
                outs.append(pts)
            yield pd.concat(outs) if outs else pd.DataFrame(
                {f.name: [] for f in LAS_SCHEMA.fields}
            )

    return files.mapInPandas(run, LAS_SCHEMA)


def write_las(
    path: str,
    x: np.ndarray,
    y: np.ndarray,
    z: np.ndarray,
    classification: np.ndarray,
    intensity: np.ndarray | None = None,
    scale: float = 0.001,
    offset: tuple = (0.0, 0.0, 0.0),
) -> None:
    """Minimal LAS 1.2 point-format-0 writer (the sink analogue of the
    scan; vectorized struct pack). Coordinates are quantized to
    `scale`/`offset` per the spec."""
    n = len(x)
    rec_len = _FMT_SIZES[0]
    hdr = bytearray(227)
    hdr[0:4] = b"LASF"
    hdr[24], hdr[25] = 1, 2
    struct.pack_into("<H", hdr, 94, 227)
    struct.pack_into("<I", hdr, 96, 227)
    hdr[104] = 0
    struct.pack_into("<H", hdr, 105, rec_len)
    struct.pack_into("<I", hdr, 107, n)
    struct.pack_into("<3d", hdr, 131, scale, scale, scale)
    struct.pack_into("<3d", hdr, 155, *offset)
    struct.pack_into("<6d", hdr, 179, float(np.max(x)), float(np.min(x)),
                     float(np.max(y)), float(np.min(y)),
                     float(np.max(z)), float(np.min(z)))
    pts = np.zeros(n, _point_dtype(0, rec_len))
    pts["X"] = np.round((np.asarray(x) - offset[0]) / scale).astype(np.int32)
    pts["Y"] = np.round((np.asarray(y) - offset[1]) / scale).astype(np.int32)
    pts["Z"] = np.round((np.asarray(z) - offset[2]) / scale).astype(np.int32)
    pts["intensity"] = (np.zeros(n, np.uint16) if intensity is None
                        else np.asarray(intensity, np.uint16))
    pts["flags"] = 0b00001001  # return 1 of 1
    pts["classification"] = np.asarray(classification, np.uint8)
    pts["point_source_id"] = 1
    with open(path, "wb") as f:
        f.write(bytes(hdr) + pts.tobytes())
