"""Slippy-map XYZ tiles + quadkeys (Web Mercator), deterministic tile IDs.

Re-expresses the reference's target-aligned-pixel tiling
(``gdalwarp -tap``, ``create_dem_tiles_from_array.py:250-258``;
block grid ``local_match.py:508-542``) as the standard public XYZ scheme:

    x = floor((lon + 180) / 360 * 2^z)
    y = floor((1 - asinh(tan(lat_rad)) / pi) / 2 * 2^z)

and Bing-style quadkeys (one base-4 digit per zoom level, digit =
2*bit(y) + bit(x)).

Column flavor is pure JVM math (no UDF); numpy flavor backs the pytest
oracles (FIXTURES.md §3).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

WEBMERC_LAT_MAX = 85.05112878


# ---------------------------------------------------------------- Column API
def tile_xy_col(lon: Column, lat: Column, z: int) -> tuple[Column, Column]:
    n = 1 << z
    lat_c = F.greatest(F.lit(-WEBMERC_LAT_MAX), F.least(F.lit(WEBMERC_LAT_MAX), lat))
    lat_rad = F.radians(lat_c)
    x = F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(float(n)))
    y = F.floor(
        (F.lit(1.0) - F.asinh(F.tan(lat_rad)) / F.lit(float(np.pi))) / F.lit(2.0) * F.lit(float(n))
    )
    x = F.greatest(F.lit(0), F.least(F.lit(n - 1), x)).cast("int")
    y = F.greatest(F.lit(0), F.least(F.lit(n - 1), y)).cast("int")
    return x, y


def quadkey_col(x: Column, y: Column, z: int) -> Column:
    """Quadkey string from tile x/y at zoom z — built from z digit
    expressions (constant-unrolled, still whole-stage codegen)."""
    digits = []
    for i in range(z - 1, -1, -1):
        bx = F.shiftright(x.cast("long"), i).bitwiseAND(F.lit(1))
        by = F.shiftright(y.cast("long"), i).bitwiseAND(F.lit(1))
        digits.append((by * F.lit(2) + bx).cast("string"))
    return F.concat(*digits) if digits else F.lit("")


def tile_id_col(x: Column, y: Column, z: int) -> Column:
    """Packed int64 tile id: (z << 58) | (x << 29) | y — bijective with
    (z, x, y) for z <= 29, so the quadkey STRING is derivable on demand.
    This is the production-scale identifier: at 10^12 rows a 12-char
    quadkey costs 12+ bytes of heap churn per row (measurably GC-bound at
    high thread counts), while the packed id is 8 flat bytes inside
    whole-stage codegen."""
    return (
        F.lit(z).cast("long") * F.lit(1 << 58)
        + x.cast("long") * F.lit(1 << 29)
        + y.cast("long")
    )


def tile_cols(df, lon: str = "lon", lat: str = "lat", z: int = 12, prefix: str = "tile"):
    """Append tile_z/tile_x/tile_y/tile_id/quadkey columns. No shuffle.
    Catalyst prunes whichever id flavor downstream doesn't read."""
    x, y = tile_xy_col(F.col(lon), F.col(lat), z)
    return (
        df.withColumn(f"{prefix}_z", F.lit(z))
        .withColumn(f"{prefix}_x", x)
        .withColumn(f"{prefix}_y", y)
        .withColumn(f"{prefix}_id", tile_id_col(F.col(f"{prefix}_x"), F.col(f"{prefix}_y"), z))
        .withColumn("quadkey", quadkey_col(F.col(f"{prefix}_x"), F.col(f"{prefix}_y"), z))
    )


# ----------------------------------------------------------------- numpy API
def tile_xy(lon, lat, z: int):
    n = 1 << z
    lon = np.asarray(lon, np.float64)
    lat = np.clip(np.asarray(lat, np.float64), -WEBMERC_LAT_MAX, WEBMERC_LAT_MAX)
    lat_rad = np.radians(lat)
    x = np.floor((lon + 180.0) / 360.0 * n).astype(np.int64)
    y = np.floor((1.0 - np.arcsinh(np.tan(lat_rad)) / np.pi) / 2.0 * n).astype(np.int64)
    np.clip(x, 0, n - 1, out=x)
    np.clip(y, 0, n - 1, out=y)
    return x, y


def quadkey(x, y, z: int) -> np.ndarray:
    x = np.asarray(x, np.int64)
    y = np.asarray(y, np.int64)
    out = np.full(x.shape, "", dtype=object)
    for i in range(z - 1, -1, -1):
        d = ((y >> i) & 1) * 2 + ((x >> i) & 1)
        out = np.char.add(out.astype(str), d.astype(str)).astype(object)
    return out.astype(str)


def quadkey_to_xyz(qk: str) -> tuple[int, int, int]:
    z = len(qk)
    x = y = 0
    for ch in qk:
        d = int(ch)
        x = (x << 1) | (d & 1)
        y = (y << 1) | (d >> 1)
    return z, x, y


def tile_id(x, y, z: int) -> np.ndarray:
    """numpy mirror of tile_id_col (pytest oracle)."""
    return (np.int64(z) << 58) + (np.asarray(x, np.int64) << 29) + np.asarray(y, np.int64)


def tile_id_to_xyz(tid: int) -> tuple[int, int, int]:
    """Inverse of tile_id: (z, x, y)."""
    tid = int(tid)
    return tid >> 58, (tid >> 29) & ((1 << 29) - 1), tid & ((1 << 29) - 1)
