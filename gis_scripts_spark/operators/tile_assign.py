"""Deterministic raster↔vector tile assignment (SURVEY.md §2.8 R2).

The reference snaps rasters to target-aligned-pixel grids
(``gdalwarp -tap``, ``create_dem_tiles_from_array.py:250-258``) and sizes
block grids per image (``local_match.py:508-542``). Here every row gets
deterministic global tile ids — equirect grid cell, XYZ tile, quadkey,
S2 cell — as pure Column math / one vectorized UDF. No shuffle; tile ids
are identical at any parallelism level (derived from coordinates only,
never from partition index).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from gis_scripts_spark.index import cells as cells_mod
from gis_scripts_spark.index import hex7 as hex7_mod
from gis_scripts_spark.index import s2 as s2_mod
from gis_scripts_spark.index import tiles as tiles_mod


def s2_cell_udf(level: int):
    @F.pandas_udf(LongType())
    def enc(lat: pd.Series, lon: pd.Series) -> pd.Series:
        return pd.Series(s2_mod.cell_id(lat.to_numpy(), lon.to_numpy(), level))

    return enc


def hex7_cell_udf(res: int):
    """Arrow-vectorized hex7 (H3-structure aperture-7 hex) cell encode."""

    @F.pandas_udf(LongType())
    def enc(lon: pd.Series, lat: pd.Series) -> pd.Series:
        return pd.Series(hex7_mod.encode(lon.to_numpy(), lat.to_numpy(), res))

    return enc


def assign_tiles(
    df: DataFrame,
    lon: str = "lon",
    lat: str = "lat",
    grid_z: int = 7,
    tile_z: int = 12,
    s2_level: int | None = 12,
    hex_res: int | None = None,
) -> DataFrame:
    """Append cell/tile id columns: `cell` (grid), `tile_x/tile_y/tile_z`
    + `quadkey` (XYZ Web Mercator), `s2_cell` / `hex_cell` (optional,
    Arrow pandas UDFs — the north rule's "encoded to H3 (and S2) cells")."""
    out = df.withColumn("cell", cells_mod.cell_col(F.col(lon), F.col(lat), grid_z))
    out = tiles_mod.tile_cols(out, lon=lon, lat=lat, z=tile_z)
    if s2_level is not None:
        out = out.withColumn("s2_cell", s2_cell_udf(s2_level)(F.col(lat), F.col(lon)))
    if hex_res is not None:
        out = out.withColumn("hex_cell", hex7_cell_udf(hex_res)(F.col(lon), F.col(lat)))
    return out
