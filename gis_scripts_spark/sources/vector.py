"""Vector source scans from scratch: ESRI Shapefile and GeoPackage ->
polygon tables with WKB geometry columns (SURVEY.md §2.1 S3/S4).

The reference reads both through OGR/geopandas (``seagrass_lib.py:185-192``
polygon shapefiles, GPKG layers elsewhere); no OGR exists in the sandbox,
so these parse the PUBLIC formats directly:
- Shapefile: ESRI Shapefile Technical Description (1998) — .shp record
  structure, Polygon (type 5) and Point (type 1) shapes.
- GeoPackage: OGC GeoPackage 1.x — an SQLite file (stdlib sqlite3) whose
  feature tables store a GeoPackageBinary blob = GP header + standard WKB.

Spark shape: a shapefile/GPKG layer is dimension-side data (the broadcast
side of PIP joins). Files parse via binaryFile + mapInPandas (each file
independent, parallel across files); the output is the engine's standard
(feature_id, wkb [, attributes]) polygon-table shape consumed by
pip_join/coverage_join.
"""

from __future__ import annotations

import sqlite3
import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gis_scripts_spark.geom import wkb as wkb_mod


# ------------------------------------------------------------- shapefile
def parse_shp(buf: bytes) -> pd.DataFrame:
    """.shp bytes -> (feature_id, shape_type, wkb) pandas frame.

    Polygon records (type 5) re-encode rings as WKB polygons (all rings in
    one polygon, reference-parity with OGR's single-feature mapping);
    Point records (type 1) become WKB points. Null shapes (0) are skipped.
    """
    if len(buf) < 100 or struct.unpack_from(">i", buf, 0)[0] != 9994:
        raise ValueError("not a shapefile (.shp)")
    file_len = struct.unpack_from(">i", buf, 24)[0] * 2  # 16-bit words
    rows = []
    off = 100
    while off + 8 <= min(file_len, len(buf)):
        rec_no, content_len = struct.unpack_from(">ii", buf, off)
        off += 8
        shp_type = struct.unpack_from("<i", buf, off)[0]
        if shp_type == 5:  # Polygon
            n_parts, n_points = struct.unpack_from("<ii", buf, off + 36)
            parts = np.frombuffer(buf, "<i4", n_parts, off + 44)
            pts = np.frombuffer(buf, "<f8", n_points * 2, off + 44 + 4 * n_parts)
            xy = pts.reshape(n_points, 2)
            bounds = list(parts) + [n_points]
            rings = [xy[bounds[i] : bounds[i + 1]] for i in range(n_parts)]
            rows.append((rec_no, 5, bytearray(wkb_mod.polygon_to_wkb(rings))))
        elif shp_type == 1:  # Point
            x, y = struct.unpack_from("<dd", buf, off + 4)
            pt = struct.pack("<BIdd", 1, 1, x, y)
            rows.append((rec_no, 1, bytearray(pt)))
        # type 0 (null) and unsupported types are skipped, like ogr warnings
        off += content_len * 2
    return pd.DataFrame(rows, columns=["feature_id", "shape_type", "wkb"])


def parse_dbf(buf: bytes) -> pd.DataFrame:
    """.dbf (dBASE III, the shapefile attribute table per the public dBASE
    spec) -> (feature_id, <attr columns as strings>) pandas frame.

    Reference parity: OGR exposes shapefile attributes as the layer schema
    (the reference copies it field-by-field, ``seagrass_lib.py:467-477``,
    and filters on it via ``SetAttributeFilter("CLASS_NAME = '...'")``
    ``seagrass_lib.py:532``). Field values are returned as stripped strings
    (dBASE stores fixed-width text); numeric casts are one Catalyst
    ``.cast()`` away, keeping the scan schema-stable for Spark. Deleted
    records ('*' flag) keep their slot (feature_id aligns with .shp record
    order) but are marked in the ``_deleted`` column."""
    if len(buf) < 32:
        raise ValueError("not a dBASE file")
    n_rec = struct.unpack_from("<I", buf, 4)[0]
    hdr_size, rec_size = struct.unpack_from("<HH", buf, 8)
    fields = []
    off = 32
    while off < hdr_size - 1 and buf[off] != 0x0D:
        name = buf[off : off + 11].split(b"\0")[0].decode("ascii", "replace")
        ftype = chr(buf[off + 11])
        flen = buf[off + 16]
        fields.append((name, ftype, flen))
        off += 32
    rows = []
    pos = hdr_size
    for rec in range(n_rec):
        if pos + rec_size > len(buf):
            break
        deleted = buf[pos : pos + 1] == b"*"
        vals = {"feature_id": rec + 1, "_deleted": deleted}
        fp = pos + 1
        for name, ftype, flen in fields:
            raw = buf[fp : fp + flen]
            fp += flen
            vals[name] = raw.decode("ascii", "replace").strip() or None
        rows.append(vals)
        pos += rec_size
    cols = ["feature_id", "_deleted"] + [f[0] for f in fields]
    return pd.DataFrame(rows, columns=cols)


def dbf_field_names(buf: bytes) -> list[str]:
    """Field names only (header scan) — used to fix the Spark schema before
    the distributed parse."""
    hdr_size = struct.unpack_from("<H", buf, 8)[0]
    names, off = [], 32
    while off < hdr_size - 1 and buf[off] != 0x0D:
        names.append(buf[off : off + 11].split(b"\0")[0].decode("ascii", "replace"))
        off += 32
    return names


def read_shapefiles(spark: SparkSession, path_glob: str) -> DataFrame:
    """Distributed .shp scan: binaryFile -> parse per file in mapInPandas.
    Returns (path, feature_id, shape_type, wkb)."""
    from pyspark.sql.types import (
        BinaryType,
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("path", StringType(), False),
            StructField("feature_id", IntegerType(), False),
            StructField("shape_type", IntegerType(), False),
            StructField("wkb", BinaryType(), False),
        ]
    )

    def run(batches):
        for pdf in batches:
            outs = []
            for _, row in pdf.iterrows():
                try:
                    feats = parse_shp(bytes(row["content"]))
                except ValueError:
                    continue
                feats.insert(0, "path", str(row["path"]))
                outs.append(feats)
            yield pd.concat(outs) if outs else pd.DataFrame(
                {f.name: [] for f in schema.fields}
            )

    files = spark.read.format("binaryFile").load(path_glob).select("path", "content")
    return files.mapInPandas(run, schema)


# ------------------------------------------------------------ geopackage
_GP_MAGIC = b"GP"


def gpkg_strip_header(blob: bytes) -> bytes:
    """GeoPackageBinary -> the embedded standard WKB (OGC GPKG spec §2.1.3:
    magic 'GP', version, flags byte with envelope-size code, srs_id)."""
    if blob[:2] != _GP_MAGIC:
        raise ValueError("not a GeoPackage geometry blob")
    flags = blob[3]
    env_code = (flags >> 1) & 0x07
    env_len = {0: 0, 1: 32, 2: 48, 3: 48, 4: 64}.get(env_code)
    if env_len is None:
        raise ValueError(f"invalid GPKG envelope code {env_code}")
    return blob[8 + env_len :]


def read_geopackage(
    spark: SparkSession, path: str, table: str | None = None,
    id_col: str | None = None,
) -> DataFrame:
    """GeoPackage layer -> (feature_id, wkb) DataFrame.

    SQLite access is driver-side (a GPKG is one file — the dimension-layer
    scan; attributes beyond the id are easy to add via SELECT *). The
    result is broadcast-sized by contract, exactly like the reference's
    per-script ogr.Open of an AOI layer."""
    con = sqlite3.connect(path)
    try:
        if table is None:
            row = con.execute(
                "SELECT table_name FROM gpkg_contents WHERE data_type='features' LIMIT 1"
            ).fetchone()
            if row is None:
                raise ValueError("no feature table in gpkg_contents")
            table = row[0]
        (geom_col,) = con.execute(
            "SELECT column_name FROM gpkg_geometry_columns WHERE table_name=?", (table,)
        ).fetchone()
        idc = id_col or "rowid"
        rows = con.execute(f'SELECT {idc}, "{geom_col}" FROM "{table}"').fetchall()
    finally:
        con.close()
    pdf = pd.DataFrame(
        [(int(r[0]), bytearray(gpkg_strip_header(bytes(r[1])))) for r in rows if r[1] is not None],
        columns=["feature_id", "wkb"],
    )
    return spark.createDataFrame(pdf) if len(pdf) else spark.createDataFrame(
        pd.DataFrame({"feature_id": pd.Series(dtype=np.int64), "wkb": pd.Series(dtype=object)})
    )


def read_shapefile_attrs(
    spark: SparkSession, path_glob: str, field_names: list[str] | None = None
) -> DataFrame:
    """Distributed .dbf scan: (path, feature_id, _deleted, <fields...>) —
    all attribute columns as strings (cast downstream with Catalyst).
    `field_names` fixes the Spark schema; if None it is inferred from the
    first matching file (one tiny driver-side header read via binaryFile).
    Files missing a field yield nulls; extra fields are dropped —
    the multi-file union rule OGR applies when merging layers."""
    from pyspark.sql.types import (
        BooleanType,
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    files = spark.read.format("binaryFile").load(path_glob).select("path", "content")
    if field_names is None:
        # header-ONLY driver read: dBASE field descriptors live in the
        # first 32 + 32*n_fields + 1 bytes (<= ~8 KB at the 255-field
        # max); substring the binary column so the collect ships a 64 KB
        # prefix, not the whole file (r3 advice: limit(1).collect() on
        # binaryFile rows dragged entire file contents to the driver)
        first = (
            files.select(F.expr("substring(content, 1, 65536)").alias("head"))
            .limit(1)
            .collect()
        )
        if not first:
            raise ValueError(f"no files match {path_glob}")
        field_names = dbf_field_names(bytes(first[0]["head"]))
    schema = StructType(
        [
            StructField("path", StringType(), False),
            StructField("feature_id", IntegerType(), False),
            StructField("_deleted", BooleanType(), False),
        ]
        + [StructField(n, StringType(), True) for n in field_names]
    )
    names = list(field_names)

    def run(batches):
        for pdf in batches:
            outs = []
            for _, row in pdf.iterrows():
                try:
                    attrs = parse_dbf(bytes(row["content"]))
                except ValueError:
                    continue
                for n in names:
                    if n not in attrs.columns:
                        attrs[n] = None
                attrs = attrs[["feature_id", "_deleted"] + names]
                attrs.insert(0, "path", str(row["path"]))
                outs.append(attrs)
            yield pd.concat(outs) if outs else pd.DataFrame(
                {f.name: [] for f in schema.fields}
            )

    return files.mapInPandas(run, schema)


def read_shapefiles_with_attrs(
    spark: SparkSession, shp_glob: str, field_names: list[str] | None = None
) -> DataFrame:
    """Full shapefile scan: geometry (.shp) + attributes (.dbf) joined on
    (layer stem, record number) — the reference's OGR feature view
    (geometry + fields, seagrass_lib.py:467-477). Attribute filters become
    ordinary Catalyst predicates, mirroring SetAttributeFilter
    (seagrass_lib.py:532):

        read_shapefiles_with_attrs(spark, "aoi/*.shp")
            .filter(F.col("CLASS_NAME") == "seagrass")

    Deleted dBASE records are dropped (OGR skips them)."""
    if not shp_glob.endswith(".shp"):
        # a non-.shp glob would silently feed the same (geometry) files to
        # the dBASE parser; fail loudly instead (r3 advice)
        raise ValueError(
            f"shp_glob must end in .shp (got {shp_glob!r}) — the sibling "
            ".dbf glob is derived by suffix substitution"
        )
    dbf_glob = shp_glob[:-4] + ".dbf"
    geom = read_shapefiles(spark, shp_glob).withColumn(
        "_stem", F.regexp_replace(F.col("path"), r"\.shp$", "")
    )
    attrs = read_shapefile_attrs(spark, dbf_glob, field_names).withColumn(
        "_stem", F.regexp_replace(F.col("path"), r"\.dbf$", "")
    ).drop("path")
    out = geom.join(attrs, ["_stem", "feature_id"], "left")
    return (
        out.filter((F.col("_deleted").isNull()) | (~F.col("_deleted")))
        .drop("_stem", "_deleted")
    )
