"""Band-level table layout — the engine's ``append_band_to_tif``
create-or-update (S9; ``raster/seamless_mosaic/global_match.py:204-285``:
the reference opens the output TIF if it exists and appends one band,
else creates it — per-BAND restart granularity).

Spark-native shape: instead of updating a file in place (no in-place
updates in an immutable-snapshot world), the band is the ROW. A stage that
produces one band commits it as its own snapshot with a ``band:<k>`` stage
key (sources/snaptable.py gives the idempotent skip — exactly the
reference's open-if-exists check), and the multi-band image is assembled
relationally at read time. Restarting a 7-of-8-bands-done job re-runs ONE
band, like the reference.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from gis_scripts_spark.raster import codec
from gis_scripts_spark.sources import snaptable

BAND_ROW_SCHEMA = StructType(
    [
        StructField("image_id", StringType(), False),
        StructField("band", IntegerType(), False),
        StructField("bytes", BinaryType(), False),
        StructField("w", IntegerType(), False),
        StructField("h", IntegerType(), False),
        StructField("fmt", StringType(), False),
    ]
)


def split_bands(images: DataFrame) -> DataFrame:
    """Multi-band image rows -> one row per (image_id, band), each carrying
    a single-band RAW1 payload (dtype-preserving). Map-local: decode once,
    emit bands; bytes never shuffle."""

    def run(batches):
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                img = codec.decode(bytes(row["bytes"]), row["fmt"])
                for b in range(img.shape[2]):
                    rows.append(
                        (row["image_id"], b,
                         bytearray(codec.raw_encode(img[:, :, b])),
                         img.shape[1], img.shape[0], "raw")
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in BAND_ROW_SCHEMA.fields])

    return images.select("image_id", "bytes", "fmt").mapInPandas(run, BAND_ROW_SCHEMA)


def assemble_bands(band_rows: DataFrame) -> DataFrame:
    """(image_id, band, bytes) rows -> multi-band image rows (bands stacked
    in band order; duplicate band rows keep the LAST committed — the
    reference's update-in-place semantics). One groupBy on image_id: the
    single shuffle this layout pays, linear in data."""

    def merge(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("band").drop_duplicates("band", keep="last")
        bands = [codec.decode(bytes(r["bytes"]), r["fmt"])[:, :, 0]
                 for _, r in pdf.iterrows()]
        img = np.stack(bands, axis=2)
        return pd.DataFrame(
            [(key[0], bytearray(codec.raw_encode(img)),
              img.shape[1], img.shape[0], img.shape[2], "raw")],
            columns=["image_id", "bytes", "w", "h", "bands", "fmt"],
        )

    out_schema = StructType(
        [
            StructField("image_id", StringType(), False),
            StructField("bytes", BinaryType(), False),
            StructField("w", IntegerType(), False),
            StructField("h", IntegerType(), False),
            StructField("bands", IntegerType(), False),
            StructField("fmt", StringType(), False),
        ]
    )
    return band_rows.groupBy("image_id").applyInPandas(merge, out_schema)


def append_band_snapshot(band_df: DataFrame, table: str, band: int) -> dict:
    """Commit one band's rows as a snapshot with stage key ``band:<k>`` —
    re-running the stage is a NO-OP (snaptable idempotence), giving the
    reference's create-or-update restart granularity per band."""
    return snaptable.write_snapshot(band_df, table, stage=f"band:{band}")


def read_assembled(spark: SparkSession, table: str) -> DataFrame:
    """Read every committed band snapshot and assemble multi-band images."""
    return assemble_bands(snaptable.read_snapshot(spark, table))
