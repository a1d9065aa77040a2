"""Measured hot-cell detection + salted PIP join equivalence on the
skewed synthetic table (20% of rows in 3 hot-spot clusters)."""

import numpy as np

from gis_scripts_spark.index import cells
from gis_scripts_spark.operators import pip_join
from gis_scripts_spark.sources import synth


def test_measure_hot_cells_finds_hotspots(spark):
    df = synth.images_df(spark, 600, parts=4).select("image_id", "lon", "lat")
    hot = pip_join.measure_hot_cells(df, z=7, skew_factor=8.0)
    assert len(hot) >= 1
    # every detected hot cell is one of the seeded hot-spot cluster cells
    spot_cells = {
        int(cells.cell(np.array([cx]), np.array([cy]), 7)[0])
        for cx, cy, _ in synth.HOTSPOTS
    }
    ring = set()
    for c in spot_cells:
        ring |= set(cells.disk(c, 1).tolist())
    assert set(hot) <= ring, (hot, ring)


def test_salted_join_equals_plain(spark):
    df = synth.images_df(spark, 400, parts=4).select("image_id", "lon", "lat")
    polys = synth.aoi_polygons_df(spark)
    hot = pip_join.measure_hot_cells(df, z=7, skew_factor=6.0)
    plain = pip_join.pip_join(df, polys, z=7).select("image_id", "poly_id")
    salted = pip_join.pip_join(df, polys, z=7, salt=8, hot_cells=hot).select(
        "image_id", "poly_id"
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_auto_zoom_picks_sane_resolution(spark):
    polys = synth.aoi_polygons_df(spark)
    z = pip_join.auto_zoom(polys)
    assert 4 <= z <= 10
    # auto mode produces the same pairs as a fixed reasonable zoom
    df = synth.images_df(spark, 200, parts=2).select("image_id", "lon", "lat")
    a = pip_join.pip_join(df, polys, z="auto").select("image_id", "poly_id")
    b = pip_join.pip_join(df, polys, z=7).select("image_id", "poly_id")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
