"""LAS 1.2 scan (S5): hand-built fixture -> parse oracle -> class filter ->
IDW grid vs brute force (the point_cloud/create_dem_tiles_from_array.py
flow, :224-241)."""

import struct

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from gis_scripts_spark.index import cells
from gis_scripts_spark.operators import idw
from gis_scripts_spark.sources import las


def _las_file(x, y, z, classification, fmt=0, scale=0.001, offset=(0.0, 0.0, 0.0),
              gps_time=None, rgb=None, extra_bytes=0) -> bytes:
    """Minimal LAS 1.2 writer for fixtures (little-endian, no VLRs)."""
    n = len(x)
    rec_len = las._FMT_SIZES[fmt] + extra_bytes
    hdr = bytearray(227)
    hdr[0:4] = b"LASF"
    hdr[24] = 1
    hdr[25] = 2
    struct.pack_into("<H", hdr, 94, 227)       # header size
    struct.pack_into("<I", hdr, 96, 227)       # offset to point data
    hdr[104] = fmt
    struct.pack_into("<H", hdr, 105, rec_len)
    struct.pack_into("<I", hdr, 107, n)
    struct.pack_into("<3d", hdr, 131, scale, scale, scale)
    struct.pack_into("<3d", hdr, 155, *offset)
    body = bytearray()
    for i in range(n):
        xi = int(round((x[i] - offset[0]) / scale))
        yi = int(round((y[i] - offset[1]) / scale))
        zi = int(round((z[i] - offset[2]) / scale))
        flags = (1 & 0x07) | ((1 & 0x07) << 3)  # return 1 of 1
        rec = struct.pack("<iiiHBBbBH", xi, yi, zi, 100 + i, flags,
                          int(classification[i]), 0, 0, 7)
        if fmt in (1, 3):
            rec += struct.pack("<d", (gps_time[i] if gps_time is not None else 0.0))
        if fmt in (2, 3):
            r, g, b = rgb[i] if rgb is not None else (0, 0, 0)
            rec += struct.pack("<HHH", r, g, b)
        rec += b"\0" * extra_bytes
        body += rec
    return bytes(hdr) + bytes(body)


def test_parse_las_format0_descale():
    rng = np.random.default_rng(0)
    x = rng.uniform(100.0, 101.0, 50)
    y = rng.uniform(200.0, 201.0, 50)
    z = rng.uniform(10.0, 50.0, 50)
    cls = rng.integers(1, 6, 50)
    buf = _las_file(x, y, z, cls, fmt=0, scale=0.001, offset=(100.0, 200.0, 0.0))
    out = las.parse_las(buf)
    assert len(out) == 50
    assert np.abs(out["x"] - x).max() < 0.001
    assert np.abs(out["y"] - y).max() < 0.001
    assert np.abs(out["z"] - z).max() < 0.001
    assert (out["classification"].to_numpy() == cls).all()
    assert (out["return_num"] == 1).all()
    assert out["gps_time"].isna().all()


def test_parse_las_format3_gps_rgb_and_extra_bytes():
    x = np.array([1.0, 2.0, 3.0])
    y = np.array([4.0, 5.0, 6.0])
    z = np.array([7.0, 8.0, 9.0])
    cls = np.array([2, 2, 5])
    t = np.array([1111.5, 2222.5, 3333.5])
    rgb = [(10, 20, 30), (40, 50, 60), (70, 80, 90)]
    buf = _las_file(x, y, z, cls, fmt=3, gps_time=t, rgb=rgb, extra_bytes=4)
    out = las.parse_las(buf)
    assert np.allclose(out["gps_time"], t)
    assert list(out["red"]) == [10, 40, 70]
    assert list(out["blue"]) == [30, 60, 90]
    assert list(out["classification"]) == [2, 2, 5]


def test_parse_las_rejects_garbage():
    with pytest.raises(ValueError):
        las.parse_las(b"NOTL" + b"\0" * 300)


def test_read_las_ground_filter_idw_grid(spark, tmp_path):
    """The reference DEM flow: LAS scan -> class==2 ground filter ->
    IDW grid; node values checked against the brute-force IDW oracle
    (create_dem_tiles_from_array.py:224-241)."""
    rng = np.random.default_rng(12)
    n = 600
    x = rng.uniform(0.0, 2.0, n)
    y = rng.uniform(0.0, 2.0, n)
    z = rng.uniform(0.0, 100.0, n)
    cls = np.where(rng.uniform(size=n) < 0.6, 2, 1)  # 60% ground
    for part in range(2):  # two flight-line files
        m = slice(part * n // 2, (part + 1) * n // 2)
        buf = _las_file(x[m], y[m], z[m], cls[m], fmt=1,
                        gps_time=np.arange(n // 2, dtype=float))
        (tmp_path / f"swath_{part}.las").write_bytes(buf)
    pts = las.read_las(spark, str(tmp_path / "*.las"))
    assert pts.count() == n
    ground = pts.filter(F.col("classification") == 2).select(
        F.col("x").alias("lon"), F.col("y").alias("lat"), "z")
    out = idw.idw_grid(ground, value="z", cell_z=8, nodes_per_cell=4, power=2.0).toPandas()
    assert len(out) > 0
    gm = cls == 2
    px, py, pv = x[gm], y[gm], z[gm]
    # descaled coordinates are within 0.001 of the fixture values; the
    # oracle recomputes IDW from the PARSED points to stay exact
    parsed = pts.filter(F.col("classification") == 2).toPandas()
    px, py, pv = parsed["x"].to_numpy(), parsed["y"].to_numpy(), parsed["z"].to_numpy()
    pcell = cells.cell(px, py, 8)
    for r in out.dropna(subset=["value"]).sample(15, random_state=0).itertuples():
        nb = set(cells.disk(int(r.cell), 1).tolist())
        m = np.isin(pcell, list(nb))
        dx = r.node_lon - px[m]
        dy = r.node_lat - py[m]
        d2 = np.maximum(dx * dx + dy * dy, 1e-24)
        w = 1.0 / d2
        want = (w * pv[m]).sum() / w.sum()
        assert np.isclose(r.value, want, rtol=1e-9), r


def test_write_las_roundtrip_vs_independent_parser():
    """Engine writer -> independent test-local fixture parser semantics:
    read back through the engine parser and check quantized coords."""
    rng = np.random.default_rng(9)
    n = 200
    x = rng.uniform(10.0, 12.0, n)
    y = rng.uniform(20.0, 22.0, n)
    z = rng.uniform(0.0, 50.0, n)
    cls = rng.integers(1, 7, n)
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "w.las")
        las.write_las(p, x, y, z, cls, scale=0.001, offset=(10.0, 20.0, 0.0))
        out = las.parse_las(open(p, "rb").read())
    assert len(out) == n
    assert np.abs(out["x"] - x).max() <= 0.0005 + 1e-12
    assert np.abs(out["y"] - y).max() <= 0.0005 + 1e-12
    assert np.abs(out["z"] - z).max() <= 0.0005 + 1e-12
    assert (out["classification"].to_numpy() == cls).all()
