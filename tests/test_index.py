"""Index layer unit oracles (SURVEY.md §5.2): S2 Hilbert vs bit-at-a-time
reference, grid cell determinism + covering, quadkey/tile closed forms."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from gis_scripts_spark.index import cells, s2, tiles


@given(
    st.floats(min_value=-89.9, max_value=89.9),
    st.floats(min_value=-179.9, max_value=179.9),
)
@settings(max_examples=60, deadline=None)
def test_s2_fast_matches_slow(lat, lng):
    x, y, z = s2._xyz_from_latlng(np.array([lat]), np.array([lng]))
    face, u, v = s2._face_uv(x, y, z)
    i = s2._ij_from_st(s2._st_from_uv(u))
    j = s2._ij_from_st(s2._st_from_uv(v))
    fast = int(s2.cell_id_from_face_ij(face, i, j)[0])
    slow = s2.cell_id_slow(int(face[0]), int(i[0]), int(j[0]))
    assert fast == slow


def test_s2_parent_and_level():
    rng = np.random.default_rng(3)
    lat = rng.uniform(-80, 80, 500)
    lng = rng.uniform(-179, 179, 500)
    for lvl in (5, 12, 20, 30):
        c = s2.cell_id(lat, lng, lvl)
        assert (s2.level_of(c) == lvl).all()
    leaf = s2.cell_id(lat, lng, 30)
    assert (s2.parent(leaf, 12) == s2.cell_id(lat, lng, 12)).all()


def test_s2_locality():
    # nearby points at fine level share coarse parents
    base = s2.cell_id(np.array([10.0]), np.array([20.0]), 10)
    near = s2.cell_id(np.array([10.0001]), np.array([20.0001]), 10)
    assert base[0] == near[0]


def test_grid_cell_pack_roundtrip():
    rng = np.random.default_rng(0)
    lon = rng.uniform(-180, 180, 1000)
    lat = rng.uniform(-90, 90, 1000)
    for z in (0, 5, 12, 28):
        c = cells.cell(lon, lat, z)
        zz, gx, gy = cells.unpack(c)
        assert (zz == z).all()
        assert (cells.pack(z, gx, gy) == c).all()
        for k in range(0, 1000, 211):
            b = cells.cell_bounds(int(c[k]))
            assert b[0] <= lon[k] <= b[2] + 1e-12
            assert b[1] <= lat[k] <= b[3] + 1e-12


@given(
    st.floats(min_value=-179, max_value=170),
    st.floats(min_value=-85, max_value=80),
    st.floats(min_value=0.01, max_value=9.0),
    st.floats(min_value=0.01, max_value=4.0),
)
@settings(max_examples=40, deadline=None)
def test_cover_bbox_contains_inner_points(x0, y0, dx, dy):
    z = 7
    x1, y1 = x0 + dx, y0 + dy
    cover = set(cells.cover_bbox(x0, y0, x1, y1, z).tolist())
    rng = np.random.default_rng(1)
    px = rng.uniform(x0, x1, 50)
    py = rng.uniform(y0, y1, 50)
    pc = cells.cell(px, py, z)
    assert set(pc.tolist()) <= cover


def test_quadkey_roundtrip_and_known():
    # Bing documented example: tile (3,5) z=3 -> quadkey "213"
    assert tiles.quadkey(np.array([3]), np.array([5]), 3)[0] == "213"
    assert tiles.quadkey_to_xyz("213") == (3, 3, 5)
    rng = np.random.default_rng(2)
    x = rng.integers(0, 2**10, 100)
    y = rng.integers(0, 2**10, 100)
    qk = tiles.quadkey(x, y, 10)
    for i in range(100):
        assert tiles.quadkey_to_xyz(qk[i]) == (10, int(x[i]), int(y[i]))


def test_tile_xy_known_values():
    # lon=0, lat=0 at z=1 -> tile (1, 1)... classic slippy checks
    x, y = tiles.tile_xy(np.array([0.0]), np.array([0.0]), 1)
    assert (int(x[0]), int(y[0])) == (1, 1)
    x, y = tiles.tile_xy(np.array([-180.0]), np.array([85.0511287]), 2)
    assert (int(x[0]), int(y[0])) == (0, 0)


def test_disk_and_disk_arr_agree():
    c = cells.cell(np.array([10.0]), np.array([20.0]), 6)[0]
    d1 = set(cells.disk(int(c), 2).tolist())
    idx, d2 = cells.disk_arr(np.array([c]), 2)
    assert set(d2.tolist()) == d1
    assert len(d1) == 25


def test_s2_decode_roundtrip():
    rng = np.random.default_rng(8)
    lat = rng.uniform(-85, 85, 100)
    lng = rng.uniform(-179.9, 179.9, 100)
    for lvl in (5, 12, 30):
        c = s2.cell_id(lat, lng, lvl)
        for k in range(0, 100, 11):
            clat, clng = s2.to_lat_lng(int(c[k]))
            assert int(s2.cell_id(np.array([clat]), np.array([clng]), lvl)[0]) == int(c[k])


def test_s2_center_error_shrinks_with_level():
    c5 = int(s2.cell_id(np.array([10.0]), np.array([20.0]), 5)[0])
    c20 = int(s2.cell_id(np.array([10.0]), np.array([20.0]), 20)[0])
    e5 = abs(s2.to_lat_lng(c5)[0] - 10.0) + abs(s2.to_lat_lng(c5)[1] - 20.0)
    e20 = abs(s2.to_lat_lng(c20)[0] - 10.0) + abs(s2.to_lat_lng(c20)[1] - 20.0)
    assert e20 < e5 / 1000
