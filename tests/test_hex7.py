"""hex7 — the from-scratch icosahedral aperture-7 hex index (H3 structure).

Oracles here are first-principles geometry (no hex library exists in the
sandbox, and bit-compat with Uber H3 is explicitly out of scope — see the
module docstring): containment radii, aperture counts, ring sizes, exact
partition determinism, and a bit-for-bit DuckDB cross-check of the SQL
encode emitted for the driver's `hex_zonal_stats` oracle.
"""

import math

import duckdb
import numpy as np
import pytest

from gis_scripts_spark.index import hex7


def _unit(lon, lat):
    lo, la = np.radians(lon), np.radians(lat)
    return np.stack(
        [np.cos(la) * np.cos(lo), np.cos(la) * np.sin(lo), np.sin(la)], axis=-1
    )


@pytest.fixture(scope="module")
def pts():
    rng = np.random.default_rng(1234)
    lon = rng.uniform(-180.0, 180.0, 5000)
    lat = np.degrees(np.arcsin(rng.uniform(-1.0, 1.0, 5000)))  # area-uniform
    return lon, lat


def test_icosahedron_exact():
    # 12 unit vertices, 20 faces, face centers unit, bases orthonormal
    assert hex7._VERTS.shape == (12, 3)
    np.testing.assert_allclose(np.linalg.norm(hex7._VERTS, axis=1), 1.0, atol=1e-15)
    assert hex7._CENTERS.shape == (20, 3)
    np.testing.assert_allclose(np.linalg.norm(hex7._CENTERS, axis=1), 1.0, atol=1e-15)
    for f in range(20):
        c, e1, e2 = hex7._CENTERS[f], hex7._E1[f], hex7._E2[f]
        assert abs(np.dot(c, e1)) < 1e-14
        assert abs(np.dot(c, e2)) < 1e-14
        assert abs(np.dot(e1, e2)) < 1e-14
        np.testing.assert_allclose([np.linalg.norm(e1), np.linalg.norm(e2)], 1.0,
                                   atol=1e-14)
    # every point on the sphere is within the face angular radius of its owner
    assert 0.6 < hex7.FACE_EXTENT < 0.8  # tan(~37.38 deg)


def test_point_within_cell_radius(pts):
    """encode's cell center is within the hex circumradius of the point —
    the containment bound that makes the cell a valid join prefilter key."""
    lon, lat = pts
    for res in (0, 1, 2, 4, 7):
        cells = hex7.encode(lon, lat, res)
        clon, clat = hex7.cell_center(cells)
        cosd = np.clip((_unit(lon, lat) * _unit(clon, clat)).sum(-1), -1, 1)
        ang = np.arccos(cosd)
        # gnomonic circumradius bound: u/sqrt(3) plane units; angular distance
        # on the sphere is <= the plane distance (gnomonic expands distances)
        bound = hex7._res_u(res) / math.sqrt(3.0)
        assert ang.max() <= bound * 1.0000001


def test_aperture_seven(pts):
    """Each refinement step multiplies cell count ~7x (aperture-7). Uses
    fine resolutions so the sample box's perimeter cells (which bias the
    touched-cell count upward, more at coarse res) are a small fraction."""
    rng = np.random.default_rng(5)
    lon0, lat0 = 20.0, 15.0
    dlon = rng.uniform(-4, 4, 120000)
    dlat = rng.uniform(-4, 4, 120000)
    for res in (3, 4):
        a = len(np.unique(hex7.encode(lon0 + dlon, lat0 + dlat, res)))
        b = len(np.unique(hex7.encode(lon0 + dlon, lat0 + dlat, res + 1)))
        assert 5.5 < b / a < 8.2  # ~7 minus perimeter bias
    # and the lattice spacing ratio is exactly sqrt(7) by construction
    assert abs(hex7._res_u(3) / hex7._res_u(4) - math.sqrt(7.0)) < 1e-12


def test_children_and_parent():
    rng = np.random.default_rng(7)
    lon = rng.uniform(-180, 180, 400)
    lat = rng.uniform(-85, 85, 400)
    cells = np.unique(hex7.encode(lon, lat, 4))
    n7 = 0
    for c in cells[:200]:
        ch = hex7.children(int(c))
        # every child's parent is the cell (definitional closure)
        assert np.all(hex7.parent(ch) == c)
        if len(ch) == 7:
            n7 += 1
    assert n7 >= 190  # interior cells dominate; seam cells may have fewer


def test_k_ring_six_neighbors():
    rng = np.random.default_rng(9)
    lon = rng.uniform(-180, 180, 300)
    lat = rng.uniform(-80, 80, 300)
    cells = np.unique(hex7.encode(lon, lat, 3))
    u = hex7._res_u(3)
    for c in cells[:150]:
        ring = hex7.k_ring(int(c), 1)
        assert len(ring) == 6
        # neighbors' centers sit ~one lattice spacing away (angular <= plane)
        clon, clat = hex7.cell_center(np.full(6, c, dtype=np.int64))
        nlon, nlat = hex7.cell_center(ring)
        ang = np.arccos(
            np.clip((_unit(clon, clat) * _unit(nlon, nlat)).sum(-1), -1, 1)
        )
        assert np.all(ang < u * 1.3)
        assert np.all(ang > u * 0.5)


def test_k_ring_cross_seam_resolves():
    """Ring candidates that fall across a face seam re-encode to their true
    owner cell — no invalid ids, no duplicates."""
    # icosahedron vertex: a 5-face meeting point (worst seam case)
    vlon, vlat = (
        float(np.degrees(np.arctan2(hex7._VERTS[0, 1], hex7._VERTS[0, 0]))),
        float(np.degrees(np.arcsin(hex7._VERTS[0, 2]))),
    )
    c = int(hex7.encode(np.array([vlon]), np.array([vlat]), 3)[0])
    ring = hex7.k_ring(c, 2)
    assert len(ring) == len(np.unique(ring))
    assert c not in set(ring.tolist())
    # all ids decode without error and re-encode to themselves or a seam owner
    lon, lat = hex7.cell_center(ring)
    assert np.all(np.isfinite(lon)) and np.all(np.isfinite(lat))


def test_partition_determinism(pts):
    """encode is a pure function: scalar loop == vectorized, repeat == same."""
    lon, lat = pts
    vec = hex7.encode(lon[:100], lat[:100], 5)
    scal = np.array(
        [int(hex7.encode(np.array([lo]), np.array([la]), 5)[0])
         for lo, la in zip(lon[:100], lat[:100])]
    )
    np.testing.assert_array_equal(vec, scal)
    np.testing.assert_array_equal(vec, hex7.encode(lon[:100], lat[:100], 5))


def test_pack_unpack_roundtrip(pts):
    lon, lat = pts
    for res in (0, 5, 15):
        cells = hex7.encode(lon[:500], lat[:500], res)
        face, r, i, j = hex7.unpack(cells)
        assert np.all((face >= 0) & (face < 20))
        assert np.all(r == res)
        np.testing.assert_array_equal(hex7._pack(face, res, i, j), cells)


def test_interior_center_roundtrip():
    """encode(center(c)) == c for interior cells (seam cells excluded by
    construction: sample far from face boundaries)."""
    rng = np.random.default_rng(3)
    lon0, lat0 = 20.0, 15.0  # comfortably inside one face
    lon = lon0 + rng.uniform(-5, 5, 2000)
    lat = lat0 + rng.uniform(-5, 5, 2000)
    cells = np.unique(hex7.encode(lon, lat, 6))
    clon, clat = hex7.cell_center(cells)
    np.testing.assert_array_equal(hex7.encode(clon, clat, 6), cells)


@pytest.mark.parametrize("res", [0, 1, 2, 3, 8])
def test_sql_oracle_bit_exact(pts, res):
    """The emitted DuckDB SQL reproduces numpy encode bit-for-bit — the
    property the driver's hex_zonal_stats full oracle rests on. Covers even
    (Class II) and odd (Class III, rotated grid) resolutions."""
    lon, lat = pts
    n = 2000
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE pts AS SELECT * FROM (VALUES "
        + ",".join(
            f"({k},{lo!r},{la!r})" for k, (lo, la) in enumerate(zip(lon[:n], lat[:n]))
        )
        + ") t(k, lon, lat)"
    )
    ctes = hex7.sql_cell_ctes("pts", "k", res)
    got = con.execute(
        f"WITH {ctes} SELECT cell FROM _hexed ORDER BY k"
    ).fetchnumpy()["cell"]
    np.testing.assert_array_equal(got, hex7.encode(lon[:n], lat[:n], res))


def test_sql_oracle_adversarial_points():
    """Poles, antimeridian, face centers, icosahedron vertices (5-face
    seams), and exact face-center ties must agree numpy-vs-SQL."""
    spots = [(-180.0, 0.0), (180.0, 0.0), (0.0, 90.0), (0.0, -90.0), (0.0, 0.0)]
    for f in range(20):
        c = hex7._CENTERS[f]
        spots.append(
            (float(np.degrees(np.arctan2(c[1], c[0]))),
             float(np.degrees(np.arcsin(c[2]))))
        )
    for v in range(12):
        p = hex7._VERTS[v]
        spots.append(
            (float(np.degrees(np.arctan2(p[1], p[0]))),
             float(np.degrees(np.arcsin(np.clip(p[2], -1, 1)))))
        )
    lon = np.array([s[0] for s in spots])
    lat = np.array([s[1] for s in spots])
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE pts AS SELECT * FROM (VALUES "
        + ",".join(f"({k},{lo!r},{la!r})" for k, (lo, la) in enumerate(zip(lon, lat)))
        + ") t(k, lon, lat)"
    )
    for res in (2, 3):
        ctes = hex7.sql_cell_ctes("pts", "k", res)
        got = con.execute(
            f"WITH {ctes} SELECT cell FROM _hexed ORDER BY k"
        ).fetchnumpy()["cell"]
        np.testing.assert_array_equal(got, hex7.encode(lon, lat, res))


def test_res_bounds():
    with pytest.raises(ValueError):
        hex7.encode(np.array([0.0]), np.array([0.0]), 16)
    with pytest.raises(ValueError):
        hex7.sql_cell_ctes("pts", "k", -1)
    with pytest.raises(ValueError):
        hex7.parent(hex7.encode(np.array([0.0]), np.array([0.0]), 0))


def test_boundary_hexagon():
    c = int(hex7.encode(np.array([20.0]), np.array([15.0]), 4)[0])
    corners = hex7.cell_boundary(c)
    assert corners.shape == (6, 2)
    clon, clat = hex7.cell_center(np.array([c], dtype=np.int64))
    ang = np.arccos(
        np.clip(
            (_unit(corners[:, 0], corners[:, 1]) * _unit(clon, clat)).sum(-1), -1, 1
        )
    )
    rad = hex7._res_u(4) / math.sqrt(3.0)
    # gnomonic compresses angular distances by up to cos^2(theta) ~ 0.85
    # at this face position; corners stay a near-regular hexagon
    assert np.all(ang < rad * 1.001) and np.all(ang > rad * 0.8)
    assert ang.max() / ang.min() < 1.1
