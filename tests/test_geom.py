"""Geometry kernels vs independent oracles: WKB roundtrip, ray-cast PIP vs
convex half-plane test, area shoelace vs known values, covering flags."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from gis_scripts_spark.geom import core, wkb
from gis_scripts_spark.index import cells


def _convex_polygon(seed, m=7):
    """Genuinely convex: sorted angles on an ellipse (constant radii per
    axis). NB: varying radius per vertex would give a star-shaped polygon,
    where the half-plane oracle below is invalid."""
    rng = np.random.default_rng(seed)
    cx, cy = rng.uniform(-50, 50), rng.uniform(-30, 30)
    rx, ry = rng.uniform(2, 10), rng.uniform(2, 10)
    ang = np.sort(rng.uniform(0, 2 * np.pi, m))
    return np.stack([cx + rx * np.cos(ang), cy + ry * np.sin(ang)], axis=1)


def _inside_convex(px, py, ring):
    """Independent oracle: point strictly inside a CCW convex polygon iff
    left of every edge (cross product > 0)."""
    closed = np.vstack([ring, ring[:1]])
    out = np.ones(len(px), bool)
    for k in range(len(closed) - 1):
        ax, ay = closed[k]
        bx, by = closed[k + 1]
        cross = (bx - ax) * (py - ay) - (by - ay) * (px - ax)
        out &= cross > 0
    return out


def test_wkb_roundtrip_polygon_and_multipolygon():
    ring = _convex_polygon(1)
    hole = ring.mean(axis=0) + (ring - ring.mean(axis=0)) * 0.2
    buf = wkb.polygon_to_wkb([ring, hole])
    polys = wkb.from_wkb(buf)
    assert len(polys) == 1 and len(polys[0]) == 2
    assert np.allclose(polys[0][0][:-1], ring)
    mp = wkb.multipolygon_to_wkb([[ring], [hole[::-1]]])
    polys = wkb.from_wkb(mp)
    assert len(polys) == 2


@given(st.integers(min_value=0, max_value=500))
@settings(max_examples=30, deadline=None)
def test_pip_matches_convex_oracle(seed):
    ring = _convex_polygon(seed)  # sorted angles around center -> CCW convex
    rng = np.random.default_rng(seed + 1)
    px = rng.uniform(ring[:, 0].min() - 2, ring[:, 0].max() + 2, 200)
    py = rng.uniform(ring[:, 1].min() - 2, ring[:, 1].max() + 2, 200)
    closed = np.vstack([ring, ring[:1]])
    got = core.points_in_ring(px, py, closed)
    want = _inside_convex(px, py, ring)
    # exclude points extremely close to an edge (boundary semantics differ)
    d = np.abs(got.astype(int) - want.astype(int))
    disagree = np.nonzero(d)[0]
    for i in disagree:
        # allow only near-boundary disagreement
        dist = _min_edge_distance(px[i], py[i], closed)
        assert dist < 1e-9, f"disagreement far from boundary: {dist}"


def _min_edge_distance(px, py, closed):
    best = np.inf
    for k in range(len(closed) - 1):
        a, b = closed[k], closed[k + 1]
        ab = b - a
        t = np.clip(np.dot([px - a[0], py - a[1]], ab) / np.dot(ab, ab), 0, 1)
        proj = a + t * ab
        best = min(best, float(np.hypot(px - proj[0], py - proj[1])))
    return best


def test_polygon_with_hole():
    outer = np.array([[0.0, 0], [10, 0], [10, 10], [0, 10], [0, 0]])
    inner = np.array([[4.0, 4], [6, 4], [6, 6], [4, 6], [4, 4]])
    px = np.array([5.0, 2.0, 11.0])
    py = np.array([5.0, 2.0, 5.0])
    got = core.points_in_polygon(px, py, [outer, inner])
    assert got.tolist() == [False, True, False]


def test_area():
    sq = np.array([[0.0, 0], [4, 0], [4, 4], [0, 4], [0, 0]])
    assert core.polygon_area([sq]) == 16.0
    hole = np.array([[1.0, 1], [2, 1], [2, 2], [1, 2], [1, 1]])
    assert core.polygon_area([sq, hole]) == 15.0


def test_cover_polygon_full_flags():
    # big rectangle: interior cells must be flagged full, edges not
    rect = np.array([[0.0, 0], [20, 0], [20, 10], [0, 10], [0, 0]])
    cc, full = core.cover_polygon([[rect]], z=6)  # cells 5.625 x 2.8125
    assert len(cc) > 4
    assert full.any() and (~full).any()
    # every full cell's center must be inside
    for c, f in zip(cc, full):
        b = cells.cell_bounds(int(c))
        cx, cy = (b[0] + b[2]) / 2, (b[1] + b[3]) / 2
        inside = core.points_in_polygon(np.array([cx]), np.array([cy]), [rect])[0]
        if f:
            assert inside
    # covering includes the cell of every interior point
    rng = np.random.default_rng(5)
    px = rng.uniform(0.01, 19.99, 100)
    py = rng.uniform(0.01, 9.99, 100)
    assert set(cells.cell(px, py, 6).tolist()) <= set(cc.tolist())
