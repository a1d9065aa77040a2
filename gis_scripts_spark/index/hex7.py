"""Hex7 — a from-scratch icosahedral aperture-7 hexagonal hierarchical cell
index (the H3 cell structure, re-derived from first principles).

BASELINE.json's north rule names "H3 (and S2)" as the cell indexes; the H3
library is not in this sandbox and Uber's exact base-cell orientation tables
are data, not published math — reproducing them byte-for-byte would be a
port, not a from-scratch build. Hex7 therefore implements the same PUBLIC
mathematical structure as H3 with its own (exactly derived) orientation:

- the regular icosahedron from the golden ratio (vertices = cyclic
  permutations of (0, +-1, +-phi), normalized) — no copied constant tables;
- gnomonic projection onto the owning face (max-dot-product ownership,
  first-max tie-break — the spherical Voronoi of the 20 face centers);
- an axial hexagonal lattice per face with **aperture-7** refinement:
  cell spacing u_r = U0 / sqrt(7)^r and the Class II / Class III
  alternation — odd resolutions rotated by atan(sqrt(3)/5) ~ 19.1066 deg
  (H3's M_AP7_ROT_RADS), even resolutions axis-aligned with res 0;
- cube-coordinate hex rounding (floor(v + 0.5), NOT banker's rounding, so
  the SQL oracle and numpy agree bit-for-bit);
- a packed 63-bit id: face(5) | res(4) | i+2^26 (27) | j+2^26 (27).

Honesty boundary vs real H3: ids are NOT bit-compatible with Uber H3 (own
orientation + id layout), and there are no pentagon cells — near the 12
icosahedron vertices and the face seams, cells are the per-face hexagons
clipped by face ownership, so every point maps to exactly one cell (a true
partition of the sphere) but seam cells are smaller than interior ones and
``encode(center(c)) == c`` is only guaranteed for interior cells. Ring and
child traversal re-encode candidate centers through full point encoding, so
cross-seam neighbors resolve to their true owner cell.

Reference parity: the reference indexes imagery by ad-hoc bounding boxes
(global_match.py:61-75) and M x N block grids (local_match.py:508-542);
hex7 is the hierarchical-cell upgrade the north rule asks for, next to the
S2 index (s2.py) and the exact equirect join grid (cells.py).

Everything is vectorized numpy (Arrow pandas-UDF friendly, 10^12-row
scale); ``sql_cell_expr`` emits the SAME encode as a DuckDB-runnable SQL
expression (identical literals via repr round-trip, identical op order,
identical floor(+0.5) rounding) so queries built on hex7 get a FULL
DuckDB oracle — cross-checked bit-for-bit in tests/test_hex7.py.
"""

from __future__ import annotations

import itertools
import math

import numpy as np

MAX_RES = 15
U0 = 0.25  # res-0 lattice spacing in gnomonic plane units (~500 res-0 cells
#            globally once seam-clipped per-face hexes are counted)
ROT7 = math.atan(math.sqrt(3.0) / 5.0)  # aperture-7 rotation, ~19.1066 deg
_SQRT3 = math.sqrt(3.0)
_OFF = 1 << 26  # i/j offset so packed fields are non-negative

_FACE_SHIFT = 58
_RES_SHIFT = 54
_I_SHIFT = 27


# ------------------------------------------------------------- icosahedron
def _build_icosahedron() -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Vertices, face centers and per-face tangent bases, derived exactly.

    Faces are canonically ordered by their sorted vertex-index triple, so
    the face numbering is a pure function of the vertex list below.
    """
    phi = (1.0 + math.sqrt(5.0)) / 2.0
    base = []
    for a, b in itertools.product((1.0, -1.0), repeat=2):
        base.append((0.0, a, b * phi))
        base.append((a, b * phi, 0.0))
        base.append((a * phi, 0.0, b))
    v = np.array(base, dtype=np.float64)
    v /= np.linalg.norm(v, axis=1, keepdims=True)

    dots = v @ v.T
    np.fill_diagonal(dots, -2.0)
    adj_dot = dots.max()  # = 1/sqrt(5): the vertex-neighbor dot product
    faces = []
    for tri in itertools.combinations(range(12), 3):
        a, b, c = tri
        if (
            dots[a, b] > adj_dot - 1e-9
            and dots[a, c] > adj_dot - 1e-9
            and dots[b, c] > adj_dot - 1e-9
        ):
            faces.append(tri)
    faces.sort()
    if len(faces) != 20:  # pragma: no cover - construction invariant
        raise AssertionError(f"icosahedron construction built {len(faces)} faces")

    centers = np.empty((20, 3), dtype=np.float64)
    e1 = np.empty((20, 3), dtype=np.float64)
    e2 = np.empty((20, 3), dtype=np.float64)
    for f, (a, b, c) in enumerate(faces):
        ctr = v[a] + v[b] + v[c]
        ctr /= np.linalg.norm(ctr)
        centers[f] = ctr
        # e1 points from the face center toward its lowest-index vertex
        t = v[a] - np.dot(v[a], ctr) * ctr
        e1[f] = t / np.linalg.norm(t)
        e2[f] = np.cross(ctr, e1[f])
    return v, centers, e1, e2


_VERTS, _CENTERS, _E1, _E2 = _build_icosahedron()

# Angular radius of a face (center to vertex): ~37.38 deg; gnomonic extent.
FACE_EXTENT = math.tan(math.acos(float(_VERTS[0] @ _CENTERS[0])))


def _res_u(res: int) -> float:
    """Lattice spacing at res (gnomonic units). Python float, reproducible."""
    return U0 / math.sqrt(7.0) ** res


def _res_alpha(res: int) -> float:
    """Grid rotation at res: Class III (odd) rotated by ROT7, Class II 0."""
    return ROT7 if (res % 2) == 1 else 0.0


# ------------------------------------------------------------------ encode
def encode(lon, lat, res: int) -> np.ndarray:
    """Vectorized point -> hex7 cell id (int64).

    Op-for-op identical to ``sql_cell_expr`` (same literals, same
    left-to-right float evaluation, same floor(v+0.5) rounding) so a DuckDB
    oracle reproduces these ids bit-for-bit.
    """
    if not 0 <= res <= MAX_RES:
        raise ValueError(f"res must be in [0, {MAX_RES}], got {res}")
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    latr = lat * (math.pi / 180.0)
    lonr = lon * (math.pi / 180.0)
    cl = np.cos(latr)
    px = cl * np.cos(lonr)
    py = cl * np.sin(lonr)
    pz = np.sin(latr)

    # face ownership: first max of the 20 center dot products
    dots = (
        px[..., None] * _CENTERS[:, 0]
        + py[..., None] * _CENTERS[:, 1]
        + pz[..., None] * _CENTERS[:, 2]
    )
    face = np.argmax(dots, axis=-1)
    d = np.take_along_axis(dots, face[..., None], axis=-1)[..., 0]

    e1 = _E1[face]
    e2 = _E2[face]
    # gnomonic planar coords: (p/d) . e1, (p/d) . e2  (e1, e2 _|_ center)
    tx = px / d
    ty = py / d
    tz = pz / d
    x = (tx * e1[..., 0] + ty * e1[..., 1]) + tz * e1[..., 2]
    y = (tx * e2[..., 0] + ty * e2[..., 1]) + tz * e2[..., 2]

    i, j = _plane_to_ij(x, y, res)
    return _pack(face.astype(np.int64), res, i, j)


def _plane_to_ij(x, y, res: int) -> tuple[np.ndarray, np.ndarray]:
    """Gnomonic plane coords -> axial lattice (i, j) at res. Shared rounding."""
    cosa = math.cos(_res_alpha(res))
    sina = math.sin(_res_alpha(res))
    xg = x * cosa + y * sina
    yg = y * cosa - x * sina
    u = _res_u(res)
    us3 = u * _SQRT3
    qf = xg / u - yg / us3
    rf = 2.0 * yg / us3
    yf = -qf - rf
    rq = np.floor(qf + 0.5)
    rr = np.floor(rf + 0.5)
    ry = np.floor(yf + 0.5)
    d1 = np.abs(rq - qf)
    d2 = np.abs(ry - yf)
    d3 = np.abs(rr - rf)
    fix_x = (d1 > d2) & (d1 > d3)
    fix_z = ~fix_x & ~(d2 > d3)
    i = np.where(fix_x, -ry - rr, rq).astype(np.int64)
    j = np.where(fix_z, -rq - ry, rr).astype(np.int64)
    return i, j


def _pack(face, res: int, i, j) -> np.ndarray:
    face = np.asarray(face, dtype=np.int64)
    i = np.asarray(i, dtype=np.int64)
    j = np.asarray(j, dtype=np.int64)
    if np.any((i < -_OFF) | (i >= _OFF) | (j < -_OFF) | (j >= _OFF)):
        raise ValueError("hex7 lattice coordinate out of packable range")
    return (
        (face << _FACE_SHIFT)
        | (np.int64(res) << _RES_SHIFT)
        | ((i + _OFF) << _I_SHIFT)
        | (j + _OFF)
    )


def unpack(cell) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """cell id -> (face, res, i, j), all int64 arrays."""
    cell = np.asarray(cell, dtype=np.int64)
    face = cell >> _FACE_SHIFT
    res = (cell >> _RES_SHIFT) & 0xF
    i = ((cell >> _I_SHIFT) & (2 * _OFF - 1)) - _OFF
    j = (cell & (2 * _OFF - 1)) - _OFF
    return face, res, i, j


# ------------------------------------------------------------------ decode
def cell_center(cell) -> tuple[np.ndarray, np.ndarray]:
    """cell id -> (lon, lat) of the lattice center (degrees)."""
    face, res, i, j = unpack(cell)
    if np.any((res < 0) | (res > MAX_RES)) or np.any((face < 0) | (face > 19)):
        raise ValueError("invalid hex7 cell id")
    resolutions = np.unique(res)
    x = np.empty(cell.shape, dtype=np.float64)
    y = np.empty(cell.shape, dtype=np.float64)
    for r in resolutions:
        m = res == r
        u = _res_u(int(r))
        xg = u * (i[m] + 0.5 * j[m])
        yg = u * (j[m] * (_SQRT3 / 2.0))
        cosa = math.cos(_res_alpha(int(r)))
        sina = math.sin(_res_alpha(int(r)))
        x[m] = xg * cosa - yg * sina
        y[m] = xg * sina + yg * cosa
    c = _CENTERS[face]
    t = c + x[..., None] * _E1[face] + y[..., None] * _E2[face]
    t /= np.linalg.norm(t, axis=-1, keepdims=True)
    lon = np.degrees(np.arctan2(t[..., 1], t[..., 0]))
    lat = np.degrees(np.arcsin(np.clip(t[..., 2], -1.0, 1.0)))
    return lon, lat


def cell_boundary(cell: int) -> np.ndarray:
    """One cell id -> (6, 2) lon/lat hexagon corners (lattice hexagon;
    seam cells are additionally clipped by face ownership — documented)."""
    face, res, i, j = (int(v) for v in unpack(np.int64(cell)))
    u = _res_u(res)
    alpha = _res_alpha(res)
    xg = u * (i + 0.5 * j)
    yg = u * (j * (_SQRT3 / 2.0))
    rad = u / _SQRT3
    # corners in the grid frame, then one rotation into the face plane
    cx = xg + rad * np.cos(np.radians(30.0 + 60.0 * np.arange(6)))
    cy = yg + rad * np.sin(np.radians(30.0 + 60.0 * np.arange(6)))
    x = cx * math.cos(alpha) - cy * math.sin(alpha)
    y = cx * math.sin(alpha) + cy * math.cos(alpha)
    t = _CENTERS[face] + x[:, None] * _E1[face] + y[:, None] * _E2[face]
    t /= np.linalg.norm(t, axis=1, keepdims=True)
    lon = np.degrees(np.arctan2(t[:, 1], t[:, 0]))
    lat = np.degrees(np.arcsin(np.clip(t[:, 2], -1.0, 1.0)))
    return np.stack([lon, lat], axis=1)


# --------------------------------------------------------------- hierarchy
def parent(cell) -> np.ndarray:
    """Aperture-7 parent: the coarser cell owning this cell's center.

    Computed by full re-encode of the center point, so seam cells resolve
    to their true owner face (H3's overage adjustment, done by geometry)."""
    cell = np.asarray(cell, dtype=np.int64)
    _, res, _, _ = unpack(cell)
    r = int(res.flat[0]) if cell.size else 0
    if np.any(res != r):
        raise ValueError("parent() requires uniform resolution")
    if r == 0:
        raise ValueError("res-0 cells have no parent")
    lon, lat = cell_center(cell)
    return encode(lon, lat, r - 1)


def children(cell: int) -> np.ndarray:
    """Aperture-7 children of one cell: the finer cells whose centers this
    cell owns (exactly 7 for interior cells; seam cells may differ)."""
    face, res, i, j = (int(v) for v in unpack(np.int64(cell)))
    if res >= MAX_RES:
        raise ValueError("already at max resolution")
    lon0, lat0 = cell_center(np.array([cell], dtype=np.int64))
    center_child = int(encode(lon0, lat0, res + 1)[0])
    cand = np.concatenate(
        [np.array([center_child], dtype=np.int64), k_ring(center_child, 1)]
    )
    cand = np.unique(cand)
    keep = parent(cand) == np.int64(cell)
    return cand[keep]


def k_ring(cell: int, k: int) -> np.ndarray:
    """Cells within lattice distance k of `cell` (excluding itself).

    Candidate centers are generated on the cell's own face lattice and
    re-encoded through full point encoding, so candidates that fall across
    a face seam resolve to their true owner cell (deduplicated)."""
    face, res, i, j = (int(v) for v in unpack(np.int64(cell)))
    offs = []
    for di in range(-k, k + 1):
        for dj in range(max(-k, -di - k), min(k, -di + k) + 1):
            if di == 0 and dj == 0:
                continue
            offs.append((di, dj))
    offs = np.array(offs, dtype=np.int64)
    u = _res_u(res)
    alpha = _res_alpha(res)
    ii = i + offs[:, 0]
    jj = j + offs[:, 1]
    xg = u * (ii + 0.5 * jj)
    yg = u * (jj * (_SQRT3 / 2.0))
    x = xg * math.cos(alpha) - yg * math.sin(alpha)
    y = xg * math.sin(alpha) + yg * math.cos(alpha)
    t = _CENTERS[face] + x[:, None] * _E1[face] + y[:, None] * _E2[face]
    t /= np.linalg.norm(t, axis=1, keepdims=True)
    lon = np.degrees(np.arctan2(t[:, 1], t[:, 0]))
    lat = np.degrees(np.arcsin(np.clip(t[:, 2], -1.0, 1.0)))
    out = np.unique(encode(lon, lat, res))
    return out[out != np.int64(cell)]


# ------------------------------------------------------------- SQL oracle
def _flit(v: float) -> str:
    """Full-precision DOUBLE literal. repr round-trips IEEE doubles, and the
    explicit CAST keeps DuckDB from typing the literal as DECIMAL (decimal
    arithmetic is exact, not IEEE — it would break bit-parity with numpy at
    ownership ties)."""
    return f"CAST('{float(v)!r}' AS DOUBLE)"


def sql_cell_ctes(points_cte: str, keys: str, res: int, out_cte: str = "_hexed") -> str:
    """Emit a DuckDB CTE chain computing encode(lon, lat, res) per row.

    `points_cte` must be the name of an earlier CTE (or table) providing
    columns (`keys`..., lon, lat); the returned text defines CTEs ending in
    `out_cte` with columns (`keys`..., cell). Ownership argmax is
    ROW_NUMBER() over the 20-face cross join (ORDER BY d DESC, f ASC =
    numpy first-max). Every float literal, op order, and the floor(v+0.5)
    rounding match the numpy kernel exactly, so cell ids agree bit-for-bit
    (cross-checked in tests/test_hex7.py).

    Returns a string of the form "_faces(...) AS (...), ..., _hexed AS
    (...)" — splice it into "WITH <here>" in the caller's query.
    """
    if not 0 <= res <= MAX_RES:
        raise ValueError(f"res must be in [0, {MAX_RES}], got {res}")
    rows = ",\n    ".join(
        "({f}, {cx}, {cy}, {cz}, {ax}, {ay}, {az}, {bx}, {by}, {bz})".format(
            f=f,
            cx=_flit(_CENTERS[f, 0]), cy=_flit(_CENTERS[f, 1]), cz=_flit(_CENTERS[f, 2]),
            ax=_flit(_E1[f, 0]), ay=_flit(_E1[f, 1]), az=_flit(_E1[f, 2]),
            bx=_flit(_E2[f, 0]), by=_flit(_E2[f, 1]), bz=_flit(_E2[f, 2]),
        )
        for f in range(20)
    )
    u = _res_u(res)
    cosa = math.cos(_res_alpha(res))
    sina = math.sin(_res_alpha(res))
    pi180 = _flit(math.pi / 180.0)
    return f"""_faces(f, cx, cy, cz, ax, ay, az, bx, by, bz) AS (VALUES
    {rows}
),
_p3 AS (
  SELECT {keys},
         cos(lat * {pi180}) * cos(lon * {pi180}) AS px,
         cos(lat * {pi180}) * sin(lon * {pi180}) AS py,
         sin(lat * {pi180}) AS pz
  FROM {points_cte}
),
_own AS (
  SELECT {keys}, f, ax, ay, az, bx, by, bz, px, py, pz,
         (px * cx + py * cy) + pz * cz AS d,
         ROW_NUMBER() OVER (
           PARTITION BY {keys}
           ORDER BY (px * cx + py * cy) + pz * cz DESC, f ASC
         ) AS _rn
  FROM _p3 CROSS JOIN _faces
),
_plane AS (
  SELECT {keys}, f,
         ((px / d) * ax + (py / d) * ay) + (pz / d) * az AS x,
         ((px / d) * bx + (py / d) * by) + (pz / d) * bz AS y
  FROM _own WHERE _rn = 1
),
_grid AS (
  SELECT {keys}, f,
         x * {_flit(cosa)} + y * {_flit(sina)} AS xg,
         y * {_flit(cosa)} - x * {_flit(sina)} AS yg
  FROM _plane
),
_frac AS (
  SELECT {keys}, f,
         xg / {_flit(u)} - yg / {_flit(u * _SQRT3)} AS qf,
         2.0 * yg / {_flit(u * _SQRT3)} AS rf
  FROM _grid
),
_rnd AS (
  SELECT {keys}, f, qf, rf, -qf - rf AS yf,
         floor(qf + 0.5) AS rq, floor(rf + 0.5) AS rr,
         floor((-qf - rf) + 0.5) AS ry
  FROM _frac
),
_fix AS (
  SELECT {keys}, f, rq, rr, ry,
         abs(rq - qf) AS d1, abs(ry - yf) AS d2, abs(rr - rf) AS d3
  FROM _rnd
),
{out_cte} AS (
  SELECT {keys},
         CAST(f AS BIGINT) * {1 << _FACE_SHIFT}
       + CAST({res} AS BIGINT) * {1 << _RES_SHIFT}
       + (CAST(CASE WHEN d1 > d2 AND d1 > d3 THEN -ry - rr ELSE rq END AS BIGINT)
          + {_OFF}) * {1 << _I_SHIFT}
       + CAST(CASE WHEN NOT (d1 > d2 AND d1 > d3) AND NOT (d2 > d3)
                   THEN -rq - ry ELSE rr END AS BIGINT) + {_OFF} AS cell
  FROM _fix
)"""
