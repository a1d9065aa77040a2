"""Minimal WKB (well-known binary) codec for Polygon / MultiPolygon.

Public OGC WKB layout, little-endian only:
  byte order (1B) | geom type (4B) | payload
  Polygon: n_rings, then per ring: n_points, then x,y doubles
  MultiPolygon: n_polys, then embedded Polygon records

Rings are stored as numpy (n,2) float64 arrays, first point repeated last
(closed), exterior first — the same convention OGR uses when the reference
reads GeoPackage/Shapefile layers (``seagrass_lib.py:454-508``).
"""

from __future__ import annotations

import struct

import numpy as np

_POLYGON = 3
_MULTIPOLYGON = 6


def polygon_to_wkb(rings: list[np.ndarray]) -> bytes:
    """rings: list of (n,2) arrays, exterior first; auto-closes each ring."""
    out = [struct.pack("<BI", 1, _POLYGON), struct.pack("<I", len(rings))]
    for ring in rings:
        ring = np.asarray(ring, np.float64)
        if not np.array_equal(ring[0], ring[-1]):
            ring = np.vstack([ring, ring[:1]])
        out.append(struct.pack("<I", len(ring)))
        out.append(ring.astype("<f8").tobytes())
    return b"".join(out)


def multipolygon_to_wkb(polys: list[list[np.ndarray]]) -> bytes:
    out = [struct.pack("<BI", 1, _MULTIPOLYGON), struct.pack("<I", len(polys))]
    for rings in polys:
        out.append(polygon_to_wkb(rings))
    return b"".join(out)


def bbox_to_wkb(x_min: float, y_min: float, x_max: float, y_max: float) -> bytes:
    ring = np.array(
        [[x_min, y_min], [x_max, y_min], [x_max, y_max], [x_min, y_max], [x_min, y_min]]
    )
    return polygon_to_wkb([ring])


def _read_polygon(buf: bytes, off: int) -> tuple[list[np.ndarray], int]:
    (n_rings,) = struct.unpack_from("<I", buf, off)
    off += 4
    rings = []
    for _ in range(n_rings):
        (n_pts,) = struct.unpack_from("<I", buf, off)
        off += 4
        ring = np.frombuffer(buf, dtype="<f8", count=2 * n_pts, offset=off).reshape(n_pts, 2)
        rings.append(ring.astype(np.float64))
        off += 16 * n_pts
    return rings, off


def from_wkb(buf: bytes) -> list[list[np.ndarray]]:
    """Decode to a list of polygons (each: list of rings, exterior first).

    Polygon -> one-element list; MultiPolygon -> one element per part
    (mirrors the reference's multipart->singlepart explode,
    ``seagrass_lib.py:479-501``).
    """
    byte_order, geom_type = struct.unpack_from("<BI", buf, 0)
    if byte_order != 1:
        raise ValueError("only little-endian WKB supported")
    geom_type &= 0xFF  # tolerate 2.5D / SRID-flag variants
    if geom_type == _POLYGON:
        rings, _ = _read_polygon(buf, 5)
        return [rings]
    if geom_type == _MULTIPOLYGON:
        (n_polys,) = struct.unpack_from("<I", buf, 5)
        off = 9
        polys = []
        for _ in range(n_polys):
            # skip embedded byte order + type
            off += 5
            rings, off = _read_polygon(buf, off)
            polys.append(rings)
        return polys
    raise ValueError(f"unsupported WKB geometry type {geom_type}")
