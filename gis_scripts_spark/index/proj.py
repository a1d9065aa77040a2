"""CRS transforms from scratch (no pyproj/GDAL in the sandbox) — the
engine's analogue of the reference's ``gdalwarp -t_srs`` / ``osr``
reprojection steps (``seagrass_lib.py:232-242,465,481``,
``create_overlaping_area_mask.py:45-53``, ``local_match.py:807`` EPSG:6635).

Implemented pairs (public formulas, Snyder 1987 "Map Projections — A
Working Manual" + the standard UTM series):
- Transverse Mercator / UTM on the WGS84 ellipsoid (Snyder eq. 8-9..8-17 /
  3-21; series accurate to << 1 m inside a UTM zone)
- Polar Stereographic (variant B, Snyder eq. 21-33..21-41; the EPSG:3031 /
  3413 family)
- Web Mercator (spherical; also in index/tiles.py for tiling)

All functions are vectorized numpy over float64 arrays — usable inside
Arrow pandas UDFs (the engine's kernel convention) AND directly as plan
Column math via F.pandas_udf wrappers below.
"""

from __future__ import annotations

import numpy as np

# WGS84
A = 6378137.0
F_INV = 298.257223563
F_FLAT = 1.0 / F_INV
E2 = F_FLAT * (2.0 - F_FLAT)  # first eccentricity squared
EP2 = E2 / (1.0 - E2)  # second eccentricity squared
K0_UTM = 0.9996


def _meridian_arc(lat: np.ndarray) -> np.ndarray:
    """Meridian arc length from equator (Snyder eq. 3-21)."""
    e2, e4, e6 = E2, E2 * E2, E2 * E2 * E2
    return A * (
        (1 - e2 / 4 - 3 * e4 / 64 - 5 * e6 / 256) * lat
        - (3 * e2 / 8 + 3 * e4 / 32 + 45 * e6 / 1024) * np.sin(2 * lat)
        + (15 * e4 / 256 + 45 * e6 / 1024) * np.sin(4 * lat)
        - (35 * e6 / 3072) * np.sin(6 * lat)
    )


_M_EQ = None


def utm_forward(lon, lat, zone: int, north: bool = True):
    """(lon, lat) degrees -> UTM (easting, northing) meters, zone 1..60.

    Snyder eq. 8-9..8-15. Accuracy ~mm within the zone (|dlon| <= 3 deg),
    < 1 m out to |dlon| ~ 6 deg."""
    lon = np.asarray(lon, np.float64)
    lat = np.asarray(lat, np.float64)
    lam = np.radians(lon)
    phi = np.radians(lat)
    lam0 = np.radians(zone * 6.0 - 183.0)

    sphi, cphi = np.sin(phi), np.cos(phi)
    n_rad = A / np.sqrt(1 - E2 * sphi * sphi)  # prime vertical radius
    t = np.tan(phi) ** 2
    c = EP2 * cphi * cphi
    a_ = (lam - lam0) * cphi
    m = _meridian_arc(phi)

    easting = K0_UTM * n_rad * (
        a_ + (1 - t + c) * a_**3 / 6
        + (5 - 18 * t + t * t + 72 * c - 58 * EP2) * a_**5 / 120
    ) + 500000.0
    northing = K0_UTM * (
        m + n_rad * np.tan(phi) * (
            a_**2 / 2 + (5 - t + 9 * c + 4 * c * c) * a_**4 / 24
            + (61 - 58 * t + t * t + 600 * c - 330 * EP2) * a_**6 / 720
        )
    )
    if not north:
        northing = northing + 10000000.0
    return easting, northing


def utm_inverse(easting, northing, zone: int, north: bool = True):
    """UTM meters -> (lon, lat) degrees (Snyder eq. 8-17..8-25)."""
    x = np.asarray(easting, np.float64) - 500000.0
    y = np.asarray(northing, np.float64)
    if not north:
        y = y - 10000000.0
    lam0 = np.radians(zone * 6.0 - 183.0)

    m = y / K0_UTM
    e1 = (1 - np.sqrt(1 - E2)) / (1 + np.sqrt(1 - E2))
    mu = m / (A * (1 - E2 / 4 - 3 * E2 * E2 / 64 - 5 * E2**3 / 256))
    phi1 = (
        mu
        + (3 * e1 / 2 - 27 * e1**3 / 32) * np.sin(2 * mu)
        + (21 * e1**2 / 16 - 55 * e1**4 / 32) * np.sin(4 * mu)
        + (151 * e1**3 / 96) * np.sin(6 * mu)
        + (1097 * e1**4 / 512) * np.sin(8 * mu)
    )
    sphi1, cphi1 = np.sin(phi1), np.cos(phi1)
    c1 = EP2 * cphi1 * cphi1
    t1 = np.tan(phi1) ** 2
    n1 = A / np.sqrt(1 - E2 * sphi1 * sphi1)
    r1 = A * (1 - E2) / (1 - E2 * sphi1 * sphi1) ** 1.5
    d = x / (n1 * K0_UTM)

    phi = phi1 - (n1 * np.tan(phi1) / r1) * (
        d * d / 2
        - (5 + 3 * t1 + 10 * c1 - 4 * c1 * c1 - 9 * EP2) * d**4 / 24
        + (61 + 90 * t1 + 298 * c1 + 45 * t1 * t1 - 252 * EP2 - 3 * c1 * c1) * d**6 / 720
    )
    lam = lam0 + (
        d - (1 + 2 * t1 + c1) * d**3 / 6
        + (5 - 2 * c1 + 28 * t1 - 3 * c1 * c1 + 8 * EP2 + 24 * t1 * t1) * d**5 / 120
    ) / cphi1
    return np.degrees(lam), np.degrees(phi)


def utm_zone(lon: float) -> int:
    """Standard zone number for a longitude."""
    return int(np.clip(np.floor((lon + 180.0) / 6.0) + 1, 1, 60))


# ------------------------------------------------------ polar stereographic
def polar_stereo_forward(lon, lat, south: bool = True, lat_ts: float = -71.0,
                         lon0: float = 0.0):
    """(lon, lat) degrees -> polar stereographic meters (Snyder eq.
    21-33/34, variant with standard parallel lat_ts — EPSG:3031 defaults)."""
    lon = np.asarray(lon, np.float64)
    lat = np.asarray(lat, np.float64)
    sgn = -1.0 if south else 1.0
    phi = np.radians(lat) * sgn  # work in the north convention
    lam = np.radians(lon - lon0) * sgn
    phi_c = np.radians(abs(lat_ts))
    e = np.sqrt(E2)

    def t_of(p):
        return np.tan(np.pi / 4 - p / 2) / (
            (1 - e * np.sin(p)) / (1 + e * np.sin(p))
        ) ** (e / 2)

    t = t_of(phi)
    tc = t_of(phi_c)
    mc = np.cos(phi_c) / np.sqrt(1 - E2 * np.sin(phi_c) ** 2)
    rho = A * mc * t / tc
    x = rho * np.sin(lam)
    y = -rho * np.cos(lam)
    return x * sgn, y * sgn


def polar_stereo_inverse(x, y, south: bool = True, lat_ts: float = -71.0,
                         lon0: float = 0.0):
    """Inverse (Snyder eq. 21-39/40 + 7-9 iteration)."""
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    sgn = -1.0 if south else 1.0
    xs, ys = x * sgn, y * sgn
    phi_c = np.radians(abs(lat_ts))
    e = np.sqrt(E2)
    tc = np.tan(np.pi / 4 - phi_c / 2) / (
        (1 - e * np.sin(phi_c)) / (1 + e * np.sin(phi_c))
    ) ** (e / 2)
    mc = np.cos(phi_c) / np.sqrt(1 - E2 * np.sin(phi_c) ** 2)
    rho = np.hypot(xs, ys)
    t = rho * tc / (A * mc)
    # iterate Snyder 7-9
    phi = np.pi / 2 - 2 * np.arctan(t)
    for _ in range(8):
        phi = np.pi / 2 - 2 * np.arctan(
            t * ((1 - e * np.sin(phi)) / (1 + e * np.sin(phi))) ** (e / 2)
        )
    lam = np.arctan2(xs, -ys)
    return (np.degrees(lam) * sgn + lon0), np.degrees(phi) * sgn


# ------------------------------------------------------------- web mercator
def webmerc_forward(lon, lat):
    lon = np.asarray(lon, np.float64)
    lat = np.asarray(lat, np.float64)
    x = A * np.radians(lon)
    y = A * np.log(np.tan(np.pi / 4 + np.radians(lat) / 2))
    return x, y


def webmerc_inverse(x, y):
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    lon = np.degrees(x / A)
    lat = np.degrees(2 * np.arctan(np.exp(y / A)) - np.pi / 2)
    return lon, lat


# ----------------------------------------------------------- dispatch table
def forward(crs: str, lon, lat):
    """crs: 'utm:33n' / 'utm:19s' / 'ps:south' / 'ps:north' / 'webmerc'."""
    if crs.startswith("utm:"):
        zs = crs.split(":")[1]
        return utm_forward(lon, lat, int(zs[:-1]), north=zs[-1].lower() == "n")
    if crs.startswith("ps:"):
        return polar_stereo_forward(lon, lat, south=crs.endswith("south"))
    if crs == "webmerc":
        return webmerc_forward(lon, lat)
    raise ValueError(f"unknown crs {crs}")


def inverse(crs: str, x, y):
    if crs.startswith("utm:"):
        zs = crs.split(":")[1]
        return utm_inverse(x, y, int(zs[:-1]), north=zs[-1].lower() == "n")
    if crs.startswith("ps:"):
        return polar_stereo_inverse(x, y, south=crs.endswith("south"))
    if crs == "webmerc":
        return webmerc_inverse(x, y)
    raise ValueError(f"unknown crs {crs}")


def forward_udf(crs: str):
    """Column wrapper: (lon, lat) -> struct(x, y) via Arrow batches."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.types import DoubleType, StructField, StructType

    schema = StructType([StructField("x", DoubleType()), StructField("y", DoubleType())])

    @F.pandas_udf(schema)
    def fwd(lon: pd.Series, lat: pd.Series) -> pd.DataFrame:
        x, y = forward(crs, lon.to_numpy(np.float64), lat.to_numpy(np.float64))
        return pd.DataFrame({"x": x, "y": y})

    return fwd


# ----------------------------------------------------- RPC georeferencing
# 20-term cubic rational polynomial camera model (RPC00B term order, public
# NITF/STDI-0002 spec) — the WorldView L1B georeferencing the reference
# projects with `gdalwarp -rpc` (seagrass_lib.py:232-242) and evaluates
# term-by-term in coord_to_rpc_image (seagrass_lib.py:57-76).
_RPC_KEYS = [
    "LINE_OFF", "SAMP_OFF", "LAT_OFF", "LONG_OFF", "HEIGHT_OFF",
    "LINE_SCALE", "SAMP_SCALE", "LAT_SCALE", "LONG_SCALE", "HEIGHT_SCALE",
]


def rpc_poly(c: np.ndarray, L: np.ndarray, P: np.ndarray, H: np.ndarray) -> np.ndarray:
    """Evaluate one 20-coefficient cubic polynomial in normalized
    (L=lon_n, P=lat_n, H=h_n) — RPC00B term order 1, L, P, H, LP, LH, PH,
    L2, P2, H2, LPH, L3, LP2, LH2, L2P, P3, PH2, L2H, P2H, H3
    (seagrass_lib.py:66-69). Vectorized over arrays."""
    c = np.asarray(c, np.float64)
    return (c[0] + c[1] * L + c[2] * P + c[3] * H + c[4] * L * P
            + c[5] * L * H + c[6] * P * H + c[7] * L * L + c[8] * P * P
            + c[9] * H * H + c[10] * L * P * H + c[11] * L ** 3
            + c[12] * L * P * P + c[13] * L * H * H + c[14] * L * L * P
            + c[15] * P ** 3 + c[16] * P * H * H + c[17] * L * L * H
            + c[18] * P * P * H + c[19] * H ** 3)


def rpc_pack(rpc: dict) -> list:
    """RPC metadata dict -> flat 90-double list (10 offsets/scales in
    _RPC_KEYS order, then LINE_NUM/LINE_DEN/SAMP_NUM/SAMP_DEN x20) — the
    engine's column representation of GDAL's 'RPC' metadata domain."""
    out = [float(rpc[k]) for k in _RPC_KEYS]
    for key in ("LINE_NUM_COEFF", "LINE_DEN_COEFF", "SAMP_NUM_COEFF", "SAMP_DEN_COEFF"):
        v = rpc[key]
        coeffs = [float(x) for x in (v.split() if isinstance(v, str) else v)]
        if len(coeffs) != 20:
            raise ValueError(f"{key}: expected 20 coefficients, got {len(coeffs)}")
        out.extend(coeffs)
    return out


def rpc_unpack(arr) -> dict:
    a = np.asarray(arr, np.float64)
    if a.size != 90:
        raise ValueError(f"packed RPC must be 90 doubles, got {a.size}")
    d = {k: float(a[i]) for i, k in enumerate(_RPC_KEYS)}
    d["LINE_NUM_COEFF"] = a[10:30]
    d["LINE_DEN_COEFF"] = a[30:50]
    d["SAMP_NUM_COEFF"] = a[50:70]
    d["SAMP_DEN_COEFF"] = a[70:90]
    return d


def rpc_ground_to_image(rpc: dict, lon, lat, height=0.0):
    """(lon, lat, h) -> fractional (col/sample, row/line) — the reference's
    coord_to_rpc_image (seagrass_lib.py:57-76) without the int() floor, so
    the result feeds resampling directly. Vectorized."""
    lon = np.asarray(lon, np.float64)
    lat = np.asarray(lat, np.float64)
    h = np.broadcast_to(np.asarray(height, np.float64), lon.shape)
    L = (lon - rpc["LONG_OFF"]) / rpc["LONG_SCALE"]
    P = (lat - rpc["LAT_OFF"]) / rpc["LAT_SCALE"]
    H = (h - rpc["HEIGHT_OFF"]) / rpc["HEIGHT_SCALE"]
    col = (rpc_poly(rpc["SAMP_NUM_COEFF"], L, P, H)
           / rpc_poly(rpc["SAMP_DEN_COEFF"], L, P, H)) * rpc["SAMP_SCALE"] + rpc["SAMP_OFF"]
    row = (rpc_poly(rpc["LINE_NUM_COEFF"], L, P, H)
           / rpc_poly(rpc["LINE_DEN_COEFF"], L, P, H)) * rpc["LINE_SCALE"] + rpc["LINE_OFF"]
    return col, row


def rpc_image_to_ground(rpc: dict, col, row, height=0.0, iters: int = 15):
    """(col, row, h) -> (lon, lat): Newton iteration on the normalized 2x2
    system with finite-difference Jacobian — the same inversion strategy as
    GDAL's RPC transformer (there is no closed form). Converges
    quadratically for well-conditioned satellite RPCs."""
    col = np.asarray(col, np.float64)
    row = np.asarray(row, np.float64)
    h = np.broadcast_to(np.asarray(height, np.float64), col.shape)
    H = (h - rpc["HEIGHT_OFF"]) / rpc["HEIGHT_SCALE"]
    # target in normalized image units
    tc = (col - rpc["SAMP_OFF"]) / rpc["SAMP_SCALE"]
    tr = (row - rpc["LINE_OFF"]) / rpc["LINE_SCALE"]

    def fwd(L, P):
        c = rpc_poly(rpc["SAMP_NUM_COEFF"], L, P, H) / rpc_poly(rpc["SAMP_DEN_COEFF"], L, P, H)
        r = rpc_poly(rpc["LINE_NUM_COEFF"], L, P, H) / rpc_poly(rpc["LINE_DEN_COEFF"], L, P, H)
        return c, r

    L = np.zeros_like(col)
    P = np.zeros_like(col)
    eps = 1e-6
    for _ in range(iters):
        c0, r0 = fwd(L, P)
        fx = c0 - tc
        fy = r0 - tr
        cl, rl = fwd(L + eps, P)
        cp, rp = fwd(L, P + eps)
        j00 = (cl - c0) / eps  # dc/dL
        j01 = (cp - c0) / eps  # dc/dP
        j10 = (rl - r0) / eps  # dr/dL
        j11 = (rp - r0) / eps  # dr/dP
        det = j00 * j11 - j01 * j10
        det = np.where(np.abs(det) < 1e-15, 1e-15, det)
        L = L - (j11 * fx - j01 * fy) / det
        P = P - (-j10 * fx + j00 * fy) / det
    return L * rpc["LONG_SCALE"] + rpc["LONG_OFF"], P * rpc["LAT_SCALE"] + rpc["LAT_OFF"]
