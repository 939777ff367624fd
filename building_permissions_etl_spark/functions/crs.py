"""C22-C23: coordinate reprojection without a geo library.

The reference reprojects the county shapefile from PUWG 1992
(EPSG:2180, the Polish national grid) to WGS84 with geopandas
(``gdf.to_crs(4326)``, helpers:776). Neither geopandas nor pyproj nor
shapely is available here, so the transform is implemented from the
public Transverse Mercator closed-form series (Snyder, "Map
Projections — A Working Manual", USGS PP 1395, 1987, eqs. 8-9..8-25 —
public domain) on the GRS80 ellipsoid.

The formula is written ONCE against an abstract math namespace and
evaluated three ways:

  * ``ns=_PY``  → plain Python floats (driver-side shapefile load —
    the 380-row dim, mirroring the reference doing it in geopandas);
  * ``ns=_SQL`` → a SQL expression STRING restricted to the operator
    set Spark SQL and DuckDB share (``SIN COS TAN ATAN SQRT + - * /``),
    so the engine runs it JVM-side through ``F.expr`` (whole-stage
    codegen, zero UDFs) and the DuckDB oracle runs the IDENTICAL text —
    the driver's hash-compare then proves the reprojection math, not a
    reimplementation of it.

Series accuracy within the EPSG:2180 domain (Poland, ~14-24°E):
forward/inverse round-trips close to < 3e-7 degrees (~3 cm) at the zone
edges — far inside the tolerance of a county-level choropleth dim
(validated in tests/test_crs.py; the SQL and Python evaluations agree
bit-for-bit).
"""

from __future__ import annotations

import math

# GRS80 ellipsoid + EPSG:2180 projection parameters (public EPSG registry)
A = 6378137.0
F_INV = 298.257222101
E2 = (2.0 - 1.0 / F_INV) / F_INV      # first eccentricity squared
EP2 = E2 / (1.0 - E2)                 # second eccentricity squared
K0 = 0.9993
LON0_DEG = 19.0
FE = 500000.0
FN = -5300000.0

# meridian-arc series coefficients (constants folded in Python)
_M1 = 1.0 - E2 / 4.0 - 3.0 * E2**2 / 64.0 - 5.0 * E2**3 / 256.0
_M2 = 3.0 * E2 / 8.0 + 3.0 * E2**2 / 32.0 + 45.0 * E2**3 / 1024.0
_M3 = 15.0 * E2**2 / 256.0 + 45.0 * E2**3 / 1024.0
_M4 = 35.0 * E2**3 / 3072.0
_E1 = (1.0 - math.sqrt(1.0 - E2)) / (1.0 + math.sqrt(1.0 - E2))
_P2 = 3.0 * _E1 / 2.0 - 27.0 * _E1**3 / 32.0
_P4 = 21.0 * _E1**2 / 16.0 - 55.0 * _E1**4 / 32.0
_P6 = 151.0 * _E1**3 / 96.0
_P8 = 1097.0 * _E1**4 / 512.0


class _Expr:
    """SQL-emitting value: arithmetic builds an expression string using
    only syntax Spark SQL and DuckDB both parse identically."""

    __slots__ = ("s",)

    def __init__(self, s: str):
        self.s = s

    @staticmethod
    def _lift(v) -> str:
        return v.s if isinstance(v, _Expr) else repr(float(v))

    def _bin(self, op, other, flip=False):
        a, b = _Expr._lift(self), _Expr._lift(other)
        if flip:
            a, b = b, a
        return _Expr(f"({a} {op} {b})")

    def __add__(self, o):
        return self._bin("+", o)

    def __radd__(self, o):
        return self._bin("+", o, flip=True)

    def __sub__(self, o):
        return self._bin("-", o)

    def __rsub__(self, o):
        return self._bin("-", o, flip=True)

    def __mul__(self, o):
        return self._bin("*", o)

    def __rmul__(self, o):
        return self._bin("*", o, flip=True)

    def __truediv__(self, o):
        return self._bin("/", o)

    def __rtruediv__(self, o):
        return self._bin("/", o, flip=True)

    def __neg__(self):
        return _Expr(f"(0.0 - {self.s})")


class _SqlNS:
    @staticmethod
    def sin(v):
        return _Expr(f"SIN({_Expr._lift(v)})")

    @staticmethod
    def cos(v):
        return _Expr(f"COS({_Expr._lift(v)})")

    @staticmethod
    def tan(v):
        return _Expr(f"TAN({_Expr._lift(v)})")

    @staticmethod
    def atan(v):
        return _Expr(f"ATAN({_Expr._lift(v)})")

    @staticmethod
    def sqrt(v):
        return _Expr(f"SQRT({_Expr._lift(v)})")


_SQL = _SqlNS()
_PY = math


def _inverse_tm(x, y, ns):
    """EPSG:2180 easting/northing → (lon_deg, lat_deg). Snyder 8-12..8-25
    (inverse). ``x``/``y`` are numbers or ``_Expr``; ``ns`` supplies the
    transcendental functions."""
    mu = ((y - FN) / K0) / (A * _M1)
    phi1 = (mu + _P2 * ns.sin(2.0 * mu) + _P4 * ns.sin(4.0 * mu)
            + _P6 * ns.sin(6.0 * mu) + _P8 * ns.sin(8.0 * mu))
    sin1, cos1, tan1 = ns.sin(phi1), ns.cos(phi1), ns.tan(phi1)
    c1 = EP2 * cos1 * cos1
    t1 = tan1 * tan1
    w = 1.0 - E2 * sin1 * sin1
    n1 = A / ns.sqrt(w)
    r1 = A * (1.0 - E2) / (w * ns.sqrt(w))
    d = (x - FE) / (n1 * K0)
    d2 = d * d
    lat_rad = phi1 - (n1 * tan1 / r1) * (
        d2 / 2.0
        - (5.0 + 3.0 * t1 + 10.0 * c1 - 4.0 * c1 * c1 - 9.0 * EP2)
        * d2 * d2 / 24.0
        + (61.0 + 90.0 * t1 + 298.0 * c1 + 45.0 * t1 * t1
           - 252.0 * EP2 - 3.0 * c1 * c1) * d2 * d2 * d2 / 720.0
    )
    lon_rad_off = (
        d
        - (1.0 + 2.0 * t1 + c1) * d * d2 / 6.0
        + (5.0 - 2.0 * c1 + 28.0 * t1 - 3.0 * c1 * c1 + 8.0 * EP2
           + 24.0 * t1 * t1) * d * d2 * d2 / 120.0
    ) / cos1
    deg = 180.0 / math.pi
    return LON0_DEG + deg * lon_rad_off, deg * lat_rad


def _forward_tm(lon_deg, lat_deg, ns):
    """(lon_deg, lat_deg) → EPSG:2180 easting/northing. Snyder 8-9..8-13
    (forward)."""
    rad = math.pi / 180.0
    phi = rad * lat_deg
    dlam = rad * (lon_deg - LON0_DEG)
    sinp, cosp, tanp = ns.sin(phi), ns.cos(phi), ns.tan(phi)
    t = tanp * tanp
    c = EP2 * cosp * cosp
    al = dlam * cosp
    n = A / ns.sqrt(1.0 - E2 * sinp * sinp)
    m = A * (_M1 * phi - _M2 * ns.sin(2.0 * phi) + _M3 * ns.sin(4.0 * phi)
             - _M4 * ns.sin(6.0 * phi))
    al2 = al * al
    x = FE + K0 * n * (
        al
        + (1.0 - t + c) * al * al2 / 6.0
        + (5.0 - 18.0 * t + t * t + 72.0 * c - 58.0 * EP2)
        * al * al2 * al2 / 120.0
    )
    y = FN + K0 * (m + n * tanp * (
        al2 / 2.0
        + (5.0 - t + 9.0 * c + 4.0 * c * c) * al2 * al2 / 24.0
        + (61.0 - 58.0 * t + t * t + 600.0 * c - 330.0 * EP2)
        * al2 * al2 * al2 / 720.0
    ))
    return x, y


# ---------------------------------------------------------------- public


def to_wgs84(x: float, y: float) -> tuple[float, float]:
    """Driver-side scalar transform: EPSG:2180 (easting, northing) →
    (lon, lat) degrees."""
    return _inverse_tm(float(x), float(y), _PY)


def from_wgs84(lon: float, lat: float) -> tuple[float, float]:
    """Driver-side scalar transform: (lon, lat) degrees → EPSG:2180
    (easting, northing)."""
    return _forward_tm(float(lon), float(lat), _PY)


def to_wgs84_sql(x_col: str, y_col: str) -> tuple[str, str]:
    """(lon_sql, lat_sql) expression strings over easting/northing
    columns — valid in BOTH Spark SQL and DuckDB."""
    lon, lat = _inverse_tm(_Expr(x_col), _Expr(y_col), _SQL)
    return lon.s, lat.s


def from_wgs84_sql(lon_col: str, lat_col: str) -> tuple[str, str]:
    """(x_sql, y_sql) expression strings over lon/lat degree columns —
    valid in BOTH Spark SQL and DuckDB."""
    x, y = _forward_tm(_Expr(lon_col), _Expr(lat_col), _SQL)
    return x.s, y.s
