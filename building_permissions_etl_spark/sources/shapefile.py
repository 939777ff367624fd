"""S3: native ESRI shapefile reader — no geopandas required.

The reference reads ``powiaty.shp`` with ``gpd.read_file`` and ships
(code, name, WKT) string rows (helpers:774-779). geopandas isn't in this
container, so this module parses the two relevant members of the public
ESRI shapefile format (ESRI Shapefile Technical Description, 1998) and
the dBase III attribute file directly:

  * ``.shp`` — main file: 100-byte header, then per-record
    [record header (big-endian), shape type (little-endian), geometry].
    Shape types handled: 0 (null), 1 (point), 3 (polyline), 5 (polygon)
    — plus their *M/*Z variants, whose XY block has the same layout.
  * ``.dbf`` — attributes: fixed-width records described by 32-byte
    field descriptors; text decoded as cp1250 (the encoding Polish
    administrative shapefiles ship) with latin-1 fallback.

Polygon records are ring soups: outer rings wind clockwise, holes
counter-clockwise (per spec). WKT assembly computes each ring's signed
area, assigns every hole to the innermost enclosing outer ring
(even-odd point-in-polygon on the ring's first vertex), and emits
POLYGON/MULTIPOLYGON accordingly.

This is a DRIVER-side source like the reference's GeoDataFrame load:
the dim is ~380 rows and feeds ``geo_dim_from_records``. At 100 TB the
facts grow; this file never does.
"""

from __future__ import annotations

import struct
from collections.abc import Callable


def _rings_from_polygon_record(buf: bytes, off: int) -> list[list[tuple[float, float]]]:
    num_parts, num_points = struct.unpack_from("<ii", buf, off + 36)
    parts = list(struct.unpack_from(f"<{num_parts}i", buf, off + 44))
    pts_off = off + 44 + 4 * num_parts
    xy = struct.unpack_from(f"<{2 * num_points}d", buf, pts_off)
    parts.append(num_points)
    return [
        [(xy[2 * i], xy[2 * i + 1]) for i in range(parts[p], parts[p + 1])]
        for p in range(num_parts)
    ]


def read_shp(path: str) -> list[dict]:
    """Parse a ``.shp`` main file → list of {type, points|rings}."""
    with open(path, "rb") as f:
        buf = f.read()
    file_code, = struct.unpack_from(">i", buf, 0)
    if file_code != 9994:
        raise ValueError(f"{path}: not a shapefile (file code {file_code})")
    file_len = struct.unpack_from(">i", buf, 24)[0] * 2  # 16-bit words
    geoms: list[dict] = []
    off = 100
    while off < min(file_len, len(buf)):
        _, content_len = struct.unpack_from(">ii", buf, off)
        shape_type, = struct.unpack_from("<i", buf, off + 8)
        base = shape_type % 10  # *M (2x) and *Z (1x) share the XY layout
        if base == 0:
            geoms.append({"type": "null"})
        elif base == 1:
            x, y = struct.unpack_from("<2d", buf, off + 12)
            geoms.append({"type": "point", "points": [(x, y)]})
        elif base in (3, 5):
            rings = _rings_from_polygon_record(buf, off + 8)
            geoms.append(
                {"type": "polyline" if base == 3 else "polygon", "rings": rings}
            )
        else:
            raise ValueError(f"{path}: unsupported shape type {shape_type}")
        off += 8 + content_len * 2
    return geoms


def read_dbf(path: str) -> list[dict]:
    """Parse a dBase III ``.dbf`` → list of {field: str} (all strings,
    like the reference's all-STRING BigQuery schema)."""
    with open(path, "rb") as f:
        buf = f.read()
    n_records, = struct.unpack_from("<i", buf, 4)
    header_size, record_size = struct.unpack_from("<hh", buf, 8)
    fields = []
    off = 32
    while buf[off] != 0x0D:
        name = buf[off:off + 11].split(b"\x00")[0].decode("ascii", "replace")
        length = buf[off + 16]
        fields.append((name, length))
        off += 32
    rows = []
    off = header_size
    for _ in range(n_records):
        if buf[off:off + 1] == b"*":  # deleted record
            off += record_size
            continue
        pos = off + 1
        row = {}
        for name, length in fields:
            raw = buf[pos:pos + length]
            try:
                row[name] = raw.decode("cp1250").strip()
            except UnicodeDecodeError:
                row[name] = raw.decode("latin-1").strip()
            pos += length
        rows.append(row)
        off += record_size
    return rows


def _signed_area(ring: list[tuple[float, float]]) -> float:
    s = 0.0
    for (x1, y1), (x2, y2) in zip(ring, ring[1:]):
        s += x1 * y2 - x2 * y1
    return s / 2.0


def _point_in_ring(pt: tuple[float, float], ring: list[tuple[float, float]]) -> bool:
    x, y = pt
    inside = False
    for (x1, y1), (x2, y2) in zip(ring, ring[1:]):
        if (y1 > y) != (y2 > y) and x < (x2 - x1) * (y - y1) / (y2 - y1) + x1:
            inside = not inside
    return inside


def _fmt_ring(ring: list[tuple[float, float]], nd: int) -> str:
    # repr() = shortest round-tripping decimal (":g" would clip to 6
    # significant digits and destroy coordinate precision)
    return "(" + ", ".join(
        f"{round(x, nd)!r} {round(y, nd)!r}" for x, y in ring
    ) + ")"


def rings_to_wkt(rings: list[list[tuple[float, float]]], ndigits: int = 7) -> str:
    """Ring soup → POLYGON / MULTIPOLYGON WKT. Outer rings are the
    clockwise ones (negative signed area, per the shapefile spec's
    screen-coordinate convention); each hole attaches to the smallest
    enclosing outer ring. Degenerate input (no ring with ≥ 4 points)
    yields valid ``POLYGON EMPTY``, never malformed markup."""
    rings = [r for r in rings if len(r) >= 4]  # a closed ring needs 4 pts
    if not rings:
        return "POLYGON EMPTY"
    outers = [r for r in rings if _signed_area(r) <= 0]
    holes = [r for r in rings if _signed_area(r) > 0]
    if not outers:  # degenerate: treat everything as outer
        outers, holes = holes, []
    polys: list[list[list[tuple[float, float]]]] = [[o] for o in outers]
    for h in holes:
        candidates = [
            i for i, o in enumerate(outers) if _point_in_ring(h[0], o)
        ]
        if candidates:
            best = min(candidates, key=lambda i: abs(_signed_area(outers[i])))
            polys[best].append(h)
        else:  # orphan hole: promote to its own polygon
            polys.append([h])
    if len(polys) == 1:
        return "POLYGON " + "(" + ", ".join(_fmt_ring(r, ndigits) for r in polys[0]) + ")"
    return "MULTIPOLYGON (" + ", ".join(
        "(" + ", ".join(_fmt_ring(r, ndigits) for r in poly) + ")"
        for poly in polys
    ) + ")"


def shapefile_records(
    shp_path: str,
    code_field: str = "JPT_KOD_JE",
    name_field: str = "JPT_NAZWA_",
    transform: Callable[[float, float], tuple[float, float]] | None = None,
    ndigits: int = 7,
) -> list[tuple[str, str, str]]:
    """``powiaty.shp`` + ``powiaty.dbf`` → [(code, name, wkt)] with an
    optional per-point coordinate ``transform`` (e.g.
    ``functions.crs.to_wgs84`` for the reference's ``to_crs(4326)``).
    """
    dbf_path = shp_path[:-4] + ".dbf" if shp_path.endswith(".shp") else shp_path + ".dbf"
    geoms = read_shp(shp_path)
    attrs = read_dbf(dbf_path)
    if len(geoms) != len(attrs):
        raise ValueError(
            f"shapefile mismatch: {len(geoms)} shapes vs {len(attrs)} dbf rows"
        )
    out = []
    for geom, row in zip(geoms, attrs):
        if geom["type"] == "point":
            (x, y), = geom["points"]
            if transform is not None:
                x, y = transform(x, y)
            wkt = f"POINT ({round(x, ndigits)!r} {round(y, ndigits)!r})"
        elif geom["type"] == "null":
            wkt = "POLYGON EMPTY"
        elif geom["type"] == "polyline":
            parts = geom["rings"]
            if transform is not None:
                parts = [[transform(x, y) for x, y in p] for p in parts]
            wkt = "MULTILINESTRING (" + ", ".join(
                "(" + ", ".join(f"{round(x, ndigits)!r} {round(y, ndigits)!r}"
                                for x, y in p) + ")"
                for p in parts
            ) + ")" if parts else "MULTILINESTRING EMPTY"
        else:
            rings = geom["rings"]
            if transform is not None:
                rings = [[transform(x, y) for x, y in ring] for ring in rings]
            wkt = rings_to_wkt(rings, ndigits)
        out.append((row.get(code_field, ""), row.get(name_field, ""), wkt))
    return out
