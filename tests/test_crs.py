"""CRS transform (functions/crs.py) and native shapefile reader
(sources/shapefile.py): the no-geo-library S3/C22-C23 path."""

from __future__ import annotations

import math
import struct

import pytest

from building_permissions_etl_spark.functions.crs import (
    from_wgs84,
    from_wgs84_sql,
    to_wgs84,
    to_wgs84_sql,
)


def test_central_meridian_anchor():
    # on the central meridian the easting is the false easting, exactly
    x, y = from_wgs84(19.0, 52.0)
    assert x == pytest.approx(500000.0, abs=1e-6)
    lon, lat = to_wgs84(500000.0, y)
    assert lon == pytest.approx(19.0, abs=1e-8)
    assert lat == pytest.approx(52.0, abs=1e-8)


def test_roundtrip_across_poland():
    worst = 0.0
    for lon in (14.2, 17.0, 19.0, 21.5, 24.1):
        for lat in (49.1, 51.0, 52.5, 54.8):
            x, y = from_wgs84(lon, lat)
            lo, la = to_wgs84(x, y)
            worst = max(worst, abs(lo - lon), abs(la - lat))
    assert worst < 5e-7  # < ~6 cm


def test_meridian_scale_factor():
    # 1 degree of latitude along the central meridian ≈ 111.2 km,
    # scaled by k0=0.9993
    _, y1 = from_wgs84(19.0, 52.0)
    _, y2 = from_wgs84(19.0, 53.0)
    assert (y2 - y1) == pytest.approx(111.2e3 * 0.9993, rel=2e-3)


def test_sql_matches_python_in_duckdb():
    import duckdb

    lon_sql, lat_sql = to_wgs84_sql("x", "y")
    x_sql, y_sql = from_wgs84_sql("lon", "lat")
    con = duckdb.connect()
    got = con.execute(
        f"SELECT {lon_sql} AS lon, {lat_sql} AS lat "
        f"FROM (SELECT 637102.0 AS x, 486157.0 AS y)"
    ).fetchone()
    exp = to_wgs84(637102.0, 486157.0)
    # libm vs java/duckdb trig may differ by a few ulps — the identical
    # EXPRESSION, evaluated to within float noise, is the contract
    assert got[0] == pytest.approx(exp[0], rel=1e-13)
    assert got[1] == pytest.approx(exp[1], rel=1e-13)
    got2 = con.execute(
        f"SELECT {x_sql} AS x, {y_sql} AS y "
        f"FROM (SELECT 21.5 AS lon, 53.25 AS lat)"
    ).fetchone()
    exp2 = from_wgs84(21.5, 53.25)
    assert got2[0] == pytest.approx(exp2[0], rel=1e-12)
    assert got2[1] == pytest.approx(exp2[1], rel=1e-12)


def test_sql_runs_jvm_side_in_spark(spark):
    from pyspark.sql import functions as F

    lon_sql, lat_sql = to_wgs84_sql("x", "y")
    df = spark.range(1).selectExpr(
        "500000.0 + 1000 * id AS x", "459309.2098773988 AS y"
    ).select(
        F.expr(lon_sql).alias("lon"), F.expr(lat_sql).alias("lat")
    )
    row = df.first()
    assert row["lon"] == pytest.approx(19.0, abs=1e-8)
    assert row["lat"] == pytest.approx(52.0, abs=1e-8)
    # pure Column arithmetic → whole-stage codegen ("*(n)" stage
    # prefix), no Python stage
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "*(1)" in plan
    assert "Python" not in plan


# --------------------------------------------------------- shapefile


def _write_shapefile(tmp_path, records, fields, rows):
    """Minimal .shp/.dbf writer (test fixture): polygon records only."""
    shp = bytearray()
    body = bytearray()
    for i, rings in enumerate(records):
        content = bytearray()
        content += struct.pack("<i", 5)  # polygon
        xs = [p[0] for r in rings for p in r]
        ys = [p[1] for r in rings for p in r]
        content += struct.pack("<4d", min(xs), min(ys), max(xs), max(ys))
        content += struct.pack("<ii", len(rings), sum(len(r) for r in rings))
        off = 0
        for r in rings:
            content += struct.pack("<i", off)
            off += len(r)
        for r in rings:
            for x, y in r:
                content += struct.pack("<2d", x, y)
        body += struct.pack(">ii", i + 1, len(content) // 2)
        body += content
    total_words = (100 + len(body)) // 2
    shp += struct.pack(">i", 9994) + b"\x00" * 20
    shp += struct.pack(">i", total_words)
    shp += struct.pack("<ii", 1000, 5)
    shp += struct.pack("<8d", 0, 0, 0, 0, 0, 0, 0, 0)
    shp += body
    (tmp_path / "t.shp").write_bytes(bytes(shp))

    dbf = bytearray()
    record_size = 1 + sum(length for _, length in fields)
    header_size = 32 + 32 * len(fields) + 1
    dbf += bytes([0x03, 124, 1, 1])
    dbf += struct.pack("<i", len(rows))
    dbf += struct.pack("<hh", header_size, record_size)
    dbf += b"\x00" * 20
    for name, length in fields:
        dbf += name.encode("ascii").ljust(11, b"\x00")
        dbf += b"C" + b"\x00" * 4 + bytes([length, 0]) + b"\x00" * 14
    dbf += b"\x0d"
    for row in rows:
        dbf += b" "
        for (name, length) in fields:
            dbf += row[name].encode("cp1250").ljust(length)[:length]
    (tmp_path / "t.dbf").write_bytes(bytes(dbf))
    return str(tmp_path / "t.shp")


# outer rings CW (negative signed area), holes CCW — per the spec
_SQUARE_CW = [(0.0, 0.0), (0.0, 10.0), (10.0, 10.0), (10.0, 0.0), (0.0, 0.0)]
_HOLE_CCW = [(2.0, 2.0), (4.0, 2.0), (4.0, 4.0), (2.0, 4.0), (2.0, 2.0)]
_ISLAND_CW = [(20.0, 20.0), (20.0, 25.0), (25.0, 25.0), (25.0, 20.0), (20.0, 20.0)]


def test_read_shp_dbf_and_wkt_assembly(tmp_path):
    from building_permissions_etl_spark.sources.shapefile import (
        read_dbf,
        read_shp,
        rings_to_wkt,
        shapefile_records,
    )

    path = _write_shapefile(
        tmp_path,
        [[_SQUARE_CW, _HOLE_CCW, _ISLAND_CW], [_ISLAND_CW]],
        [("JPT_KOD_JE", 4), ("JPT_NAZWA_", 30)],
        [
            {"JPT_KOD_JE": "0201", "JPT_NAZWA_": "powiat bolesławiecki"},
            {"JPT_KOD_JE": "0202", "JPT_NAZWA_": "powiat dzierżoniowski"},
        ],
    )
    geoms = read_shp(path)
    assert [g["type"] for g in geoms] == ["polygon", "polygon"]
    assert len(geoms[0]["rings"]) == 3
    attrs = read_dbf(path[:-4] + ".dbf")
    assert attrs[0]["JPT_KOD_JE"] == "0201"
    assert attrs[1]["JPT_NAZWA_"] == "powiat dzierżoniowski"  # cp1250 ż

    wkt = rings_to_wkt(geoms[0]["rings"])
    # two outer rings, the first carrying the hole
    assert wkt.startswith("MULTIPOLYGON (")
    assert "((0.0 0.0, 0.0 10.0, 10.0 10.0, 10.0 0.0, 0.0 0.0), "
    assert "(2.0 2.0, 4.0 2.0, 4.0 4.0, 2.0 4.0, 2.0 2.0))" in wkt
    assert rings_to_wkt(geoms[1]["rings"]).startswith("POLYGON ")

    recs = shapefile_records(path)
    assert [r[0] for r in recs] == ["0201", "0202"]
    assert all(r[2].startswith(("POLYGON", "MULTIPOLYGON")) for r in recs)


def test_geo_dim_from_shapefile_end_to_end(spark, tmp_path):
    """S3 parity without geopandas: read → reproject 2180→4326 → WKT dim.
    A square drawn in EPSG:2180 metres around the central meridian must
    land on lon≈19, lat≈52 in the dim's WKT."""
    from building_permissions_etl_spark.sources.geo import (
        geo_dim_from_shapefile,
    )

    sq = [
        (499000.0, 458000.0), (499000.0, 460000.0),
        (501000.0, 460000.0), (501000.0, 458000.0), (499000.0, 458000.0),
    ]
    # CW in easting/northing? signed area of this ring is negative: yes
    path = _write_shapefile(
        tmp_path, [[sq]], [("JPT_KOD_JE", 4), ("JPT_NAZWA_", 30)],
        [{"JPT_KOD_JE": "1465", "JPT_NAZWA_": "Warszawa"}],
    )
    dim = geo_dim_from_shapefile(spark, path)
    rows = dim.collect()
    assert len(rows) == 1 and rows[0]["JPT_KOD_JE"] == "1465"
    wkt = rows[0]["wkt"]
    assert wkt.startswith("POLYGON ")
    first_pt = wkt.split("(")[2].split(",")[0].split()
    lon, lat = float(first_pt[0]), float(first_pt[1])
    assert math.isclose(lon, 19.0, abs_tol=0.05)
    assert math.isclose(lat, 52.0, abs_tol=0.05)


def test_rings_to_wkt_degenerate_inputs_yield_valid_wkt():
    from building_permissions_etl_spark.sources.shapefile import rings_to_wkt

    assert rings_to_wkt([]) == "POLYGON EMPTY"
    assert rings_to_wkt([[]]) == "POLYGON EMPTY"
    # fewer than 4 points cannot close a ring
    assert rings_to_wkt([[(0.0, 0.0), (1.0, 1.0)]]) == "POLYGON EMPTY"


def test_unknown_prj_crs_is_refused(tmp_path):
    """A .prj naming a CRS the built-in backend cannot transform must
    raise, not silently run the 2180 inverse on foreign coordinates."""
    from building_permissions_etl_spark.sources.geo import _detect_source_epsg

    shp = tmp_path / "m.shp"
    shp.write_bytes(b"")
    (tmp_path / "m.prj").write_text(
        'PROJCS["WGS_1984_Web_Mercator_Auxiliary_Sphere",GEOGCS...'
        .replace("WGS_1984_", "")  # avoid the WGS84 marker
    )
    with pytest.raises(ValueError, match="unrecognized source CRS"):
        _detect_source_epsg(str(shp))
    # the two supported cases still resolve
    (tmp_path / "m.prj").write_text('PROJCS["ETRS_1989_Poland_CS92",...')
    assert _detect_source_epsg(str(shp)) == 2180
    (tmp_path / "m.prj").write_text('GEOGCS["GCS_WGS_1984",...')
    assert _detect_source_epsg(str(shp)) == 4326


def test_roundtrip_property_hypothesis():
    """Property: forward∘inverse ≈ identity everywhere in the EPSG:2180
    domain (and a bit beyond), not just at hand-picked anchors."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=200, deadline=None)
    @given(
        lon=st.floats(min_value=13.5, max_value=24.5),
        lat=st.floats(min_value=48.5, max_value=55.5),
    )
    def check(lon, lat):
        x, y = from_wgs84(lon, lat)
        lo, la = to_wgs84(x, y)
        assert abs(lo - lon) < 1e-6 and abs(la - lat) < 1e-6

    check()
