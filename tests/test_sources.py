"""Driver-side source prep (S1 HTTP ZIP, S3 geo dim) and the S11 HTML
validation report."""

import zipfile

from building_permissions_etl_spark.catalog import load_table
from building_permissions_etl_spark.operators.validation import ORDERS_SUITE
from building_permissions_etl_spark.sources.geo import geo_dim_from_records
from building_permissions_etl_spark.sources.http_zip import download_and_unpack_zip


def test_download_and_unpack_zip_roundtrip(tmp_path):
    src = tmp_path / "payload.zip"
    with zipfile.ZipFile(src, "w") as zf:
        zf.writestr("a.csv", "id#name\n1#x\n")
        zf.writestr("sub/b.csv", "id#name\n2#y\n")
    out = download_and_unpack_zip(
        src.as_uri(), str(tmp_path / "dl" / "got.zip"), str(tmp_path / "ex")
    )
    assert sorted(p.rsplit("/", 1)[-1] for p in out) == ["a.csv", "b.csv"]
    with open(out[0]) as f:
        assert f.read().startswith("id#name")


def test_geo_dim_from_records(spark):
    dim = geo_dim_from_records(
        spark,
        [("1465", "Warszawa", "POINT (21 52)"), ("0201", "Bolesławiecki", "POINT (15 51)")],
    )
    assert dim.columns == ["JPT_KOD_JE", "JPT_NAZWA_", "wkt"]
    assert dim.count() == 2
    assert dict(dim.dtypes) == {"JPT_KOD_JE": "string", "JPT_NAZWA_": "string", "wkt": "string"}


def test_validation_html_report(spark, tmp_path):
    orders = load_table(spark, "orders", "/root/testdata/sf0.001")
    out = tmp_path / "report.html"
    rep = ORDERS_SUITE.render_html(orders, str(out))
    html = out.read_text()
    assert rep["success"] is True
    assert "Validation succeeded" in html
    for name in rep["results"]:
        assert name in html


def test_dissolve_wkt_groups_counties_into_voivodeship_multipolygons(spark):
    """A10 analog: counties collapse into one MULTIPOLYGON per
    voivodeship (code prefix), members sorted, polygon and multipolygon
    inputs both handled."""
    from building_permissions_etl_spark.sources.geo import (
        dissolve_wkt,
        geo_dim_from_records,
    )

    recs = [
        ("0201", "a", "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"),
        ("0202", "b", "MULTIPOLYGON (((1 0, 2 0, 2 1, 1 1, 1 0)), "
                      "((5 5, 6 5, 6 6, 5 6, 5 5)))"),
        ("0401", "c", "POLYGON ((9 9, 10 9, 10 10, 9 10, 9 9))"),
    ]
    out = {r.voivodeship: r for r in
           dissolve_wkt(geo_dim_from_records(spark, recs)).collect()}
    assert set(out) == {"02", "04"}
    assert out["02"].n_members == 2
    # all three member polygons of voivodeship 02 present in the output
    for part in ["((0 0, 1 0, 1 1, 0 1, 0 0))",
                 "((1 0, 2 0, 2 1, 1 1, 1 0))",
                 "((5 5, 6 5, 6 6, 5 6, 5 5))"]:
        assert part in out["02"].wkt
    assert out["02"].wkt.startswith("MULTIPOLYGON (") and out["02"].wkt.endswith(")")
    assert out["04"].wkt == "MULTIPOLYGON (((9 9, 10 9, 10 10, 9 10, 9 9)))"


def test_zip_extract_returns_files_not_directories(spark, tmp_path):
    import zipfile

    from building_permissions_etl_spark.sources.http_zip import (
        download_and_unpack_zip,
    )

    src = tmp_path / "d.zip"
    with zipfile.ZipFile(src, "w") as zf:
        zf.writestr("data/", "")
        zf.writestr("data/a.csv", "x#y\n1#2\n")
        zf.writestr("b.csv", "x#y\n3#4\n")
    files = download_and_unpack_zip(
        src.as_uri(), str(tmp_path / "dl.zip"), str(tmp_path / "ex"))
    names = sorted(f.split("ex/")[-1] for f in files)
    assert names == ["b.csv", "data/a.csv"]  # no 'data/' dir entry
