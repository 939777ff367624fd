"""The spark-submit CLI surface: each task runs end to end with a
logical date and filesystem paths, like the reference's DAG tasks."""

import zipfile

from building_permissions_etl_spark.pipeline.cli import run
from tests.test_pipeline import _csv_rows, _write_csv


def _powiaty_parquet(spark, tmp_path):
    rows = [("1465", "Warsaw County", "P"), ("0201", "Wroclaw County", "P"),
            ("0463", "Krakow County", "P"), ("2261", "Gdansk County", "P")]
    p = str(tmp_path / "powiaty")
    spark.createDataFrame(rows, ["JPT_KOD_JE", "JPT_NAZWA_", "geometry"]).write.parquet(p)
    return p


def test_cli_download(spark, tmp_path):
    src = tmp_path / "data.zip"
    with zipfile.ZipFile(src, "w") as zf:
        zf.writestr("perms.csv", "a#b\n1#2\n")
    out = run(spark, [
        "download", "--date", "2022-07-01",
        "--zip-url", src.as_uri(),
        "--zip-path", str(tmp_path / "dl.zip"),
        "--extract-to", str(tmp_path / "ex"),
    ])
    assert out["task"] == "download" and len(out["files"]) == 1


def test_cli_validate_ingest_aggregate(spark, tmp_path):
    csv = str(tmp_path / "perms.csv")
    _write_csv(csv, _csv_rows())
    powiaty = _powiaty_parquet(spark, tmp_path)
    fact, agg = str(tmp_path / "fact"), str(tmp_path / "agg")
    report = str(tmp_path / "report.html")

    v = run(spark, ["validate", "--date", "2022-07-01", "--csv", csv,
                    "--report", report])
    assert v["task"] == "validate"
    assert "results" in v and open(report).read().startswith("<html>")

    i = run(spark, ["ingest", "--date", "2022-07-01", "--csv", csv,
                    "--fact", fact, "--powiaty", powiaty])
    assert i["task"] == "ingest" and i["mode"] == "full"

    a = run(spark, ["aggregate", "--date", "2022-07-01", "--fact", fact,
                    "--agg", agg, "--powiaty", powiaty])
    assert a["aggregate_rows"] == 4   # one row per county, completed

    everything = run(spark, ["all", "--date", "2022-07-01", "--csv", csv,
                             "--fact", fact, "--agg", agg, "--powiaty", powiaty])
    assert everything["task"] == "all" and everything["aggregate_rows"] == 4
