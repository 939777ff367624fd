"""Invariant tests for the rows-only registry queries the driver can't
value-check: winnowing fingerprints and the approximate distinct count."""

from pyspark.sql import functions as F

from building_permissions_etl_spark.catalog import load_table
from building_permissions_etl_spark.operators.textstats import doc_fingerprint


def test_fingerprint_identity_and_sensitivity(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog today"),
         (2, "the quick brown fox jumps over the lazy dog today"),   # exact dup
         (3, "a completely different document about spark engines"),
         (4, "")],
        "doc_id long, text string",
    )
    fps = {r["id"]: r["fingerprint"] for r in doc_fingerprint(df, "text", "doc_id").collect()}
    assert fps[1] == fps[2]            # identical text → identical fingerprint
    assert fps[1] != fps[3]            # different text → different fingerprint
    assert fps[4] is not None          # empty text still fingerprints


def test_fingerprint_deterministic_across_runs(spark):
    docs = load_table(spark, "documents", "/root/testdata/sf0.001")
    a = sorted(map(tuple, doc_fingerprint(docs, "text", "doc_id").collect()))
    b = sorted(map(tuple, doc_fingerprint(docs, "text", "doc_id").collect()))
    assert a == b


def test_approx_count_distinct_within_rsd(spark):
    li = load_table(spark, "lineitem", "/root/testdata/sf0.01")
    exact = li.select(F.countDistinct("l_shipdate")).first()[0]
    approx = li.select(F.approx_count_distinct("l_shipdate", rsd=0.05)).first()[0]
    assert abs(approx - exact) / exact < 0.15   # 3× the configured rsd
