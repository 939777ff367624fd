"""Multimodal plumbing tests: schema, batch shapes, stub gating."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from building_permissions_etl_spark.catalog import load_table
from building_permissions_etl_spark.operators.multimodal import (
    N_FEATURES,
    assets_from_documents,
    decode_asset,
    extract_features,
    frame_sample,
)

SF = "/root/testdata/sf0.001"


def test_decode_stub_gated():
    with pytest.raises(NotImplementedError):
        decode_asset(b"abc", "image", fake=False)
    assert len(decode_asset(b"abc", "image", fake=True)) == N_FEATURES


def test_assets_schema(spark):
    assets = assets_from_documents(load_table(spark, "documents", SF))
    assert dict(assets.dtypes)["payload"] == "binary"
    kinds = {r.kind for r in assets.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_extract_features_batches(spark):
    assets = assets_from_documents(load_table(spark, "documents", SF))
    feats = extract_features(assets, fake=True)
    rows = feats.collect()
    assert len(rows) == assets.count()
    r = rows[0]
    assert len(r.features) == N_FEATURES
    assert abs(sum(r.features) - 1.0) < 1e-3      # histogram normalized
    assert r.n_bytes > 0


def test_frame_sample_shape(spark):
    assets = assets_from_documents(load_table(spark, "documents", SF))
    frames = frame_sample(assets, every_n_bytes=64, max_frames=4)
    agg = frames.groupBy("asset_id").agg(F.count(F.lit(1)).alias("n")).collect()
    assert all(1 <= r.n <= 4 for r in agg)
    one = frames.first()
    assert isinstance(one.frame_bytes, (bytes, bytearray))
    assert len(one.frame_bytes) <= 64


def test_resize_assets_shrinks_payload(spark):
    from building_permissions_etl_spark.catalog import load_table
    from building_permissions_etl_spark.operators.multimodal import (
        assets_from_documents,
        resize_assets,
    )
    from pyspark.sql import functions as F

    assets = assets_from_documents(
        load_table(spark, "documents", "/root/testdata/sf0.001")
    )
    resized = resize_assets(assets, target_w=8, target_h=8)
    joined = (
        assets.select("asset_id", F.length("payload").alias("before"))
        .join(resized.select("asset_id", F.length("payload").alias("after"),
                             "width", "height"), "asset_id")
    )
    row = joined.agg(
        F.count(F.when(F.col("after") > F.col("before"), 1)).alias("grew"),
        F.max("width").alias("mw"), F.max("height").alias("mh"),
    ).first()
    assert row["grew"] == 0          # striding never grows a payload
    assert row["mw"] <= 8 and row["mh"] <= 8
    assert resized.count() == assets.count()


def test_metadata_query_never_reads_payload(spark, tmp_path):
    """Column pruning must reach the parquet scan: a metadata-only query
    over the assets table reads width/height, never the binary payload."""
    from building_permissions_etl_spark.catalog import load_table
    from building_permissions_etl_spark.operators.multimodal import assets_from_documents
    from pyspark.sql import functions as F

    path = str(tmp_path / "assets")
    assets_from_documents(
        load_table(spark, "documents", "/root/testdata/sf0.001")
    ).write.parquet(path)
    q = (
        spark.read.parquet(path)
        .groupBy("kind")
        .agg(F.avg("width").alias("w"), F.avg("height").alias("h"))
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    import re
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    assert schemas and all("payload" not in s for s in schemas), plan
