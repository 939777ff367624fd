"""Unit contracts for the training-curation operators (splits, mixture
resampling, Gopher rules, int8-quantized similarity) beyond the oracle
parity sweep: error paths, invariants, and determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from building_permissions_etl_spark.catalog import load_table
from building_permissions_etl_spark.operators import corpus as C
from building_permissions_etl_spark.operators import similarity as S
from building_permissions_etl_spark.operators import textstats as T

SF = "/root/testdata/sf0.001"


def test_assign_split_partitions_every_row(spark):
    docs = load_table(spark, "documents", SF)
    out = C.assign_split(docs, "doc_id")
    total = docs.count()
    by_split = {r["split"]: r["count"]
                for r in out.groupBy("split").count().collect()}
    assert sum(by_split.values()) == total
    assert set(by_split) <= {"train", "val", "test"}
    assert by_split.get("train", 0) > by_split.get("val", 0)


def test_assign_split_rejects_bad_weights(spark):
    docs = load_table(spark, "documents", SF)
    with pytest.raises(ValueError, match="sum to 10000"):
        C.assign_split(docs, "doc_id", buckets=(("train", 5000), ("val", 100)))


def test_assign_split_deterministic(spark):
    docs = load_table(spark, "documents", SF)
    a = sorted(C.assign_split(docs, "doc_id").select("doc_id", "split").collect())
    b = sorted(C.assign_split(docs, "doc_id").select("doc_id", "split").collect())
    assert a == b


def test_resample_to_mix_respects_proportions(spark):
    docs = load_table(spark, "documents", SF)
    weights = {"src0": 0.5, "src1": 0.5}
    kept = C.resample_to_mix(docs, "source", "doc_id", weights)
    counts = {r["source"]: r["n"] for r in
              kept.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(counts) <= {"src0", "src1"}
    n0, n1 = counts.get("src0", 0), counts.get("src1", 0)
    # equal weights on equal-sized fixture groups: counts within hash noise
    assert abs(n0 - n1) <= max(2, 0.5 * max(n0, n1))


def test_resample_to_mix_rejects_bad_weights(spark):
    docs = load_table(spark, "documents", SF)
    with pytest.raises(ValueError, match="positive"):
        C.resample_to_mix(docs, "source", "doc_id", {"src0": -1.0})
    with pytest.raises(ValueError, match="non-empty"):
        C.resample_to_mix(docs, "source", "doc_id", {})


def test_gopher_rules_keep_is_conjunction(spark):
    docs = load_table(spark, "documents", SF)
    out = T.gopher_rules(docs, "text", "doc_id")
    bad = out.filter(
        F.col("keep")
        != (F.col("rule_words") & F.col("rule_word_len") & F.col("rule_stopwords"))
    ).count()
    assert bad == 0
    # thresholds chosen to actually split the fixture corpus
    kept = out.filter("keep").count()
    assert 0 < kept < out.count()


def test_topk_quantized_close_to_exact(spark):
    emb = load_table(spark, "embeddings", SF)
    exact = [r["id"] for r in
             S.topk_bruteforce(emb, "embedding", "vec_id", query_id=0, k=10).collect()]
    quant = [r["id"] for r in
             S.topk_quantized(emb, "embedding", "vec_id", query_id=0, k=10).collect()]
    # int8 quantization preserves most of the exact top-10 neighborhood
    assert len(set(exact) & set(quant)) >= 6


def test_topk_quantized_validates_query_id(spark):
    emb = load_table(spark, "embeddings", SF)
    with pytest.raises(ValueError, match="not found"):
        S.topk_quantized(emb, "embedding", "vec_id", query_id=10**9, k=5)


def test_quantize_int8_bounds(spark):
    emb = load_table(spark, "embeddings", SF)
    scale = S.quantize_scale(F.col("embedding"))
    q = S.quantize_int8(F.col("embedding"), scale)
    row = emb.select(
        F.array_max(q).alias("mx"), F.array_min(q).alias("mn")
    ).agg(F.max("mx").alias("mx"), F.min("mn").alias("mn")).collect()[0]
    assert row["mx"] <= 127 and row["mn"] >= -127


def test_resample_to_mix_rejects_absent_group(spark):
    docs = load_table(spark, "documents", SF)
    with pytest.raises(ValueError, match="no rows"):
        C.resample_to_mix(docs, "source", "doc_id",
                          {"src0": 0.5, "src_absent": 0.5})


def test_gopher_rules_empty_doc_mean_is_null(spark):
    df = spark.createDataFrame(
        [(1, "the a the a " * 10), (2, "   "), (3, "")],
        "doc_id long, text string")
    rows = {r["doc_id"]: r for r in
            T.gopher_rules(df, "text", "doc_id").collect()}
    for empty_id in (2, 3):
        assert rows[empty_id]["word_count"] == 0
        assert rows[empty_id]["mean_word_len"] is None
        assert rows[empty_id]["rule_word_len"] is None
        assert rows[empty_id]["keep"] is False


def test_assign_split_null_id_still_lands_in_a_split(spark):
    df = spark.createDataFrame([(None, "x"), (1, "y")],
                               "doc_id long, text string")
    out = C.assign_split(df, "doc_id").collect()
    assert all(r["split"] in ("train", "val", "test") for r in out)


def test_query_quantized_matches_oneshot(spark):
    emb = load_table(spark, "embeddings", SF)
    idx = S.build_quantized_index(emb, "embedding", "vec_id")
    try:
        via_index = [(r["id"], r["score"]) for r in
                     S.query_quantized(idx, query_id=0, k=10).collect()]
        oneshot = [(r["id"], r["score"]) for r in
                   S.topk_quantized(emb, "embedding", "vec_id",
                                    query_id=0, k=10).collect()]
        assert via_index == oneshot
        with pytest.raises(ValueError, match="not found"):
            S.query_quantized(idx, query_id=10**9)
    finally:
        idx.unpersist()


def test_quantize_zero_vector_is_all_zeros(spark):
    df = spark.createDataFrame(
        [(0, [0.0] * 8), (1, [1.0] * 8)],
        "vec_id long, embedding array<float>")
    idx = S.build_quantized_index(df, "embedding", "vec_id")
    try:
        rows = {r["__qid"]: r for r in idx.collect()}
        # zero vector: 1e-12 scale floor, elements quantize to 0 (no NaN)
        assert list(rows[0]["__qvec"]) == [0] * 8
        out = S.query_quantized(idx, query_id=0, k=1).collect()
        assert out[0]["score"] == 0.0
    finally:
        idx.unpersist()


def test_resample_temperature_boosts_low_resource(spark):
    # skew the corpus: src0 gets 4x the docs of src1; alpha=0.5 must keep
    # src1's share ABOVE its natural share (boost) while never upsampling
    base = load_table(spark, "documents", SF).select("doc_id", "source")
    skewed = base.filter(F.col("source") == "src0").union(
        base.filter(F.col("source") == "src0")
        .withColumn("doc_id", F.col("doc_id") + 100000)
    ).union(base.filter(F.col("source").isin("src0", "src1")))
    kept = C.resample_temperature(skewed, "source", "doc_id",
                                  ["src0", "src1"], alpha=0.5)
    counts = {r["source"]: r["n"] for r in
              kept.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    orig = {r["source"]: r["n"] for r in
            skewed.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    nat_share = orig["src1"] / (orig["src0"] + orig["src1"])
    kept_share = counts["src1"] / (counts["src0"] + counts["src1"])
    assert kept_share > nat_share
    assert counts["src1"] <= orig["src1"]  # never upsampled


def test_resample_temperature_validates(spark):
    docs = load_table(spark, "documents", SF)
    with pytest.raises(ValueError, match="alpha"):
        C.resample_temperature(docs, "source", "doc_id", ["src0"], alpha=0.0)
    with pytest.raises(ValueError, match="no rows"):
        C.resample_temperature(docs, "source", "doc_id", ["src_absent"])


def test_chunk_documents_partition_law(spark):
    docs = load_table(spark, "documents", SF)
    chunks = C.chunk_documents(docs, "text", "doc_id", budget=32)
    # chunk token counts per doc must sum to the doc's token count, with
    # every chunk full except possibly the last
    from building_permissions_etl_spark.operators.dedup import tokens as _t
    per_doc = {r["doc_id"]: r["n"] for r in docs.select(
        "doc_id", F.size(_t(F.col("text"))).alias("n")).collect()}
    got = {}
    for r in chunks.collect():
        got.setdefault(r["doc_id"], []).append((r["chunk_idx"], r["n_tokens"]))
    for doc_id, parts in got.items():
        parts.sort()
        assert sum(n for _, n in parts) == per_doc[doc_id]
        assert all(n == 32 for _, n in parts[:-1])
        assert [i for i, _ in parts] == list(range(len(parts)))


def test_chunk_documents_empty_doc_yields_no_rows(spark):
    df = spark.createDataFrame([(1, "  "), (2, "a b c")],
                               "doc_id long, text string")
    out = C.chunk_documents(df, "text", "doc_id", budget=2).collect()
    assert {r["doc_id"] for r in out} == {2}
    with pytest.raises(ValueError, match="budget"):
        C.chunk_documents(df, "text", "doc_id", budget=0)
