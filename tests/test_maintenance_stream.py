"""Maintained mergeable tables: batch operators + the streaming fold.

`plans/round9_queries.py` proves merge-equals-rebuild against DuckDB
oracles for the in-plan base/delta split; these tests pin the OPERATOR
surface (`operators/maintenance.py`) and the deployment shape
(`streaming/maintenance.py`): a multi-micro-batch stream folded with
foreachBatch must land on byte-identical state to a one-shot rebuild,
however the engine splits the feed."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from building_permissions_etl_spark.operators.maintenance import (
    BLOOM_WORDS,
    bloom_registers,
    extent_table,
    merge_bloom_registers,
    merge_extent_tables,
    might_contain_registers,
    registers_to_bits,
)
from building_permissions_etl_spark.streaming.maintenance import (
    fold_mergeable_stream,
)

SF_DIR = "/root/testdata/sf0.001"


def _orders(spark):
    return spark.read.parquet(f"{SF_DIR}/orders.parquet")


def _feed_dir(spark, tmp_path_factory=None):
    """Split orders into 4 files so maxFilesPerTrigger=1 yields 4
    micro-batches — the multi-batch fold the single-fixture-file feed
    cannot produce."""
    out = "/tmp/maint_feed_orders"
    shutil.rmtree(out, ignore_errors=True)
    _orders(spark).repartition(4).write.parquet(out)
    return out


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


# ---- batch operators ------------------------------------------------------

def test_merge_bloom_registers_is_associative_and_equals_rebuild(spark):
    od = _orders(spark)
    a = bloom_registers(od.filter("o_orderkey % 3 = 0"), "o_custkey")
    b = bloom_registers(od.filter("o_orderkey % 3 = 1"), "o_custkey")
    c = bloom_registers(od.filter("o_orderkey % 3 = 2"), "o_custkey")
    left = merge_bloom_registers(merge_bloom_registers(a, b), c)
    right = merge_bloom_registers(a, merge_bloom_registers(b, c))
    full = bloom_registers(od, "o_custkey")
    assert _rows(left) == _rows(right) == _rows(full)


def test_extent_merge_equals_rebuild(spark):
    od = _orders(spark).withColumn(
        "bkt", (F.col("o_custkey") % 16).cast("int"))
    parts = [extent_table(od.filter(f"o_orderkey % 3 = {i}"), "bkt",
                          ["o_totalprice", "o_orderdate"])
             for i in range(3)]
    assert _rows(merge_extent_tables(*parts)) == \
        _rows(extent_table(od, "bkt", ["o_totalprice", "o_orderdate"]))


def test_register_probe_no_false_negatives_and_bounded_fpp(spark):
    od = _orders(spark)
    bits = registers_to_bits(bloom_registers(od, "o_custkey"))
    keys = od.select("o_custkey").distinct()
    n_keys = keys.count()
    assert keys.filter(
        might_contain_registers(F.col("o_custkey"), bits)).count() == n_keys
    # absent keys: mostly rejected (n≈1.5k keys ⇒ 2·n/65536-ish load,
    # two probes ⇒ fpp well under 10%)
    absent = spark.range(10**9, 10**9 + 2000).select(
        F.col("id").alias("k"))
    fp = absent.filter(might_contain_registers(F.col("k"), bits)).count()
    assert fp < 200, f"false-positive rate too high: {fp}/2000"


def test_register_probe_rejects_wrong_geometry(spark):
    import pytest

    with pytest.raises(ValueError):
        might_contain_registers(F.lit(1), [0] * (BLOOM_WORDS - 1))
    with pytest.raises(ValueError):
        might_contain_registers(F.lit(1), [0] * 1000, words=1000)


def test_operator_registers_match_windowed_query_merge(spark):
    """The operator and the oracle-checked registry query
    (`bloom_incremental_union`) must build bit-identical registers:
    the query's merged_bits over its base/delta date split equals the
    operator's one-shot build over the whole table — pinning the two
    code paths to one hash scheme."""
    from building_permissions_etl_spark.plans.registry import queries

    q = {(r.word_idx, r.merged_bits) for r in
         queries()["bloom_incremental_union"](spark, SF_DIR).collect()}
    op = {(r.word_idx, r.bits) for r in
          bloom_registers(_orders(spark), "o_custkey").collect()}
    assert q == op


# ---- streaming fold -------------------------------------------------------

def test_stream_fold_bloom_equals_batch_rebuild(spark):
    feed_dir = _feed_dir(spark)
    feed = (spark.readStream.schema(_orders(spark).schema)
            .option("maxFilesPerTrigger", "1").parquet(feed_dir))
    seen = []
    final = fold_mergeable_stream(
        feed,
        to_partial=lambda b: bloom_registers(b, "o_custkey"),
        merge=merge_bloom_registers,
        state_sink=lambda df, bid: seen.append(bid),
    )
    assert len(seen) >= 2, "feed did not split into micro-batches"
    assert _rows(final) == _rows(bloom_registers(_orders(spark),
                                                 "o_custkey"))


def test_stream_fold_extents_with_initial_state(spark):
    od = _orders(spark)
    base = od.filter("o_orderkey % 2 = 0")
    delta = od.filter("o_orderkey % 2 = 1")
    ddir = "/tmp/maint_feed_delta"
    shutil.rmtree(ddir, ignore_errors=True)
    delta.repartition(3).write.parquet(ddir)

    def to_part(df):
        return extent_table(
            df.withColumn("bkt", (F.col("o_custkey") % 16).cast("int")),
            "bkt", ["o_totalprice"])

    feed = (spark.readStream.schema(od.schema)
            .option("maxFilesPerTrigger", "1").parquet(ddir))
    final = fold_mergeable_stream(
        feed, to_partial=to_part, merge=merge_extent_tables,
        initial_state=to_part(base))
    assert _rows(final) == _rows(to_part(od))


def test_stream_fold_histograms_feeds_drift_monitor(spark):
    """The drift-monitor histogram is itself a mergeable artifact
    (counts by bin), so the streaming fold maintains it too: folding
    per-micro-batch histograms must equal the one-shot snapshot, and
    the folded artifact must read zero drift against it."""
    from building_permissions_etl_spark.operators.validation import (
        histogram_snapshot,
        psi_drift,
    )

    od = _orders(spark)
    feed_dir = _feed_dir(spark)
    feed = (spark.readStream.schema(od.schema)
            .option("maxFilesPerTrigger", "1").parquet(feed_dir))

    def to_part(df):
        return histogram_snapshot(df, "o_totalprice", 0.0, 600_000.0)

    def merge(a, b):
        return (a.unionAll(b).groupBy("bin")
                .agg(F.sum("cnt").cast("bigint").alias("cnt")))

    folded = fold_mergeable_stream(feed, to_partial=to_part, merge=merge)
    oneshot = to_part(od)
    assert _rows(folded) == _rows(oneshot)
    assert psi_drift(folded, oneshot).first().psi == 0.0


def test_stream_fold_empty_feed_raises_without_initial_state(spark):
    import pytest

    edir = "/tmp/maint_feed_empty"
    shutil.rmtree(edir, ignore_errors=True)
    os.makedirs(edir)
    feed = (spark.readStream.schema(_orders(spark).schema)
            .option("maxFilesPerTrigger", "1").parquet(edir))
    with pytest.raises(ValueError):
        fold_mergeable_stream(
            feed,
            to_partial=lambda b: bloom_registers(b, "o_custkey"),
            merge=merge_bloom_registers)


def test_bloom_registers_drop_null_keys(spark):
    """Round-10 ADVICE fix: NULL keys are filtered before hashing —
    md5(NULL) probes would emit a NULL word_idx row that crashes
    registers_to_bits, while the probe side already treats NULL as
    absent. Build and probe now agree: a table built WITH nulls
    equals one built without, and registers_to_bits round-trips."""
    od = _orders(spark)
    with_nulls = od.withColumn(
        "k", F.when(F.col("o_orderkey") % 7 == 0, None)
             .otherwise(F.col("o_custkey")))
    clean = with_nulls.filter("k IS NOT NULL")
    assert _rows(bloom_registers(with_nulls, "k")) == \
        _rows(bloom_registers(clean, "k"))
    bits = registers_to_bits(bloom_registers(with_nulls, "k"))
    assert any(bits)  # real registers came through


def test_extent_merge_is_column_order_insensitive(spark):
    """Round-10 ADVICE fix: merging extent tables built with the same
    value_cols in DIFFERENT order must not positionally misalign
    min_a with min_b — unionByName folds by role. A genuinely
    different column SET is a hard error, not a silent merge."""
    od = _orders(spark).withColumn("bkt", F.col("o_orderkey") % 4)
    a = extent_table(od.filter("o_orderkey % 2 = 0"), "bkt",
                     ["o_totalprice", "o_custkey"])
    b = extent_table(od.filter("o_orderkey % 2 = 1"), "bkt",
                     ["o_custkey", "o_totalprice"])
    merged = merge_extent_tables(a, b)
    full = extent_table(od, "bkt", ["o_totalprice", "o_custkey"])
    got = {r["bucket"]: (r["n"], r["min_o_totalprice"],
                         r["max_o_totalprice"], r["min_o_custkey"],
                         r["max_o_custkey"])
           for r in merged.collect()}
    want = {r["bucket"]: (r["n"], r["min_o_totalprice"],
                          r["max_o_totalprice"], r["min_o_custkey"],
                          r["max_o_custkey"])
            for r in full.collect()}
    assert got == want
    import pytest as _pytest
    with _pytest.raises(ValueError, match="columns"):
        merge_extent_tables(a, a.drop("min_o_custkey"))
