"""Round-6 operator semantics beyond oracle parity: interval-overlap
join edges, incremental dedup contracts, and exact equi-depth bucketing
equivalence with the single-window NTILE it replaces."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from building_permissions_etl_spark.operators.aggregates import (
    equi_depth_buckets,
)
from building_permissions_etl_spark.operators.dedup import (
    dedup_incremental_batch,
)
from building_permissions_etl_spark.operators.joins import (
    bucketized_interval_join,
    interval_overlap_join,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---- interval_overlap_join ----------------------------------------------

def _frames(spark):
    facts = spark.createDataFrame(
        [(1, 0, 10), (2, 10, 20), (3, 25, 30), (4, 5, 6)],
        "fid long, fs long, fe long",
    )
    ivals = spark.createDataFrame(
        [(100, 5, 12), (200, 19, 25), (300, 50, 60)],
        "iid long, istart long, iend long",
    )
    return facts, ivals


def test_interval_overlap_semantics_half_open(spark):
    facts, ivals = _frames(spark)
    got = {(r["fid"], r["iid"]) for r in interval_overlap_join(
        facts, ivals, "fs", "fe", "istart", "iend").collect()}
    # half-open: [10,20) meets [5,12) and [19,25); [25,30) does NOT meet
    # [19,25) (shared endpoint 25 excluded); interval 300 matches nothing
    assert got == {(1, 100), (4, 100), (2, 100), (2, 200)}


def test_interval_overlap_right_keeps_empty_intervals(spark):
    facts, ivals = _frames(spark)
    out = interval_overlap_join(
        facts, ivals, "fs", "fe", "istart", "iend", how="right")
    per = {r["iid"]: r["n"] for r in
           out.groupBy("iid").agg(F.count("fid").alias("n")).collect()}
    assert per == {100: 3, 200: 1, 300: 0}


def test_interval_overlap_broadcasts_and_rejects_collisions(spark):
    facts, ivals = _frames(spark)
    plan = _plan(interval_overlap_join(
        facts, ivals, "fs", "fe", "istart", "iend"))
    assert "BroadcastNestedLoopJoin" in plan and "BroadcastExchange" in plan
    with pytest.raises(ValueError, match="collide"):
        interval_overlap_join(
            facts, facts.withColumnRenamed("fid", "gid"),
            "fs", "fe", "fs", "fe")
    with pytest.raises(ValueError, match="how"):
        interval_overlap_join(facts, ivals, "fs", "fe", "istart", "iend",
                              how="left")


# ---- dedup_incremental_batch --------------------------------------------

def test_incremental_dedup_contract(spark):
    corpus = spark.createDataFrame(
        [(1, "seen before"), (2, "also seen")], "doc_id long, text string")
    batch = spark.createDataFrame(
        [(10, "brand new"), (11, "seen before"),      # vs-corpus dup
         (12, "twice in batch"), (13, "twice in batch"),  # in-batch dup
         (14, "another new")],
        "doc_id long, text string")
    kept = sorted(r["doc_id"] for r in
                  dedup_incremental_batch(corpus, batch, "text",
                                          "doc_id").collect())
    assert kept == [10, 12, 14]   # first-in-batch wins; corpus dups drop


def test_incremental_dedup_never_rewrites_corpus(spark):
    """The corpus side must appear only as a pruned (hash, text) probe:
    no window over the corpus, and corpus rows never in the output."""
    corpus = spark.createDataFrame(
        [(1, "a")], "doc_id long, text string")
    batch = spark.createDataFrame(
        [(10, "b")], "doc_id long, text string")
    out = dedup_incremental_batch(corpus, batch, "text", "doc_id")
    assert [r["doc_id"] for r in out.collect()] == [10]
    assert out.columns == batch.columns


# ---- equi_depth_buckets --------------------------------------------------

def _ntile_reference(df, value_col, tiebreak_col, k):
    w = Window.orderBy(F.col(value_col).asc(), F.col(tiebreak_col).asc())
    return df.withColumn("bucket", F.ntile(k).over(w).cast("bigint"))


@pytest.mark.parametrize("n,k", [(103, 10), (7, 10), (40, 4), (1, 3)])
def test_equi_depth_matches_ntile(spark, n, k):
    """Row-identical to the single-partition NTILE window across the
    uneven-remainder, n<k, exact-division, and single-row cases."""
    df = spark.createDataFrame(
        [((i * 37) % n, float((i * 17) % 23)) for i in range(n)],
        "id long, v double",
    )
    got = {(r["id"], r["bucket"]) for r in
           equi_depth_buckets(df, "v", "id", k, num_ranges=4).collect()}
    want = {(r["id"], r["bucket"]) for r in
            _ntile_reference(df, "v", "id", k).collect()}
    assert got == want


def test_equi_depth_ties_across_range_boundaries(spark):
    """Rows equal on the value column must share a range, so global
    ranks stay exact even when a tied value is an approxQuantile
    boundary: heavy ties + k=5 against the NTILE reference."""
    df = spark.createDataFrame(
        [(i, float(i % 3)) for i in range(60)], "id long, v double")
    got = {(r["id"], r["bucket"]) for r in
           equi_depth_buckets(df, "v", "id", 5, num_ranges=8).collect()}
    want = {(r["id"], r["bucket"]) for r in
            _ntile_reference(df, "v", "id", 5).collect()}
    assert got == want


def test_equi_depth_single_partition_touches_only_range_rows(spark):
    """The only SinglePartition exchange in the plan must feed the
    per-range prefix sum (~num_ranges rows), never the data: the
    fact-side window partitions by range id."""
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(200)], "id long, v double")
    out = equi_depth_buckets(df, "v", "id", 10, num_ranges=8)
    plan = _plan(out)
    assert len(re.findall(r"SinglePartition", plan)) == 1, plan
    assert re.search(r"Window.*__rid", plan), plan
    with pytest.raises(ValueError, match="k must be"):
        equi_depth_buckets(df, "v", "id", 0)


# ---- bucketized_interval_join -------------------------------------------

def test_bucketized_overlap_matches_bruteforce(spark):
    """Duplicate-free and identical to the naive theta join across
    interval lengths spanning 1..4 buckets, touching endpoints, and
    containment."""
    import itertools

    left = spark.createDataFrame(
        [(i, s, s + ln) for i, (s, ln) in enumerate(
            itertools.product(range(0, 40, 7), (1, 5, 13, 29)))],
        "lid long, ls long, le long",
    )
    right = spark.createDataFrame(
        [(100 + i, s, s + ln) for i, (s, ln) in enumerate(
            itertools.product(range(3, 43, 11), (2, 10, 25)))],
        "rid long, rs long, re long",
    )
    got = sorted((r["lid"], r["rid"]) for r in
                 bucketized_interval_join(
                     left, right, "ls", "le", "rs", "re",
                     bucket_width=10).collect())
    lrows = left.collect()
    rrows = right.collect()
    want = sorted((lr["lid"], rr["rid"])
                  for lr in lrows for rr in rrows
                  if lr["ls"] < rr["re"] and rr["rs"] < lr["le"])
    assert got == want
    assert len(got) == len(set(got))   # no duplicate pairs


def test_bucketized_overlap_drops_empty_and_validates(spark):
    left = spark.createDataFrame(
        [(1, 5, 5), (2, 0, 10)], "lid long, ls long, le long")
    right = spark.createDataFrame(
        [(9, 0, 100)], "rid long, rs long, re long")
    got = [r["lid"] for r in bucketized_interval_join(
        left, right, "ls", "le", "rs", "re", bucket_width=8).collect()]
    assert got == [2]   # the empty [5,5) interval never matches
    with pytest.raises(ValueError, match="bucket_width"):
        bucketized_interval_join(left, right, "ls", "le", "rs", "re",
                                 bucket_width=0)
    with pytest.raises(ValueError, match="collide"):
        bucketized_interval_join(left, left, "ls", "le", "ls", "le",
                                 bucket_width=8)


# ---- snapshot_diff -------------------------------------------------------

def test_snapshot_diff_classification(spark):
    from building_permissions_etl_spark.operators.scd import snapshot_diff

    old = spark.createDataFrame(
        [(1, 10.0, "A"), (2, 20.0, "B"), (3, None, "C"), (4, 40.0, None)],
        "k long, bal double, seg string",
    )
    new = spark.createDataFrame(
        [(1, 10.0, "A"),        # unchanged
         (2, 21.0, "B"),        # changed (value)
         (3, None, "C"),        # unchanged (NULL == NULL null-safely)
         (5, 50.0, "E")],       # added; 4 removed
        "k long, bal double, seg string",
    )
    got = {r["k"]: r["change_type"] for r in
           snapshot_diff(old, new, "k", ["bal", "seg"]).collect()}
    assert got == {1: "unchanged", 2: "changed", 3: "unchanged",
                   4: "removed", 5: "added"}


def test_snapshot_diff_null_transitions_are_changes(spark):
    from building_permissions_etl_spark.operators.scd import snapshot_diff

    old = spark.createDataFrame([(1, None), (2, "x")], "k long, seg string")
    new = spark.createDataFrame([(1, "y"), (2, None)], "k long, seg string")
    got = {r["k"]: r["change_type"] for r in
           snapshot_diff(old, new, "k", ["seg"]).collect()}
    assert got == {1: "changed", 2: "changed"}


def test_bucketized_overlap_is_an_equi_join(spark):
    """The scale contract: candidates come from an EQUI join on the
    bucket id — hash/merge join in the plan, never a nested loop or
    cartesian (at tiny SF AQE may broadcast a side, but the join stays
    keyed on __bkt)."""
    left = spark.createDataFrame(
        [(i, i * 3, i * 3 + 5) for i in range(50)],
        "lid long, ls long, le long")
    right = spark.createDataFrame(
        [(100 + i, i * 4, i * 4 + 7) for i in range(50)],
        "rid long, rs long, re long")
    plan = _plan(bucketized_interval_join(
        left, right, "ls", "le", "rs", "re", bucket_width=10))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert re.search(r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)"
                     r".*__bkt", plan), plan


def test_profile_columns_rejects_empty_and_overlap(spark):
    import pytest

    from building_permissions_etl_spark.operators.validation import (
        profile_columns,
    )

    df = spark.createDataFrame([(1, "a")], "x int, s string")
    with pytest.raises(ValueError, match="no columns requested"):
        profile_columns(df, [], [])
    with pytest.raises(ValueError, match="both numeric and string"):
        profile_columns(df, ["x"], ["x"])


def test_topk_bruteforce_batch_rejects_duplicate_corpus_ids(spark):
    import pytest

    from building_permissions_etl_spark.operators.similarity import (
        topk_bruteforce_batch,
    )

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [1.0, 1.0])],
        "vec_id int, embedding array<float>",
    )
    with pytest.raises(ValueError, match="duplicate"):
        topk_bruteforce_batch(df, "embedding", "vec_id", [1, 2], k=1)
