"""Round-8d invariants beyond oracle parity: the Bloom reduction is a
false-negative-free superset filter, the Morton interleave matches the
bit-math definition, the checksum rollup is genuinely mergeable, and the
analytics queries match brute-force Python on the fixture.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from building_permissions_etl_spark.functions.zorder import z_interleave_sql
from building_permissions_etl_spark.operators.bloom import (
    bloom_might_contain,
    build_bloom_bits,
)
from building_permissions_etl_spark.plans.registry import queries

SF_DIR = "/root/testdata/sf0.001"

Q = queries()


# ---- Bloom filter: no false negatives, bounded false positives ----------

def test_bloom_contains_every_inserted_key(spark):
    keys = spark.range(0, 500).withColumnRenamed("id", "k")
    bits = build_bloom_bits(keys, "k")
    hit = keys.filter(bloom_might_contain(F.col("k"), bits)).count()
    assert hit == 500  # Bloom filters never false-negative


def test_bloom_rejects_most_foreign_keys(spark):
    keys = spark.range(0, 500).withColumnRenamed("id", "k")
    bits = build_bloom_bits(keys, "k")
    foreign = spark.range(1_000_000, 1_010_000).withColumnRenamed("id", "k")
    fp = foreign.filter(bloom_might_contain(F.col("k"), bits)).count()
    # 500 keys * 3 hashes in 65536 bits -> fpp ~ 1e-5; allow wide slack
    assert fp < 100


def test_bloom_build_validates_parameters(spark):
    keys = spark.range(0, 10).withColumnRenamed("id", "k")
    with pytest.raises(ValueError):
        build_bloom_bits(keys, "k", m_bits=100)  # not a multiple of 64
    with pytest.raises(ValueError):
        build_bloom_bits(keys, "k", k=0)
    with pytest.raises(ValueError):
        build_bloom_bits(keys, "k", k=9)  # bit bytes come from one hash
    with pytest.raises(ValueError):
        bloom_might_contain(F.col("k"), [])


def test_bloom_pruned_query_equals_unpruned_join(spark):
    """The reduction must be semantically transparent: same result as
    the plain filter+join without the Bloom."""
    got = Q["bloom_pruned_segment_revenue"](spark, SF_DIR).collect()
    cust = (spark.read.parquet(f"{SF_DIR}/customer.parquet")
            .filter(F.col("c_mktsegment") == "BUILDING")
            .select("c_custkey"))
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    want = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .select((F.year("o_orderdate") * 100 + F.month("o_orderdate"))
                .cast("bigint").alias("month"),
                F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)")
                .alias("cents"))
        .groupBy("month")
        .agg(F.sum("cents").alias("revenue_cents"),
             F.count(F.lit(1)).cast("bigint").alias("n_orders"))
        .orderBy("month")
        .collect()
    )
    assert got == want and got


# ---- Morton interleave matches the arithmetic definition ------------------

def _py_morton(x: int, y: int, bits: int = 8) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_z_interleave_spark_expression_matches_python(spark):
    df = spark.createDataFrame(
        [(x, y) for x in (0, 1, 5, 127, 200, 255)
         for y in (0, 3, 64, 255)], "x long, y long")
    z = df.select("x", "y",
                  F.expr(z_interleave_sql("x", "y", 8, "spark")).alias("z"))
    for r in z.collect():
        assert r["z"] == _py_morton(r["x"], r["y"]), r


def test_z_interleave_duckdb_expression_matches_python():
    import duckdb
    con = duckdb.connect()
    expr = z_interleave_sql("x", "y", 8, "duckdb")
    rows = con.execute(
        f"SELECT x, y, {expr} AS z FROM (SELECT unnest([0,1,5,127,200,255])"
        f" AS x) CROSS JOIN (SELECT unnest([0,3,64,255]) AS y)").fetchall()
    for x, y, z in rows:
        assert z == _py_morton(x, y), (x, y, z)


def test_z_interleave_validates_bits():
    with pytest.raises(ValueError):
        z_interleave_sql("x", "y", 0)
    with pytest.raises(ValueError):
        z_interleave_sql("x", "y", 40)
    with pytest.raises(ValueError):
        z_interleave_sql("x", "y", 8, "sqlite")


def test_zorder_buckets_partition_the_table(spark):
    rows = Q["zorder_extent_pruning"](spark, SF_DIR).collect()
    n_orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").count()
    assert sum(r["n"] for r in rows) == n_orders
    for r in rows:
        assert 0 <= r["zbucket"] < 1024
        assert r["min_day"] <= r["max_day"]
        assert r["min_price"] <= r["max_price"]
    # z-ordering must actually localize: most buckets fail the box
    cand = sum(1 for r in rows if r["candidate"])
    assert cand < len(rows) / 2


# ---- CUSUM matches brute force -------------------------------------------

def test_cusum_matches_bruteforce(spark):
    rows = {r["event_type"]: r for r in
            Q["cusum_changepoint_by_type"](spark, SF_DIR).collect()}
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").selectExpr(
        "event_type", "ts", "event_id",
        "CAST(floor(value * 100) AS BIGINT) AS x").collect()
    per_type = {}
    for r in ev:
        per_type.setdefault(r["event_type"], []).append(
            (r["ts"], r["event_id"], r["x"]))
    assert set(rows) == set(per_type)
    for t, seq in per_type.items():
        seq.sort(key=lambda p: (p[0], p[1]))
        c, total = len(seq), sum(p[2] for p in seq)
        p_cum = 0
        best = None  # (abs_s desc, ts asc, event_id asc)
        for i, (ts, eid, x) in enumerate(seq, start=1):
            p_cum += x
            s = abs(c * p_cum - i * total)
            if best is None or s > best[0]:
                best = (s, ts)
        assert rows[t]["max_abs_s"] == best[0], (t, best, rows[t])
        assert rows[t]["change_ts"] == best[1], (t, best, rows[t])
        assert rows[t]["n"] == c


# ---- RFM invariants --------------------------------------------------------

def test_rfm_segments_cover_all_customers_with_valid_scores(spark):
    rows = Q["rfm_segment_counts"](spark, SF_DIR).collect()
    n_cust = (spark.read.parquet(f"{SF_DIR}/orders.parquet")
              .select("o_custkey").distinct().count())
    assert sum(r["n_customers"] for r in rows) == n_cust
    for r in rows:
        assert 1 <= r["r_score"] <= 5
        assert 1 <= r["f_score"] <= 5
        assert 1 <= r["m_score"] <= 5


def test_rfm_quintiles_are_balanced(spark):
    rows = Q["rfm_segment_counts"](spark, SF_DIR).collect()
    n_cust = sum(r["n_customers"] for r in rows)
    for dim in ("r_score", "f_score", "m_score"):
        per = {}
        for r in rows:
            per[r[dim]] = per.get(r[dim], 0) + r["n_customers"]
        assert set(per) == {1, 2, 3, 4, 5}
        # ntile: tile sizes differ by at most 1
        assert max(per.values()) - min(per.values()) <= 1, (dim, per)
    assert n_cust > 0


# ---- Pareto concentration matches brute force -------------------------------

def test_pareto_concentration_matches_bruteforce(spark):
    rows = {r["c_mktsegment"]: r for r in
            Q["pareto_customer_concentration"](spark, SF_DIR).collect()}
    joined = spark.sql(f"""
        SELECT c_mktsegment, o_custkey,
               CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 AS cents
        FROM parquet.`{SF_DIR}/orders.parquet` o
        JOIN parquet.`{SF_DIR}/customer.parquet` c ON o_custkey = c_custkey
        GROUP BY 1, 2""").collect()
    per_seg = {}
    for r in joined:
        per_seg.setdefault(r["c_mktsegment"], []).append(
            (-r["cents"], r["o_custkey"], r["cents"]))
    assert set(rows) == set(per_seg)
    for seg, entries in per_seg.items():
        entries.sort()
        total = sum(c for _, _, c in entries)
        cum = 0
        for k, (_, _, c) in enumerate(entries, start=1):
            cum += c
            if 2 * cum >= total:
                break
        assert rows[seg]["k50"] == k, (seg, k, rows[seg])
        assert rows[seg]["n_customers"] == len(entries)
        assert rows[seg]["total_cents"] == total
        # concentration is real: half the revenue in < half the customers
        assert k < len(entries) / 2


# ---- streaks match brute force ----------------------------------------------

def test_streak_histogram_matches_bruteforce(spark):
    rows = Q["active_day_streaks"](spark, SF_DIR).collect()
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "user_id", F.col("ts").cast("date").alias("d")).distinct().collect()
    per_user = {}
    epoch = datetime.date(2024, 1, 1)
    for r in ev:
        per_user.setdefault(r["user_id"], set()).add((r["d"] - epoch).days)
    hist = {}
    for days in per_user.values():
        best = run = 0
        prev = None
        for d in sorted(days):
            run = run + 1 if prev is not None and d == prev + 1 else 1
            best = max(best, run)
            prev = d
        hist[best] = hist.get(best, 0) + 1
    assert {r["max_streak"]: r["n_users"] for r in rows} == hist


# ---- checksum rollup: mergeable + order-insensitive -------------------------

def test_checksum_total_row_is_sum_of_month_partials(spark):
    rows = Q["table_checksum_rollup"](spark, SF_DIR).collect()
    total = [r for r in rows if r["month"] is None]
    months = [r for r in rows if r["month"] is not None]
    assert len(total) == 1 and months
    assert total[0]["n"] == sum(r["n"] for r in months)
    assert total[0]["sum_h1"] == sum(r["sum_h1"] for r in months)
    assert total[0]["sum_h2"] == sum(r["sum_h2"] for r in months)


def test_checksum_is_partition_order_invariant(spark):
    """Recomputing after a repartition (different physical row order)
    must give identical sums — the property that lets a 100 TB copy be
    validated from unordered per-partition partials."""
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    canon = ("concat_ws('|', CAST(l_orderkey AS STRING),"
             " CAST(l_linenumber AS STRING),"
             " CAST(CAST(floor(l_extendedprice * 100) AS BIGINT) AS STRING),"
             " l_returnflag)")
    sums = []
    for df in (li, li.repartition(13, "l_suppkey")):
        r = df.selectExpr(
            f"CAST(conv(substr(md5({canon}), 1, 8), 16, 10) AS BIGINT) AS h1"
        ).agg(F.sum("h1")).first()[0]
        sums.append(r)
    assert sums[0] == sums[1]
