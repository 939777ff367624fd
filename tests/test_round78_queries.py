"""Round-7/8 semantics beyond oracle parity: the rows-only sketch twins
track their exact references, the triangle operator is unit-verified on
hand-built graphs, priority sampling / Pareto frontier / interpolation
satisfy their defining properties, and the Lloyd loop improves inertia.

The oracle-backed halves of both batches (kmeans_lloyd_2iter,
quarterly_distinct_users, triangle_count_trade_graph,
priority_sample_by_lang, pareto_frontier_parts,
weekly_anchor_interpolation, weekly_user_overlap_exact,
approx_topk_event_types) are value-hash-checked by
tests/test_oracle_parity.py's registry sweep; this file covers what
that sweep cannot: the four sketch-state queries and the operator-level
invariants.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from building_permissions_etl_spark.operators.graph import (
    triangle_counts_per_node,
)
from building_permissions_etl_spark.plans.registry import queries

SF_DIR = "/root/testdata/sf0.001"

Q = queries()


# ---- sketch twins track their exact references --------------------------

def test_hll_rollup_tracks_exact_quarterly_distinct(spark):
    exact = {r["quarter"]: r["n_users"]
             for r in Q["quarterly_distinct_users"](spark, SF_DIR).collect()}
    approx = {r["quarter"]: r["approx_users"]
              for r in Q["hll_quarterly_users_rollup"](spark, SF_DIR).collect()}
    assert set(exact) == set(approx)
    for q, n in exact.items():
        # lgK=14 keeps the sketch exact far beyond fixture cardinality
        assert abs(approx[q] - n) <= max(2, 0.02 * n), (q, n, approx[q])


def test_theta_overlap_tracks_exact_retention(spark):
    exact = {r["week_start"]: r["n_retained"]
             for r in Q["weekly_user_overlap_exact"](spark, SF_DIR).collect()}
    est = {r["week_start"]: r["est_retained"]
           for r in Q["weekly_user_overlap_theta"](spark, SF_DIR).collect()}
    assert set(exact) == set(est)
    for wk, n in exact.items():
        # below the 4096-entry theta threshold the sketch is exact
        assert abs(est[wk] - n) <= max(2, 0.03 * n), (wk, n, est[wk])


def test_theta_churn_tracks_exact_churn(spark):
    exact = {r["week_start"]: r["n_churned"]
             for r in Q["weekly_churned_users_exact"](spark, SF_DIR).collect()}
    est = {r["week_start"]: r["est_churned"]
           for r in Q["weekly_churn_theta"](spark, SF_DIR).collect()}
    assert set(exact) == set(est)
    for wk, n in exact.items():
        # below the 4096-entry theta threshold the A-NOT-B is exact
        assert abs(est[wk] - n) <= max(2, 0.03 * n), (wk, n, est[wk])


def test_kll_rollup_quantiles_bracketed_by_minmax(spark):
    rows = Q["kll_weekly_value_quantiles"](spark, SF_DIR).collect()
    assert rows
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    bounds = ev.groupBy("event_type").agg(
        F.min(F.expr("CAST(floor(value * 1000) AS BIGINT)")).alias("lo"),
        F.max(F.expr("CAST(floor(value * 1000) AS BIGINT)")).alias("hi"),
        F.count(F.lit(1)).alias("n"),
    ).collect()
    b = {r["event_type"]: r for r in bounds}
    per_type_n = {}
    for r in rows:
        lo, hi = b[r["event_type"]]["lo"], b[r["event_type"]]["hi"]
        assert lo <= r["p50_units"] <= r["p90_units"] <= hi, r
        per_type_n[r["event_type"]] = (
            per_type_n.get(r["event_type"], 0) + r["n"])
    # merged sketch n must equal the true row count per type
    for t, n in per_type_n.items():
        assert n == b[t]["n"], (t, n, b[t]["n"])


def test_mad_approx_tracks_exact_mad(spark):
    exact = {r["event_type"]: r
             for r in Q["mad_outliers_by_type"](spark, SF_DIR).collect()}
    approx = {r["event_type"]: r
              for r in Q["mad_outliers_by_type_approx"](spark, SF_DIR).collect()}
    assert set(exact) == set(approx)
    for t, er in exact.items():
        ar = approx[t]
        assert ar["n"] == er["n"]
        # GK sketch at accuracy 10000 on fixture sizes: the outlier
        # census should agree to within a small absolute slack
        assert abs(ar["n_outliers"] - er["n_outliers"]) <= max(
            2, 0.05 * max(er["n_outliers"], 1)), (t, er, ar)


# ---- triangle operator on hand-built graphs -----------------------------

def _tri(spark, edges, node_ids):
    e = spark.createDataFrame(edges, "a long, b long")
    n = spark.createDataFrame([(i,) for i in node_ids], "id long")
    out = triangle_counts_per_node(e, n)
    return {r["id"]: r["n_triangles"] for r in out.collect()}


def test_triangle_counts_single_triangle(spark):
    assert _tri(spark, [(1, 2), (2, 3), (1, 3)], [1, 2, 3, 4]) == {
        1: 1, 2: 1, 3: 1, 4: 0}


def test_triangle_counts_square_no_diagonal(spark):
    assert _tri(spark, [(1, 2), (2, 3), (3, 4), (1, 4)], [1, 2, 3, 4]) == {
        1: 0, 2: 0, 3: 0, 4: 0}


def test_triangle_counts_k4(spark):
    # K4: each node is in C(3,2)=3 triangles, 4 triangles total
    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    assert _tri(spark, k4, [1, 2, 3, 4]) == {1: 3, 2: 3, 3: 3, 4: 3}


def test_triangle_counts_two_triangles_sharing_edge(spark):
    # {1,2,3} and {1,2,4}: nodes 1,2 in two each, 3,4 in one each
    g = [(1, 2), (1, 3), (2, 3), (1, 4), (2, 4)]
    assert _tri(spark, g, [1, 2, 3, 4, 5]) == {1: 2, 2: 2, 3: 1, 4: 1, 5: 0}


# ---- priority sampling properties ---------------------------------------

def test_priority_sample_is_deterministic_and_bounded(spark):
    a = Q["priority_sample_by_lang"](spark, SF_DIR).collect()
    b = Q["priority_sample_by_lang"](spark, SF_DIR).collect()
    assert a == b
    per_lang = {}
    for r in a:
        per_lang[r["lang"]] = per_lang.get(r["lang"], 0) + 1
    assert per_lang and all(v <= 5 for v in per_lang.values())


def test_priority_sample_favors_heavy_docs(spark):
    # weighted by n_chars: the sample's mean length must exceed the
    # population mean (the point of weighted sampling)
    rows = Q["priority_sample_by_lang"](spark, SF_DIR).collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    pop_mean = docs.agg(F.avg("n_chars")).first()[0]
    samp_mean = sum(r["n_chars"] for r in rows) / len(rows)
    assert samp_mean > pop_mean


# ---- Pareto frontier dominance property ---------------------------------

def test_pareto_frontier_is_exactly_the_undominated_set(spark):
    frontier = {(r["p_partkey"], r["p_retailprice"], r["p_size"])
                for r in Q["pareto_frontier_parts"](spark, SF_DIR).collect()}
    parts = [(r["p_partkey"], r["p_retailprice"], r["p_size"])
             for r in spark.read.parquet(f"{SF_DIR}/part.parquet")
             .select("p_partkey", "p_retailprice", "p_size").collect()]

    def dominated(p):
        return any(
            q[1] <= p[1] and q[2] <= p[2] and (q[1] < p[1] or q[2] < p[2])
            for q in parts)

    brute = {p for p in parts if not dominated(p)}
    assert frontier == brute and frontier


# ---- interpolation properties -------------------------------------------

def test_interpolation_anchors_exact_and_interior_monotone_flagged(spark):
    rows = Q["weekly_anchor_interpolation"](spark, SF_DIR).collect()
    assert rows
    # anchor rows are flagged 0 and appear every 7 days from the min
    by_type = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    for t, rs in by_type.items():
        rs.sort(key=lambda r: r["dy"])
        assert rs[0]["is_interp"] == 0 and rs[-1]["is_interp"] == 0
        for i, r in enumerate(rs):
            assert r["is_interp"] == (0 if i % 7 == 0 else 1), (t, i, r)
            if r["is_interp"]:
                prev_anchor = rs[(i // 7) * 7]["interp_units"]
                next_anchor = rs[(i // 7) * 7 + 7]["interp_units"]
                lo, hi = sorted((prev_anchor, next_anchor))
                assert lo - 1 <= r["interp_units"] <= hi + 1, (t, i, r)


# ---- round-8b invariants -------------------------------------------------

def test_sparse_dot_topk_matches_bruteforce_python(spark):
    rows = Q["sparse_dot_topk_pairs"](spark, SF_DIR).collect()
    assert rows and all(r["dot"] >= 1 for r in rows)
    # brute-force the dot products for the returned pairs from raw text
    docs = {r["doc_id"]: r["text"] for r in spark.read.parquet(
        f"{SF_DIR}/documents.parquet").collect()}

    def tf(text):
        out = {}
        for t in text.lower().split():
            out[t] = out.get(t, 0) + 1
        return out

    # df cutoff replicated: terms in more than 50 docs are excluded
    df_count = {}
    for text in docs.values():
        for t in set(text.lower().split()):
            df_count[t] = df_count.get(t, 0) + 1
    for r in rows:
        ta, tb = tf(docs[r["doc_a"]]), tf(docs[r["doc_b"]])
        expect = sum(ta[t] * tb.get(t, 0) for t in ta
                     if df_count.get(t, 0) <= 50)
        assert expect == r["dot"], (r, expect)


def test_weighted_median_is_true_weighted_median(spark):
    rows = Q["weighted_median_unit_price"](spark, SF_DIR).collect()
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").selectExpr(
        "l_returnflag",
        "CAST(floor(l_extendedprice * 100) AS BIGINT) AS v",
        "CAST(floor(l_quantity) AS BIGINT) AS w").collect()
    by_flag = {}
    for r in li:
        by_flag.setdefault(r["l_returnflag"], []).append((r["v"], r["w"]))
    assert {r["l_returnflag"] for r in rows} == set(by_flag)
    for r in rows:
        vals = sorted(by_flag[r["l_returnflag"]])
        tot = sum(w for _, w in vals)
        assert r["total_qty"] == tot
        cum = 0
        for v, w in vals:
            cum += w
            if 2 * cum >= tot:
                assert r["wmedian_cents"] == v, (r, v)
                break


def test_peak_concurrency_matches_bruteforce_sweep(spark):
    rows = {r["event_type"]: r for r in
            Q["peak_concurrency_by_type"](spark, SF_DIR).collect()}
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_type", "ts").collect()
    per_type = {}
    for r in ev:
        per_type.setdefault(r["event_type"], []).append(r["ts"])
    assert set(rows) == set(per_type)
    import datetime
    for t, starts in per_type.items():
        deltas = [(s, 1) for s in starts] + [
            (s + datetime.timedelta(minutes=5), -1) for s in starts]
        deltas.sort(key=lambda p: (p[0], p[1]))
        cur = peak = 0
        for _, d in deltas:
            cur += d
            peak = max(peak, cur)
        assert rows[t]["peak_concurrent"] == peak, (t, peak, rows[t])
        assert rows[t]["n_events"] == len(starts)


def test_basket_lift_bounds_and_support(spark):
    rows = Q["basket_lift_brands"](spark, SF_DIR).collect()
    assert rows and len(rows) <= 20
    for r in rows:
        assert r["c_ab"] >= 5
        assert r["c_ab"] <= min(r["c_a"], r["c_b"])
        assert r["brand_a"] < r["brand_b"]
        assert r["lift"] > 0
    lifts = [r["lift"] for r in rows]
    assert lifts == sorted(lifts, reverse=True)


def test_power_iteration_direction_properties(spark):
    """The returned vector is ∞-norm-scaled to exactly 1000, has all 64
    components, and is an improved eigendirection estimate: its Rayleigh
    quotient vᵀXᵀXv / vᵀv must not be below v₀'s (power iteration is
    monotone in the Rayleigh quotient)."""
    rows = Q["power_iteration_eigendirection"](spark, SF_DIR).collect()
    assert len(rows) == 64
    v = [r["v"] for r in sorted(rows, key=lambda r: r["j"])]
    assert max(abs(x) for x in v) == 1000

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
    qvs = [[int(__import__("math").floor(float(x) * 1000))
            for x in r["embedding"]] for r in emb]

    def rayleigh(vec):
        num = sum(sum(q[j] * vec[j] for j in range(64)) ** 2 for q in qvs)
        den = sum(x * x for x in vec)
        return num / den

    assert rayleigh(v) >= rayleigh([1000] * 64)


# ---- Lloyd loop: inertia decreases --------------------------------------

def test_kmeans_two_iterations_do_not_increase_inertia(spark):
    rows = Q["kmeans_lloyd_2iter"](spark, SF_DIR).collect()
    assert len(rows) == 16
    total_n = sum(r["n_vectors"] for r in rows)
    emb_n = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").count()
    assert total_n == emb_n
    assert all(r["inertia"] >= 0 for r in rows)
