"""Round-8b batch: sparse dot-product document similarity through an
inverted index (integer term frequencies — the TF-IDF-cosine plan shape
without its float drift), market-basket lift over order baskets,
an exact weighted median via distinct-value cumulative weights, and
sweep-line peak concurrency (the O(n log n) alternative to interval
self-joins when the question is "how many overlap NOW", not "which
pairs overlap").

Every value-checked expression is integer until at most ONE final IEEE
division (lift), per the round-7/8 determinism rules: floor-quantize,
never round(); positive integer div only; no transcendentals.

Reference scope: extends the analytics surface beyond helpers:* like
the round-6/8 batches (the reference has no similarity/basket/sweep
surface); the patterns are textbook IR (Manning/Raghavan/Schütze
inverted-index cosine), Agrawal-Srikant association lift, and the
standard sweep-line concurrency count.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from building_permissions_etl_spark.catalog import load_table
from building_permissions_etl_spark.operators.dedup import tokens

_TOKS = "list_filter(string_split_regex(lower(text), '\\s+'), t -> t != '')"


def contribute(register) -> None:
    # ---- sparse dot-product top-k pairs (inverted index) ---------------
    # Pairwise document similarity as a SPARSE DOT PRODUCT of integer
    # term-frequency vectors, computed through the posting lists: no
    # document ever meets another except on a shared term, and terms
    # with df > max_df are dropped BEFORE the posting self-join — the
    # same hot-key cutoff that bounds dedup_ngram_inverted, here
    # bounding pair fan-out at df² per surviving term. This is the
    # TF-IDF cosine plan shape (tfidf_top_terms holds the weighting);
    # keeping the score integral (Σ tf_a·tf_b) makes the top-k ordering
    # engine-exact instead of last-ulp-lottery. Shuffles: one on term
    # (posting build), one on term for the join, one on the (a, b)
    # pair key for the final sum — all fixed-width keys.
    def sparse_topk(spark, sf, max_df=50, k=15):
        docs = load_table(spark, "documents", sf)
        postings = (
            docs.select(F.col("doc_id"), F.explode(tokens(F.col("text")))
                        .alias("term"))
            .groupBy("term", "doc_id")
            .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
        )
        rare = (postings.groupBy("term")
                .agg(F.count(F.lit(1)).alias("df"))
                .filter(F.col("df") <= max_df)
                .select("term"))
        p = postings.join(rare, "term")
        a = p.select("term", F.col("doc_id").alias("doc_a"),
                     F.col("tf").alias("tf_a"))
        b = p.select("term", F.col("doc_id").alias("doc_b"),
                     F.col("tf").alias("tf_b"))
        return (
            a.join(b, "term")
            .filter(F.col("doc_a") < F.col("doc_b"))
            .groupBy("doc_a", "doc_b")
            .agg(F.sum(F.col("tf_a") * F.col("tf_b")).alias("dot"))
            .orderBy(F.desc("dot"), "doc_a", "doc_b")
            .limit(k)
        )

    register(
        "sparse_dot_topk_pairs",
        sparse_topk,
        f"""
        WITH postings AS (
          SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
          FROM (SELECT doc_id, unnest({_TOKS}) AS term FROM documents)
          GROUP BY 1, 2
        ),
        rare AS (
          SELECT term FROM postings GROUP BY 1 HAVING count(*) <= 50
        ),
        p AS (SELECT postings.* FROM postings JOIN rare USING (term))
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(sum(a.tf * b.tf) AS BIGINT) AS dot
        FROM p a JOIN p b ON a.term = b.term AND a.doc_id < b.doc_id
        GROUP BY 1, 2
        ORDER BY dot DESC, doc_a, doc_b
        LIMIT 15
        """,
    )

    # ---- market-basket lift over order baskets -------------------------
    # Association lift between part BRANDS co-purchased in one order.
    # The item vocabulary (25 brands) bounds each basket at 25 distinct
    # items — the reason real basket mining always aggregates items to
    # a bounded vocabulary first. ONE wide exchange total: collect each
    # order's distinct sorted brand set (collect_set is a map-side-
    # combinable aggregate; the shuffle carries ≤25-element sets, not
    # rows), then derive everything from that per-order frame with
    # NARROW ops — singles and the C(|basket|,2) co-occurrence pairs
    # both explode locally and partial-aggregate into ≤25 / ≤C(25,2)
    # keys before their (tiny) final shuffles, and n_orders is a count
    # of the same frame. The round-8 original self-joined the basket
    # table on l_orderkey, which re-shuffled the fact-sized pair stream;
    # generating pairs INSIDE the row after one groupBy is the shape
    # that survives a 100× scale-up. Lift stays INTEGER (c_ab·N as
    # numerator, c_a·c_b as denominator) until one final IEEE-exact
    # division; ordering uses the integer cross-product comparison,
    # never the float.
    def basket_lift(spark, sf, min_pair=5, k=20):
        li = load_table(spark, "lineitem", sf).select(
            "l_orderkey", "l_partkey")
        part = load_table(spark, "part", sf).select("p_partkey", "p_brand")
        baskets = (
            li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
            .groupBy("l_orderkey")
            .agg(F.sort_array(F.collect_set("p_brand")).alias("brands"))
        )
        # Round 14 (guide §2.4): singles, pairs AND n_orders previously
        # each re-derived `baskets`, re-running the fact join + wide
        # collect_set exchange THREE times per query. One projection now
        # emits every tally row a basket contributes — its single
        # brands, its C(|basket|,2) ordered pairs, and one order
        # sentinel — and a single groupBy partial-aggregates them
        # map-side into ≤ 25 + C(25,2) + 1 keys, so the basket pipeline
        # runs once and the ≤326-row cached counts frame is split three
        # ways with filters.
        entry_gen = F.expr(
            "concat("
            "transform(brands, a -> struct("
            "  's' AS kind, a AS brand_a, CAST(NULL AS STRING) AS brand_b)),"
            "flatten(transform(brands, (a, i) -> "
            "  transform(slice(brands, i + 2, size(brands)), "
            "  b -> struct('p' AS kind, a AS brand_a, b AS brand_b)))),"
            "array(struct('n' AS kind, CAST(NULL AS STRING) AS brand_a, "
            "  CAST(NULL AS STRING) AS brand_b)))"
        )
        counts = (
            baskets.select(F.explode(entry_gen).alias("e"))
            .groupBy("e.kind", "e.brand_a", "e.brand_b")
            .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
            .cache()
        )
        n = counts.filter(F.col("kind") == "n").select(
            F.col("c").alias("n_orders"))
        pairs = (
            counts.filter(F.col("kind") == "p")
            .select("brand_a", "brand_b", F.col("c").alias("c_ab"))
            .filter(F.col("c_ab") >= min_pair)
        )
        ca = counts.filter(F.col("kind") == "s").select(
            F.col("brand_a"), F.col("c").alias("c_a"))
        cb = counts.filter(F.col("kind") == "s").select(
            F.col("brand_a").alias("brand_b"), F.col("c").alias("c_b"))
        return (
            pairs.join(F.broadcast(ca), "brand_a")
            .join(F.broadcast(cb), "brand_b")
            .crossJoin(F.broadcast(n))
            .select(
                "brand_a", "brand_b", "c_ab", "c_a", "c_b",
                ((F.col("c_ab") * F.col("n_orders")).cast("double")
                 / (F.col("c_a") * F.col("c_b")).cast("double"))
                .alias("lift"),
            )
            .orderBy(F.desc("lift"), "brand_a", "brand_b")
            .limit(k)
        )

    register(
        "basket_lift_brands",
        basket_lift,
        """
        WITH baskets AS (
          SELECT DISTINCT l_orderkey, p_brand AS brand
          FROM lineitem JOIN part ON l_partkey = p_partkey
        ),
        n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM baskets),
        singles AS (
          SELECT brand, CAST(count(*) AS BIGINT) AS c
          FROM baskets GROUP BY 1
        ),
        pairs AS (
          SELECT a.brand AS brand_a, b.brand AS brand_b,
                 CAST(count(*) AS BIGINT) AS c_ab
          FROM baskets a JOIN baskets b
            ON a.l_orderkey = b.l_orderkey AND a.brand < b.brand
          GROUP BY 1, 2 HAVING count(*) >= 5
        )
        SELECT brand_a, brand_b, c_ab, sa.c AS c_a, sb.c AS c_b,
               CAST(c_ab * n_orders AS DOUBLE)
                 / CAST(sa.c * sb.c AS DOUBLE) AS lift
        FROM pairs
        JOIN singles sa ON sa.brand = brand_a
        JOIN singles sb ON sb.brand = brand_b
        CROSS JOIN n
        ORDER BY lift DESC, brand_a, brand_b
        LIMIT 20
        """,
    )

    # ---- exact weighted median (two-pass bucket refinement) ------------
    # Quantity-weighted median unit price per return flag: the smallest
    # price v where cumulative quantity at v reaches half the total.
    # Two passes, both fully parallel:
    #   1. per-(group, bucket) weight sums, bucket = floordiv(v, 2^16
    #      cents) — FLOOR division (integer-exact via pmod), not `div`:
    #      `div` truncates toward zero, so bucket 0 would span
    #      (-W, +W) and the pushed literal range [tb*W, (tb+1)*W)
    #      would EXCLUDE negative values inside the median bucket,
    #      silently skewing the median on any value domain that dips
    #      below zero (ADVICE r10). With floor semantics every bucket
    #      spans exactly [tb*W, (tb+1)*W) for all signs, so the
    #      literal prune stays a true superset. This is
    #      a map-side-combinable aggregate whose shuffle carries at most
    #      groups × n_buckets rows; a tiny window over the bucket
    #      summary finds the bucket whose cumulative weight crosses
    #      half the total (the median bucket: every earlier bucket's
    #      cum stays < tot/2, so the crossing value must lie inside),
    #      plus the cumulative weight BEFORE it.
    #   2. re-scan filtered to that one bucket per group (broadcast of
    #      a ≤|groups|-row target table), aggregate to distinct values,
    #      and walk an ordered window seeded with the carried-in prefix.
    # The point of the bucket pass is BOUNDED window work: the ordered
    # cumulative window — inherently one task per group — never walks
    # more than max(n_buckets, bucket_width) rows, no matter how large
    # the fact table is. The single-pass distinct-value form (round-8
    # original) walked |distinct prices| rows per group through 3 tasks,
    # which is the part of the plan that does NOT survive a 100×
    # scale-up; this one does, for two extra cheap scans. Weights are
    # non-negative, so seeding the in-bucket cumsum with the prefix
    # reproduces the global cumulative exactly; all integer arithmetic
    # (cents via floor, quantities floored to bigint) until nothing.
    #
    # Pass-2 scan pruning: the target buckets are collected (one
    # ≤|groups|-row action — same eager-boundary precedent as the
    # equi-depth operators) and re-applied as a LITERAL OR-of-ranges
    # predicate on the RAW price column, which parquet row-group stats
    # can evaluate (PushedFilters — pinned by the plan-shape test). A
    # join-derived predicate never reaches the scan (DPP covers only
    # partition columns), so without the literals pass 2 re-reads the
    # whole fact; with them it reads only row groups overlapping one
    # bucket_width-cent price band per group. The pushed range is
    # widened by one cent per side — a deliberate SUPERSET, so the
    # exact post-join `bucket == tb` filter owns the boundary
    # semantics and double rounding in the pushed literals cannot
    # affect results.
    def weighted_median(spark, sf, bucket_width=1 << 16):
        li = load_table(spark, "lineitem", sf).select(
            "l_returnflag",
            F.expr("CAST(floor(l_extendedprice * 100) AS BIGINT)")
            .alias("v"),
            F.expr("CAST(floor(l_quantity) AS BIGINT)").alias("w"),
        )
        # integer-exact floor division: pmod(v, W) ∈ [0, W), so
        # (v - pmod) is an exact multiple of W and `div` cannot
        # truncate — equals floor(v / W) for every sign without the
        # double-precision hazard of floor(v / W) past 2^53
        bkt = F.expr(
            f"(v - pmod(v, {bucket_width})) div {bucket_width}")
        buckets = li.groupBy(
            "l_returnflag", bkt.alias("b")
        ).agg(F.sum("w").alias("bw"))
        cumb = (Window.partitionBy("l_returnflag").orderBy("b")
                .rowsBetween(Window.unboundedPreceding, 0))
        wholeb = Window.partitionBy("l_returnflag")
        target = (
            buckets.withColumn("cw", F.sum("bw").over(cumb))
            .withColumn("tot", F.sum("bw").over(wholeb))
            .filter(2 * F.col("cw") >= F.col("tot"))
            .groupBy("l_returnflag")
            .agg(
                F.min("b").alias("tb"),
                F.min_by(F.col("cw") - F.col("bw"), F.col("b"))
                .alias("prefix"),
                F.min("tot").alias("tot"),
            )
        )
        # one eager ≤|groups|-row action; the collected rows feed BOTH
        # the pushed-literal prune and the (local) broadcast side, so
        # pass 1 executes exactly once
        tgt_rows = target.collect()
        target_local = spark.createDataFrame(
            tgt_rows,
            "l_returnflag string, tb bigint, prefix bigint, tot bigint",
        )
        prune = F.lit(False)
        for r in tgt_rows:
            lo = (r["tb"] * bucket_width) / 100.0 - 0.01
            hi = ((r["tb"] + 1) * bucket_width) / 100.0 + 0.01
            prune = prune | (
                (F.col("l_returnflag") == F.lit(r["l_returnflag"]))
                & (F.col("l_extendedprice") >= F.lit(lo))
                & (F.col("l_extendedprice") < F.lit(hi))
            )
        pruned = load_table(spark, "lineitem", sf).filter(prune).select(
            "l_returnflag",
            F.expr("CAST(floor(l_extendedprice * 100) AS BIGINT)")
            .alias("v"),
            F.expr("CAST(floor(l_quantity) AS BIGINT)").alias("w"),
        )
        in_bucket = (
            pruned.join(F.broadcast(target_local), "l_returnflag")
            .filter(bkt == F.col("tb"))
            .groupBy("l_returnflag", "v", "prefix", "tot")
            .agg(F.sum("w").alias("sw"))
        )
        cumv = (Window.partitionBy("l_returnflag").orderBy("v")
                .rowsBetween(Window.unboundedPreceding, 0))
        return (
            in_bucket
            .withColumn("cw", F.col("prefix") + F.sum("sw").over(cumv))
            .filter(2 * F.col("cw") >= F.col("tot"))
            .groupBy("l_returnflag")
            .agg(F.min("v").alias("wmedian_cents"),
                 F.min("tot").alias("total_qty"))
            .orderBy("l_returnflag")
        )

    register(
        "weighted_median_unit_price",
        weighted_median,
        """
        WITH per_v AS (
          SELECT l_returnflag,
                 CAST(floor(l_extendedprice * 100) AS BIGINT) AS v,
                 CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT)
                   AS sw
          FROM lineitem GROUP BY 1, 2
        ),
        c AS (
          SELECT l_returnflag, v, sw,
                 sum(sw) OVER (PARTITION BY l_returnflag ORDER BY v
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS cw,
                 sum(sw) OVER (PARTITION BY l_returnflag) AS tot
          FROM per_v
        )
        SELECT l_returnflag,
               CAST(min(v) AS BIGINT) AS wmedian_cents,
               CAST(min(tot) AS BIGINT) AS total_qty
        FROM c WHERE 2 * cw >= tot
        GROUP BY 1 ORDER BY 1
        """,
    )

    # ---- sweep-line peak concurrency ------------------------------------
    # Peak number of simultaneously-open 5-minute event windows per
    # type: ±1 deltas at each interval endpoint, one ordered cumulative
    # sum, take the max. O(n log n) against the interval self-join's
    # O(n·density) — the right tool when the question is a COUNT over
    # time, not WHICH pairs overlap (concurrent_purchase_errors covers
    # that). Half-open [ts, ts+5m): ends sort BEFORE starts at the same
    # instant (delta ascending), so back-to-back windows never double-
    # count. Deterministic despite endpoint ties: within a run of equal
    # (t, delta) rows the running values are a monotone sequence whose
    # maximum is permutation-invariant. Partitioned by event_type; for
    # an unbounded key domain the range-partitioned two-pass prefix sum
    # (corpus.pack_sequences_global) is the drop-in scale path.
    def peak_concurrency(spark, sf):
        ev = load_table(spark, "events", sf)
        starts = ev.select("event_type", F.col("ts").alias("t"),
                           F.lit(1).alias("delta"))
        ends = ev.select("event_type",
                         (F.col("ts") + F.expr("INTERVAL 5 MINUTES"))
                         .alias("t"),
                         F.lit(-1).alias("delta"))
        sweep = (Window.partitionBy("event_type").orderBy("t", "delta")
                 .rowsBetween(Window.unboundedPreceding, 0))
        return (
            starts.unionByName(ends)
            .withColumn("open_now", F.sum("delta").over(sweep))
            .groupBy("event_type")
            .agg(F.max("open_now").cast("bigint").alias("peak_concurrent"),
                 (F.count(F.lit(1)) / 2).cast("bigint").alias("n_events"))
            .orderBy("event_type")
        )

    register(
        "peak_concurrency_by_type",
        peak_concurrency,
        """
        WITH deltas AS (
          SELECT event_type, ts AS t, 1 AS delta FROM events
          UNION ALL
          SELECT event_type, ts + INTERVAL 5 MINUTE AS t, -1 AS delta
          FROM events
        ),
        sweep AS (
          SELECT event_type,
                 sum(delta) OVER (PARTITION BY event_type
                                  ORDER BY t, delta
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS open_now
          FROM deltas
        )
        SELECT event_type,
               CAST(max(open_now) AS BIGINT) AS peak_concurrent,
               CAST(count(*) / 2 AS BIGINT) AS n_events
        FROM sweep GROUP BY 1 ORDER BY 1
        """,
    )
