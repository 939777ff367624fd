"""Round-9 batch: incremental-maintenance and shard-merge shapes.

Three queries closing the round-8 verdict's "highest-value new
surface" item (VERDICT.md task 7):

* ``cusum_shard_merge`` — the SCALE.md-named mitigation for the CUSUM
  family's per-key sequential ceiling: per-shard partial CUSUM states
  merged associatively, so the only ordered scan touches one shard at
  a time and the cross-shard fold runs over shard SUMMARIES (one row
  per month), never raw rows. The DuckDB oracle computes the same
  statistics with the single-pass closed form, so parity proves the
  merge algebra exact, not approximately right.
* ``bloom_incremental_union`` — the Bloom filter as a MAINTAINED
  table: base-partition registers and delta-batch registers built
  independently (at 100 TB the base register table is persisted, not
  rebuilt), merged by bitwise OR — the mergeable-sketch rollup
  pattern applied to membership. Registers use the engine-portable
  md5-prefix hash (functions/portable.py) so DuckDB rebuilds
  bit-identical words.
* ``zorder_extent_merge`` — the z-order extent table as a MAINTAINED
  table: per-bucket extents of the base partition merged with a delta
  batch's extents by (sum, min, max) — and checked against the
  full-rebuild oracle, which IS the maintenance-equals-rebuild proof.

Reference scope: all three are beyond the reference surface
(helpers:* has no incremental-maintenance tooling); CUSUM is Page
(1954), the prefix-min closed form is folklore scan algebra (Blelloch
1990 prefix-sums), Bloom (1970), Morton (1966) / the public Delta
OPTIMIZE ZORDER design.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from building_permissions_etl_spark.catalog import load_table
from building_permissions_etl_spark.functions.portable import (
    portable_hash64,
)
from building_permissions_etl_spark.functions.zorder import (
    ZQ_DAY_DUCK,
    ZQ_DAY_SPARK,
    ZQ_PRICE_DUCK,
    ZQ_PRICE_SPARK,
    z_interleave_sql,
)
from building_permissions_etl_spark.operators import dedup as D
from building_permissions_etl_spark.plans import sketch_oracles as SK
from building_permissions_etl_spark.plans.extensions import _SHINGLES3

# Blocked-Bloom geometry: 1024 words × 63 usable bits (DuckDB's BIGINT
# ``<<`` raises on a shift of 63 — the sign bit — so both engines use
# positions 0..62 and the word never goes negative). Since round 12 a
# single definition lives in operators/maintenance.py (the oracle twin
# reads it through sketch_oracles.bloom_regs_sql).
from building_permissions_etl_spark.operators.maintenance import (
    BLOOM_BITS as _BLOOM_BITS,
    BLOOM_WORDS as _BLOOM_WORDS,
)

# Incremental split: base partition vs delta batch.
_SPLIT = "1997-06-01"


def contribute(register) -> None:
    # ---- CUSUM via mergeable per-shard partials ---------------------------
    # One-sided CUSUM S_i = max(0, S_{i-1} + d_i) over per-type
    # mean-centered integer deviations d_i = n·x_i − Σx (cross-
    # multiplied by n so everything stays BIGINT; Σd = 0 by
    # construction). The per-row recurrence composes as
    # f_d(S) = max(0, S + d), and compositions keep the closed form
    # f(S) = max(b, S + a) — so a SHARD (month) reduces to the pair
    # (a = Σd, b = CUSUM-from-zero at shard end) plus (rmax, b0max)
    # for excursion tracking, and shards merge associatively:
    #   S_after(t) = c_t + max_{i≤t}(b_i − c_i),  c_t = Σ_{i≤t} a_i.
    # The ordered scan is per (type, month) — bounded shard size, all
    # shards in parallel; the cross-shard fold is a window over ~25
    # one-row-per-month summaries. This is the shard-merge mitigation
    # SCALE.md names for cusum_changepoint_by_type's single-key
    # sequential ceiling, implemented and oracle-proven: the DuckDB
    # twin uses the single-pass closed form S_j = R_j − min(0, min R)
    # over the whole series, so any error in the merge algebra is a
    # value mismatch.
    #
    # Integer bound: |dd| ≤ n·max|x| and |R| ≤ n²·max|x| — at the
    # fixture (n ≈ 1.2e5/type, x ≤ 1e6 cents) R ≤ ~1.5e16, five
    # orders inside BIGINT; past n ≈ 3e6 rows PER KEY the
    # cross-multiplied form needs the drift moved into the per-shard
    # partials (subtract a per-shard integer mean and carry the
    # remainder — same algebra, bounded operands) or a coarser
    # quantization. The plan shape is unchanged either way.
    def cusum_shard(spark, sf):
        ev = load_table(spark, "events", sf)
        q = ev.select(
            "event_type", "ts", "event_id",
            F.expr("CAST(floor(value * 100) AS BIGINT)").alias("x"))
        st = q.groupBy("event_type").agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("x").alias("tot"))
        d = (
            q.join(F.broadcast(st), "event_type")
            .select(
                "event_type", "ts", "event_id", "n",
                F.date_trunc("month", "ts").cast("date").alias("shard"),
                (F.col("x") * F.col("n") - F.col("tot")).alias("dd"),
            )
        )
        w_in = (Window.partitionBy("event_type", "shard")
                .orderBy("ts", "event_id")
                .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        rows = (
            d.withColumn("r", F.sum("dd").over(w_in))
            .withColumn("m", F.least(F.lit(0).cast("bigint"),
                                     F.min("r").over(w_in)))
        )
        shards = rows.groupBy("event_type", "shard").agg(
            F.max("n").alias("n"),
            F.sum("dd").alias("a"),
            F.max("r").alias("rmax"),
            (F.max(F.col("r") - F.col("m"))).alias("b0max"),
            (F.sum("dd") - F.least(F.lit(0).cast("bigint"), F.min("r")))
            .alias("b"),
        )
        w_ord = (Window.partitionBy("event_type").orderBy("shard")
                 .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        w_lag = Window.partitionBy("event_type").orderBy("shard")
        folded = (
            shards.withColumn("c", F.sum("a").over(w_ord))
            .withColumn("s_after",
                        F.col("c")
                        + F.max(F.col("b") - F.col("c")).over(w_ord))
            .withColumn("s_in", F.coalesce(
                F.lag("s_after", 1).over(w_lag),
                F.lit(0).cast("bigint")))
            .withColumn("exc", F.greatest(
                F.col("b0max"), F.col("s_in") + F.col("rmax")))
        )
        return (
            folded.groupBy("event_type")
            .agg(F.max("n").alias("n"),
                 F.expr("max_by(s_after, shard)").cast("bigint")
                 .alias("final_state"),
                 F.max("exc").cast("bigint").alias("max_excursion"))
            .orderBy("event_type")
        )

    register(
        "cusum_shard_merge",
        cusum_shard,
        """
        WITH q AS (
          SELECT event_type, ts, event_id,
                 CAST(floor(value * 100) AS BIGINT) AS x
          FROM events
        ),
        st AS (
          SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(x) AS BIGINT) AS tot
          FROM q GROUP BY 1
        ),
        d AS (
          SELECT q.event_type, q.ts, q.event_id, st.n,
                 q.x * st.n - st.tot AS dd
          FROM q JOIN st USING (event_type)
        ),
        r1 AS (
          SELECT event_type, n, ts, event_id,
                 CAST(sum(dd) OVER (PARTITION BY event_type
                                    ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS BIGINT) AS run
          FROM d
        ),
        r2 AS (
          SELECT event_type, n, run,
                 least(0, min(run) OVER (PARTITION BY event_type
                                         ORDER BY ts, event_id
                                         ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND CURRENT ROW)) AS mn
          FROM r1
        )
        SELECT event_type, CAST(max(n) AS BIGINT) AS n,
               -- Σd = 0 by construction, so the final state is −min(0, min R)
               CAST(-min(mn) AS BIGINT) AS final_state,
               CAST(max(run - mn) AS BIGINT) AS max_excursion
        FROM r2 GROUP BY 1 ORDER BY 1
        """,
    )

    # ---- incremental Bloom register maintenance ---------------------------
    # Membership registers as a maintained TABLE: the base partition's
    # 1024-word blocked Bloom (customer keys seen in orders before the
    # split date) is built once; a delta batch contributes its own
    # registers; the merge is a bitwise-OR fold — registers combine
    # without re-touching base facts, exactly how a persisted filter
    # is maintained across daily loads at 100 TB (the in-plan base
    # build here stands in for reading the persisted register table,
    # like the ANN index build/query split). Output: every word with
    # its base/delta/merged bits + merged popcount; words untouched by
    # either side default to 0 via the full-outer zero-fill rule.
    #
    # Since round 11 the query routes through the REAL maintenance
    # operators — ``bloom_registers`` for each side's build (identical
    # portable-hash + affine-second-probe geometry; positions 0..62,
    # see maintenance.BLOOM_BITS) and ``merge_bloom_registers``
    # (unionByName fold + column-set check) for the merged column —
    # so the operator surface the round-11 refold changed carries this
    # query's driver evidence: the oracle's full rebuild proves
    # build + by-name fold == rebuild. Each register TABLE is
    # materialized once (cache + count — the persisted-register-table
    # stand-in, and what keeps the display join and the merge fold
    # from re-scanning the facts: AQE's stage cache did not unify the
    # two lazily-replanned register subtrees, measured 4 scans
    # uncached vs 2 cached). Residue contract (rfm precedent): two
    # ≤``_BLOOM_WORDS``-row cached frames per call.
    def bloom_union(spark, sf):
        from building_permissions_etl_spark.operators.maintenance import (
            bloom_registers,
            merge_bloom_registers,
        )

        orders = load_table(spark, "orders", sf)
        base = bloom_registers(
            orders.filter(F.col("o_orderdate") < F.lit(_SPLIT)),
            "o_custkey", words=_BLOOM_WORDS, bits=_BLOOM_BITS).cache()
        delta = bloom_registers(
            orders.filter(F.col("o_orderdate") >= F.lit(_SPLIT)),
            "o_custkey", words=_BLOOM_WORDS, bits=_BLOOM_BITS).cache()
        base.count()
        delta.count()
        merged = merge_bloom_registers(base, delta)
        return (
            base.withColumnRenamed("bits", "base_bits")
            .join(delta.withColumnRenamed("bits", "delta_bits"),
                  "word_idx", "full")
            .join(merged.withColumnRenamed("bits", "merged_bits"),
                  "word_idx")
            .select(
                F.col("word_idx"),
                F.coalesce("base_bits", F.lit(0).cast("bigint"))
                .alias("base_bits"),
                F.coalesce("delta_bits", F.lit(0).cast("bigint"))
                .alias("delta_bits"),
                F.col("merged_bits"),
                F.bit_count("merged_bits").cast("bigint")
                .alias("merged_popcount"),
            )
            .orderBy("word_idx")
        )

    register(
        "bloom_incremental_union",
        bloom_union,
        f"""
        WITH base AS ({SK.bloom_regs_sql(f"o_orderdate < DATE '{_SPLIT}'")}),
        delta AS ({SK.bloom_regs_sql(f"o_orderdate >= DATE '{_SPLIT}'")}),
        merged AS (
          SELECT coalesce(b.word_idx, d.word_idx) AS word_idx,
                 CAST(coalesce(b.bits, 0) AS BIGINT) AS base_bits,
                 CAST(coalesce(d.bits, 0) AS BIGINT) AS delta_bits
          FROM base b FULL JOIN delta d ON b.word_idx = d.word_idx
        )
        SELECT word_idx, base_bits, delta_bits,
               CAST(base_bits | delta_bits AS BIGINT) AS merged_bits,
               CAST(bit_count(base_bits | delta_bits) AS BIGINT)
                 AS merged_popcount
        FROM merged ORDER BY word_idx
        """,
    )

    # ---- incremental near-dup: delta-vs-corpus MinHash-LSH ----------------
    # The sketch counterpart of dedup_incremental_batch's exact probe:
    # only the delta (doc_id % 5 = 0, ~20% of the corpus) is signed and
    # banded against the existing corpus — the corpus is never
    # self-joined, and at 100 TB its banded signature table is
    # PERSISTED per ingest (the ANN build/query-split rule). Runs on
    # the portable md5-prefix hash so DuckDB replicates the whole
    # pipeline: shingling, 64 affine permutations, banding, the
    # corpus-side hot-bucket cap, and the component-equality estimator.
    def minhash_incr(spark, sf):
        docs = load_table(spark, "documents", sf)
        return D.minhash_lsh_incremental(
            docs.filter(F.col("doc_id") % 5 != 0),
            docs.filter(F.col("doc_id") % 5 == 0),
            "text", "doc_id", k=64, bands=16, min_est_jaccard=0.5,
            base_hash=portable_hash64, max_bucket=D.DEFAULT_MAX_BUCKET,
        )

    register(
        "dedup_minhash_incremental",
        minhash_incr,
        SK.minhash_lsh_incremental_sql(
            _SHINGLES3, "doc_id % 5 = 0", k=64, bands=16, min_est=0.5,
            max_bucket=D.DEFAULT_MAX_BUCKET,
        ),
    )

    # ---- incremental z-order extent maintenance ---------------------------
    # The extent table zorder_extent_pruning derives in one pass, as a
    # MAINTAINED table: base-partition extents and delta-batch extents
    # are each a per-bucket (n, min, max, min, max) rollup; the merge
    # is union + re-aggregate with (sum, min, max) — all five measures
    # are mergeable, so maintenance never re-reads the base partition.
    # The oracle is the FULL-REBUILD single-pass rollup: value parity
    # is the maintenance-equals-rebuild proof. Quantization is the
    # canonical clamped 8-bit scheme — the hoisted ZQ_* names in
    # functions/zorder.py (this module predated the hoist with
    # byte-identical inline copies; folded in round 14 under the
    # dead-evidence rule, when zorder_extent_merge re-entered the
    # driver window — emitted oracle SQL pinned sha256-identical by
    # tests/test_round14_plan_shape.py).

    def zorder_merge(spark, sf):
        orders = load_table(spark, "orders", sf)
        z_sql = z_interleave_sql(ZQ_DAY_SPARK, ZQ_PRICE_SPARK, 8, "spark")

        def extents(df):
            return (
                df.select(
                    F.expr(f"CAST({z_sql} div 64 AS BIGINT)")
                    .alias("zbucket"),
                    F.expr("datediff(o_orderdate, DATE '1995-01-01')")
                    .cast("bigint").alias("day"),
                    F.expr("CAST(floor(o_totalprice) AS BIGINT)")
                    .alias("price"))
                .groupBy("zbucket")
                .agg(F.count(F.lit(1)).cast("bigint").alias("n"),
                     F.min("day").alias("min_day"),
                     F.max("day").alias("max_day"),
                     F.min("price").alias("min_price"),
                     F.max("price").alias("max_price"))
            )

        base = extents(orders.filter(F.col("o_orderdate") < F.lit(_SPLIT)))
        delta = extents(orders.filter(F.col("o_orderdate") >= F.lit(_SPLIT)))
        return (
            base.unionAll(delta)
            .groupBy("zbucket")
            .agg(F.sum("n").alias("n"),
                 F.min("min_day").alias("min_day"),
                 F.max("max_day").alias("max_day"),
                 F.min("min_price").alias("min_price"),
                 F.max("max_price").alias("max_price"))
            .orderBy("zbucket")
        )

    register(
        "zorder_extent_merge",
        zorder_merge,
        f"""
        SELECT CAST({z_interleave_sql(ZQ_DAY_DUCK, ZQ_PRICE_DUCK, 8, "duckdb")} // 64
                 AS BIGINT) AS zbucket,
               CAST(count(*) AS BIGINT) AS n,
               CAST(min(date_diff('day', DATE '1995-01-01', o_orderdate))
                 AS BIGINT) AS min_day,
               CAST(max(date_diff('day', DATE '1995-01-01', o_orderdate))
                 AS BIGINT) AS max_day,
               CAST(min(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT)
                 AS min_price,
               CAST(max(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT)
                 AS max_price
        FROM orders GROUP BY 1 ORDER BY 1
        """,
    )
