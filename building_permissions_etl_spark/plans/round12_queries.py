"""Round-12 batch: the Bloom register table in its PERSISTED-probe
shape.

``bloom_incremental_union`` (rounds 9/11) proved the register algebra
— build + by-name OR-fold == full rebuild — but both register tables
were built from fixture scans inside the query, so its driver
evidence never demonstrated the claim that makes a maintained Bloom
table affordable at 100 TB: once the register artifact EXISTS, a
probe costs one ≤1024-row artifact read plus a scan of the DELTA
only. ``bloom_register_persisted_probe`` closes that gap with the
same build/probe split as ``psi_drift_persisted``
(`plans/round11_queries.py`) and the ANN index family
(`operators/similarity.py`):

* a session-scoped PREP step builds the BASE partition's register
  table (orders before ``_BASE_END``, keyed on o_custkey — one
  partial-agg scan, ≤ 1024 rows / ~8 KB) and WRITES it as a parquet
  artifact via `plans/artifact_store.py` — the "publish registers per
  ingest" step of a real deployment;
* the registered query reads ONLY the artifact (a ≤1024-row
  driver-side materialization through ``registers_to_bits``, the
  probe's documented bounded collect) and the DELTA rows (pushed
  date filter), and routes every delta order through
  ``might_contain_registers``: orders whose customer the filter
  proves DEFINITELY NEW (a Bloom filter has no false negatives) are
  aggregated into per-customer first-seen stats. The final plan
  contains exactly ONE FileScan — the delta scan with the split date
  in PushedFilters — and no scan of the base partition or of any
  fixture path besides orders; pinned by
  ``tests/test_round12_plan_shape.py``, so the zero-base-scan
  property is mechanical, not narrative.

This is the ingest-time "route definitely-new keys past the exact
dedup join" shape: at 100 TB the probe prunes the delta BEFORE any
exchange (the predicate is two element_at + compares inside codegen),
the register artifact is constant-size regardless of base growth,
and only probe-POSITIVE keys (base hits + a ~fill² false-positive
sliver) ever reach the expensive exact-membership join.

The DuckDB oracle rebuilds the registers from the base partition
(DuckDB has no artifact store — the same merge-equals-rebuild
discipline as the round-11 drift oracles) on the engine-portable
md5-prefix hash, probes with the identical word/bit algebra, and
aggregates the same definitely-new set: any divergence between the
persisted-probe path and a from-scratch rebuild is a value mismatch.

``zorder_extent_persisted_prune`` completes the same arc for the
THIRD maintained family (after the round-11 histograms and the Bloom
probe above): the z-order extent table as a PERSISTED artifact driving
data skipping. ``zorder_extent_pruning`` (round 8d) proved the extent
algebra and emitted the per-bucket skipping PREDICATE; this query
actually SKIPS with it: prep publishes the ≤1024-row extent artifact
(built through the real ``extent_table`` operator), the query derives
the candidate-bucket IN-list from the artifact alone (bounded
driver-side read, the ``registers_to_bits`` precedent), prunes the
fact scan to candidate buckets, and answers a 2-D box aggregate. The
DuckDB oracle computes the box aggregate WITHOUT any pruning (plus the
candidate counts from its own extent rebuild) — so value parity IS the
losslessness proof: extent pruning is a superset filter that never
drops a qualifying row. At 100 TB the artifact is footer-stats-shaped
(one row per file/bucket), the candidate derivation touches only it,
and the scan reads candidate buckets only — on a z-sorted table that
is file skipping, which neither a 1-D sort nor a full scan gives.

Reference scope: beyond the reference surface (helpers:* has no
maintained-table tooling); Bloom (1970), blocked layout per Putze,
Sanders & Singler (2007); Morton (1966) and the public Delta/Iceberg
OPTIMIZE ZORDER + file-statistics design.
"""

from __future__ import annotations

import datetime as _dt
import os

from pyspark.sql import functions as F

from building_permissions_etl_spark.catalog import load_table
from building_permissions_etl_spark.functions.portable import (
    PORTABLE_HASH_SQL,
)
from building_permissions_etl_spark.functions.zorder import (
    ZQ_DAY_DUCK,
    ZQ_DAY_SPARK,
    ZQ_PRICE_DUCK,
    ZQ_PRICE_SPARK,
    z_interleave_sql,
)
from building_permissions_etl_spark.operators.maintenance import (
    BLOOM_AFFINE_ADD,
    BLOOM_AFFINE_MOD,
    BLOOM_AFFINE_MUL,
    BLOOM_BITS,
    BLOOM_WORDS,
    bloom_registers,
    extent_table,
    might_contain_registers,
    registers_to_bits,
)
from building_permissions_etl_spark.plans import sketch_oracles as SK
from building_permissions_etl_spark.plans.artifact_store import (
    publish_artifacts,
)
from building_permissions_etl_spark.plans.round9_queries import _SPLIT

# Base partition: the fixture's first ~6 months (777 of 1500 custkeys
# at sf0.01 — enough churn that the delta has a substantive
# definitely-new set). Delta: the family's standing incremental split,
# imported from round9_queries so the Bloom family shares ONE split.
_BASE_END = "1995-07-01"


def _register_artifact(spark, sf: str) -> str:
    """Build-and-publish step: write the base partition's Bloom
    register table for ``sf`` (if this session hasn't yet) and return
    its path. Cache/invalidation/eviction/exit-cleanup live in
    ``plans/artifact_store.py``, shared with the round-11 drift
    snapshots."""
    def _write(root: str) -> dict:
        od = load_table(spark, "orders", sf)
        base = od.filter(F.col("o_orderdate") < F.lit(_BASE_END))
        p = os.path.join(root, "custkey_registers.parquet")
        # ≤ BLOOM_WORDS rows: one output file
        (bloom_registers(base, "o_custkey")
         .coalesce(1).write.mode("overwrite").parquet(p))
        return {"custkey_registers": p}

    return publish_artifacts(spark, sf, "orders.parquet",
                             "bloom_registers", _write)["custkey_registers"]


def contribute(register) -> None:
    # ---- persisted Bloom-register probe over the delta batch ---------------
    def bloom_probe(spark, sf):
        regs = spark.read.parquet(_register_artifact(spark, sf))
        # ≤1024-row ARTIFACT read (never base rows): the documented
        # bounded collect behind every register probe
        # (maintenance.registers_to_bits)
        bits_arr = registers_to_bits(regs, BLOOM_WORDS)
        od = load_table(spark, "orders", sf)
        delta = od.filter(
            F.col("o_orderdate") >= F.lit(_SPLIT).cast("timestamp"))
        fresh = delta.filter(~might_contain_registers(
            F.col("o_custkey"), bits_arr, BLOOM_WORDS, BLOOM_BITS))
        return (
            fresh.groupBy("o_custkey")
            .agg(F.count(F.lit(1)).cast("bigint").alias("delta_orders"),
                 F.sum(F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)"))
                 .cast("bigint").alias("delta_cents"))
            .orderBy("o_custkey")
        )

    _h1 = PORTABLE_HASH_SQL.format(x="CAST(o_custkey AS VARCHAR)")
    register(
        "bloom_register_persisted_probe",
        bloom_probe,
        f"""
        WITH regs AS ({SK.bloom_regs_sql(
            f"o_orderdate < TIMESTAMP '{_BASE_END}'")}
        ),
        delta_keys AS (
          SELECT DISTINCT o_custkey FROM orders
          WHERE o_orderdate >= TIMESTAMP '{_SPLIT}'
        ),
        probes AS (
          SELECT o_custkey,
                 unnest([h1, (h1 % {BLOOM_AFFINE_MOD}) * {BLOOM_AFFINE_MUL}
                             + {BLOOM_AFFINE_ADD}]) AS h
          FROM (SELECT o_custkey, {_h1} AS h1 FROM delta_keys)
        ),
        hits AS (
          SELECT p.o_custkey,
                 count(*) FILTER (
                   WHERE r.bits
                         & (CAST(1 AS BIGINT)
                            << CAST((p.h // {BLOOM_WORDS}) % {BLOOM_BITS}
                                    AS INT))
                         = (CAST(1 AS BIGINT)
                            << CAST((p.h // {BLOOM_WORDS}) % {BLOOM_BITS}
                                    AS INT))) AS nhit
          FROM probes p
          LEFT JOIN regs r ON CAST(p.h % {BLOOM_WORDS} AS INT) = r.word_idx
          GROUP BY 1
        )
        SELECT o.o_custkey,
               CAST(count(*) AS BIGINT) AS delta_orders,
               CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS delta_cents
        FROM orders o
        JOIN (SELECT o_custkey FROM hits WHERE nhit < 2) fresh
          USING (o_custkey)
        WHERE o.o_orderdate >= TIMESTAMP '{_SPLIT}'
        GROUP BY 1 ORDER BY 1
        """,
    )

    _contribute_extent(register)


# 2-D box for the extent-pruned aggregate, in the same quantized plane
# as the round-8d candidacy predicate: day ∈ [800, 1200) since
# 1995-01-01, whole-dollar price ∈ [100000, 200000). The row-level
# filter uses the RAW columns (date literals push to the parquet
# reader); the bucket-candidacy test uses the artifact's extents of
# the same day/price values, so every box row's bucket is a candidate
# (superset property — proven by the prune-free oracle).
_DAY_LO, _DAY_HI = 800, 1200
_PRICE_LO, _PRICE_HI = 100_000, 200_000
_Z_EPOCH = _dt.date(1995, 1, 1)
_DATE_LO = (_Z_EPOCH + _dt.timedelta(days=_DAY_LO)).isoformat()
_DATE_HI = (_Z_EPOCH + _dt.timedelta(days=_DAY_HI)).isoformat()


def _extent_artifact(spark, sf: str) -> str:
    """Build-and-publish step for the z-order family: the base table's
    per-bucket extent table (one row per occupied 64-z-value bucket,
    ≤1024 rows for the 16-bit interleave), built through the real
    ``extent_table`` operator and written as a parquet artifact — the
    footer-stats table a z-sorted warehouse layout maintains per
    file."""
    def _write(root: str) -> dict:
        od = load_table(spark, "orders", sf)
        z_sql = z_interleave_sql(ZQ_DAY_SPARK, ZQ_PRICE_SPARK, 8, "spark")
        rows = od.select(
            F.expr(f"CAST({z_sql} div 64 AS BIGINT)").alias("zbucket"),
            F.expr("datediff(o_orderdate, DATE '1995-01-01')")
            .cast("bigint").alias("day"),
            F.expr("CAST(floor(o_totalprice) AS BIGINT)").alias("price"))
        p = os.path.join(root, "orders_extents.parquet")
        (extent_table(rows, "zbucket", ["day", "price"])
         .coalesce(1).write.mode("overwrite").parquet(p))
        return {"orders_extents": p}

    return publish_artifacts(spark, sf, "orders.parquet",
                             "zorder_extents", _write)["orders_extents"]


def _contribute_extent(register) -> None:
    # ---- persisted extent table driving an actually-pruned scan ----------
    def extent_probe(spark, sf):
        # ≤1024-row ARTIFACT read at construction (never base rows):
        # the candidate set is derived from the persisted extents
        # alone, exactly as a reader derives a file list from footer
        # stats
        ext_rows = spark.read.parquet(_extent_artifact(spark, sf)).collect()
        cand = sorted(int(r["bucket"]) for r in ext_rows
                      if r["max_day"] >= _DAY_LO and r["min_day"] < _DAY_HI
                      and r["max_price"] >= _PRICE_LO
                      and r["min_price"] < _PRICE_HI)
        od = load_table(spark, "orders", sf)
        z_sql = z_interleave_sql(ZQ_DAY_SPARK, ZQ_PRICE_SPARK, 8, "spark")
        zbucket = F.expr(f"CAST({z_sql} div 64 AS BIGINT)")
        pruned = od.filter(zbucket.isin(cand)) if cand else od.filter(
            F.lit(False))
        box = pruned.filter(
            (F.col("o_orderdate") >= F.lit(_DATE_LO).cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(_DATE_HI).cast("timestamp"))
            & (F.col("o_totalprice") >= F.lit(float(_PRICE_LO)))
            & (F.col("o_totalprice") < F.lit(float(_PRICE_HI))))
        return box.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.coalesce(
                F.sum(F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)")),
                F.lit(0)).cast("bigint").alias("revenue_cents"),
        ).select(
            "*",
            F.lit(len(cand)).cast("bigint").alias("n_candidate_buckets"),
            F.lit(len(ext_rows)).cast("bigint").alias("n_total_buckets"))

    register(
        "zorder_extent_persisted_prune",
        extent_probe,
        f"""
        WITH rows_q AS (
          SELECT {z_interleave_sql(ZQ_DAY_DUCK, ZQ_PRICE_DUCK, 8, "duckdb")}
                   // 64 AS zbucket,
                 CAST(date_diff('day', DATE '1995-01-01', o_orderdate)
                   AS BIGINT) AS day,
                 CAST(floor(o_totalprice) AS BIGINT) AS price
          FROM orders
        ),
        ext AS (
          SELECT zbucket, min(day) AS min_day, max(day) AS max_day,
                 min(price) AS min_price, max(price) AS max_price
          FROM rows_q GROUP BY 1
        ),
        cand AS (
          SELECT CAST(count(*) FILTER (
                   WHERE max_day >= {_DAY_LO} AND min_day < {_DAY_HI}
                     AND max_price >= {_PRICE_LO}
                     AND min_price < {_PRICE_HI}) AS BIGINT)
                   AS n_candidate_buckets,
                 CAST(count(*) AS BIGINT) AS n_total_buckets
          FROM ext
        ),
        box AS (
          SELECT CAST(count(*) AS BIGINT) AS n_rows,
                 CAST(coalesce(sum(CAST(floor(o_totalprice * 100)
                                        AS BIGINT)), 0) AS BIGINT)
                   AS revenue_cents
          FROM orders
          WHERE o_orderdate >= TIMESTAMP '{_DATE_LO}'
            AND o_orderdate < TIMESTAMP '{_DATE_HI}'
            AND o_totalprice >= {_PRICE_LO} AND o_totalprice < {_PRICE_HI}
        )
        SELECT box.n_rows, box.revenue_cents,
               cand.n_candidate_buckets, cand.n_total_buckets
        FROM box, cand
        """,
    )
