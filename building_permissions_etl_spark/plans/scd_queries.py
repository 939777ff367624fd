"""Registry contributions: SCD1/SCD2 dimension-merge state computation
(`operators/scd.py`) on a deterministic synthetic update batch.

Batch construction (pure functions of the fixture, no RNG):
  * every customer with ``c_custkey % 7 = 0`` gets ``c_acctbal + 100``
    (a guaranteed tracked-attribute change),
  * every customer with ``c_custkey % 97 = 0`` spawns a brand-new key
    ``c_custkey + 1000000`` (insert leg),
  * everyone else is absent from the batch (pass-through leg).

The registered outputs restrict to the touched keys plus a slice of
untouched ones so every merge leg (pass-through, close, re-open,
insert) is represented in the value-checked result.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from building_permissions_etl_spark.catalog import load_table
from building_permissions_etl_spark.operators import scd as SCD

_EFF = "2001-06-01"
_TRACKED = ["c_acctbal", "c_mktsegment"]


def _current(spark, sf):
    return load_table(spark, "customer", sf).select(
        "c_custkey", "c_name", "c_nationkey",
        F.round("c_acctbal", 2).alias("c_acctbal"), "c_mktsegment",
        F.lit("2000-01-01").cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
    )


def _updates(spark, sf):
    return _updates_from(load_table(spark, "customer", sf))


def _updates_from(cust):
    changed = cust.filter(F.col("c_custkey") % 7 == 0).select(
        "c_custkey",
        F.round(F.col("c_acctbal") + 100, 2).alias("c_acctbal"),
        "c_mktsegment",
    )
    new = cust.filter(F.col("c_custkey") % 97 == 0).select(
        (F.col("c_custkey") + 1000000).alias("c_custkey"),
        F.lit(50.0).alias("c_acctbal"),
        F.lit("NEW").alias("c_mktsegment"),
    )
    return changed.unionByName(new)


_CUR_SQL = """
  SELECT c_custkey, c_name, c_nationkey, round(c_acctbal, 2) AS c_acctbal,
         c_mktsegment, TIMESTAMP '2000-01-01' AS valid_from,
         CAST(NULL AS TIMESTAMP) AS valid_to
  FROM customer
"""

_UPD_SQL = """
  SELECT c_custkey, round(c_acctbal + 100, 2) AS c_acctbal, c_mktsegment
  FROM customer WHERE c_custkey % 7 = 0
  UNION ALL
  SELECT c_custkey + 1000000, 50.0, 'NEW'
  FROM customer WHERE c_custkey % 97 = 0
"""

_SUBSET = "(c_custkey % 7 = 0 OR c_custkey % 11 = 0 OR c_custkey >= 1000000)"

# ONE oracle serves both the batch and the streaming SCD1 queries (the
# stream folds to the identical final state) — a shared constant so
# the two cannot silently drift.
_SCD1_ORACLE_SQL = f"""
        WITH cur AS (
          SELECT c_custkey, c_name, c_nationkey,
                 round(c_acctbal, 2) AS c_acctbal, c_mktsegment
          FROM customer
        ),
        upd AS (SELECT *, TRUE AS in_batch FROM ({_UPD_SQL}))
        SELECT * FROM (
          SELECT cur.c_custkey, cur.c_name, cur.c_nationkey,
                 CASE WHEN coalesce(in_batch, FALSE) THEN upd.c_acctbal
                      ELSE cur.c_acctbal END AS c_acctbal,
                 CASE WHEN coalesce(in_batch, FALSE) THEN upd.c_mktsegment
                      ELSE cur.c_mktsegment END AS c_mktsegment
          FROM cur LEFT JOIN upd ON cur.c_custkey = upd.c_custkey
          UNION ALL
          SELECT upd.c_custkey, NULL, NULL, upd.c_acctbal, upd.c_mktsegment
          FROM upd WHERE upd.c_custkey NOT IN (SELECT c_custkey FROM cur)
        )
        WHERE {_SUBSET}
        ORDER BY c_custkey
        """


def contribute(register) -> None:
    # ---- SCD2: versioned history --------------------------------------
    def scd2(spark, sf):
        out = SCD.scd2_upsert(
            _current(spark, sf), _updates(spark, sf), "c_custkey",
            _TRACKED, _EFF,
        )
        return (
            out.filter(F.expr(_SUBSET))
            .select("c_custkey", "c_name", "c_nationkey", "c_acctbal",
                    "c_mktsegment", "valid_from", "valid_to")
            .orderBy("c_custkey", "valid_from")
        )

    register(
        "scd2_customer_upsert",
        scd2,
        f"""
        WITH cur AS ({_CUR_SQL}),
        upd AS ({_UPD_SQL}),
        changed AS (
          SELECT cur.c_custkey, cur.c_name, cur.c_nationkey,
                 cur.c_acctbal AS old_bal, cur.c_mktsegment AS old_seg,
                 upd.c_acctbal AS new_bal, upd.c_mktsegment AS new_seg,
                 cur.valid_from
          FROM cur JOIN upd ON cur.c_custkey = upd.c_custkey
          WHERE cur.valid_to IS NULL
            AND (cur.c_acctbal IS DISTINCT FROM upd.c_acctbal
                 OR cur.c_mktsegment IS DISTINCT FROM upd.c_mktsegment)
        )
        SELECT * FROM (
          -- pass-through: open rows not changed by the batch
          SELECT cur.* FROM cur
          WHERE cur.valid_to IS NULL
            AND cur.c_custkey NOT IN (SELECT c_custkey FROM changed)
          UNION ALL
          -- closed old versions
          SELECT c_custkey, c_name, c_nationkey, old_bal, old_seg,
                 valid_from, TIMESTAMP '{_EFF}'
          FROM changed
          UNION ALL
          -- re-opened new versions
          SELECT c_custkey, c_name, c_nationkey, new_bal, new_seg,
                 TIMESTAMP '{_EFF}', CAST(NULL AS TIMESTAMP)
          FROM changed
          UNION ALL
          -- brand-new keys (and re-activations of closed-only keys:
          -- the anti-set is keys with an OPEN version)
          SELECT upd.c_custkey, NULL, NULL, upd.c_acctbal, upd.c_mktsegment,
                 TIMESTAMP '{_EFF}', CAST(NULL AS TIMESTAMP)
          FROM upd WHERE upd.c_custkey NOT IN
               (SELECT c_custkey FROM cur WHERE valid_to IS NULL)
        )
        WHERE {_SUBSET}
        ORDER BY c_custkey, valid_from
        """,
    )

    # ---- SCD1: overwrite-in-place -------------------------------------
    def scd1(spark, sf):
        cur = _current(spark, sf).drop("valid_from", "valid_to")
        out = SCD.scd1_upsert(cur, _updates(spark, sf), "c_custkey", _TRACKED)
        return (
            out.filter(F.expr(_SUBSET))
            .select("c_custkey", "c_name", "c_nationkey", "c_acctbal",
                    "c_mktsegment")
            .orderBy("c_custkey")
        )

    register(
        "scd1_customer_upsert",
        scd1,
        _SCD1_ORACLE_SQL,
    )

    # ---- SCD1 fed by the REAL streaming engine -------------------------
    # Dimension maintenance as a stream consumer: the customer "update
    # feed" arrives through a file-source stream and each micro-batch is
    # folded into the dimension state with scd1_upsert inside
    # foreachBatch — the standard streaming-MERGE deployment shape
    # (foreachBatch + MERGE INTO on a table format). Because batch keys
    # are unique and the per-key update value is batch-independent,
    # sequential folding reaches the SAME final state however the
    # engine splits the feed into micro-batches — which is what lets
    # this stream query share the batch scd1 oracle verbatim.
    def scd1_stream(spark, sf):
        cur_schema = load_table(spark, "customer", sf).schema
        feed = (
            spark.readStream.schema(cur_schema)
            .option("pathGlobFilter", "customer.parquet")
            .parquet(sf)
        )
        state = {"df": _current(spark, sf).drop("valid_from", "valid_to")}

        def fold(batch_df, batch_id):
            updates = _updates_from(batch_df)
            merged = SCD.scd1_upsert(
                state["df"], updates, "c_custkey", _TRACKED)
            # cut lineage per batch: folding builds a plan-on-plan chain
            # that Catalyst would re-analyze superlinearly across batches
            state["df"] = merged.localCheckpoint()

        from building_permissions_etl_spark.streaming.events import (
            scoped_stream_shuffle,
        )

        with scoped_stream_shuffle(spark):
            q = (feed.writeStream.foreachBatch(fold)
                 .trigger(availableNow=True).start())
            q.awaitTermination()
        return (
            state["df"].filter(F.expr(_SUBSET))
            .select("c_custkey", "c_name", "c_nationkey", "c_acctbal",
                    "c_mktsegment")
            .orderBy("c_custkey")
        )

    register(
        "stream_scd1_upsert",
        scd1_stream,
        _SCD1_ORACLE_SQL,
    )
