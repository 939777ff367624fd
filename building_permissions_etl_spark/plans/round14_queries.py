"""Round-14 batch: the z-file layout's COMPACTION — the maintenance
primitive the round-13 verdict named as the family's one remaining
lifecycle gap — and the full maintained-layout LOOP (append → compact
→ append again) run end-to-end. Two queries.

``zorder_layout_compacted_skip`` — rounds 12-13 built the maintained
z-order arc: extents as footer stats (round 12), the partitioned
layout whose candidate IN-list is directory-level skipping (round 13),
and the layout UNDER INGEST (append + ``merge_extent_tables``, the
multi-file-per-partition steady state). A real warehouse's next move
on that steady state is OPTIMIZE bin-packing: rewrite each fragmented
partition's files into one, touching NOTHING else. Prep here builds
its own copy of the exact under-ingest layout (shared
``_write_zfile_incr_layout`` — base ``partitionBy(zfile)`` write +
appended delta batch + merged extent table), then runs the real
``compact_partitioned_layout`` operator on it: the rewrite scans ONLY
the multi-file partitions (PartitionFilters IN-list, pinned), writes
one file per touched directory via a staging root, and swaps the
fragmented files out. The extent table is NOT rebuilt — compaction
moves bytes, not values, so the merged extents stay valid verbatim;
the probe is byte-for-byte the shared ``_skip_box_aggregate`` and the
oracle is byte-for-byte the shared prune-free box text
(``_ZFILE_BOX_ORACLE``): value parity across the rewrite IS the
completeness proof, and the runtime pin that the executed scan's
``numFiles`` drops back to ``n_candidate_files`` (the exact inverse
of the incremental variant's ``numFiles > n_candidate_files`` pin,
with ``numPartitions`` unchanged) is the measured payoff. At 100 TB
this closes the loop: OPTIMIZE-ZORDER once, append + footer-stat
merges per ingest, compact fragmented partitions back to
one-file-per-range — scan cost returns to the candidate fraction.

Reference scope: beyond the reference surface — the clustering intent
at /root/reference/dags/aggregates_python_helpers.py:728-733 (the
partitioned+clustered sink) taken to its lifecycle conclusion; public
Delta Lake OPTIMIZE (bin-packing) / Iceberg rewrite_data_files
design; Morton (1966) for the layout itself.

``zorder_layout_lifecycle_skip`` — the loop those primitives compose
into, run end-to-end in one prep: base load, delta-1 append with the
extent table maintained by ``merge_extent_tables``, OPTIMIZE
bin-packing (extents carried verbatim across the rewrite), then a
delta-2 append whose extents merge into the CARRIED table — merged,
survived a rewrite, merged again. The probe box straddles all three
ingests, so the candidate set mixes packed and re-fragmented
directories, and the shared prune-free oracle proves the whole
composition at once: any lost/duplicated row in either append or the
rewrite shifts the box values, and any merge-algebra error across the
compaction shifts the candidate/total counts. This is the per-week
shape of a maintained 100 TB table: OPTIMIZE never gets a quiet
table, and correctness has to survive the interleaving.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from building_permissions_etl_spark.catalog import load_table
from building_permissions_etl_spark.operators.maintenance import (
    compact_partitioned_layout,
    merge_extent_tables,
)
from building_permissions_etl_spark.plans.artifact_store import (
    publish_artifacts,
)
from building_permissions_etl_spark.plans.round13_queries import (
    _ZFILE_BOX_ORACLE,
    _skip_box_aggregate,
    _write_zfile_incr_layout,
    _zfile_extents,
    _zfile_rows,
)

# Second ingest boundary for the lifecycle query: with round 9's
# _SPLIT (1997-06-01) this three-ways the fixture — base < _SPLIT,
# delta1 in [_SPLIT, _SPLIT2), delta2 ≥ _SPLIT2 — so the appended
# layout always holds exactly the full orders table and the shared
# prune-free oracle stays valid verbatim. The round-12 probe box
# (1997-03-11 .. 1998-04-15) straddles all three ingests, so the
# probe's candidate set mixes compacted and freshly-fragmented
# directories — the mixed steady state a maintained table lives in.
_SPLIT2 = "1998-01-01"


def _layout_compact_artifact(spark, sf: str) -> dict:
    """Build-and-publish step: the under-ingest z-file layout (own
    copy — compacting the round-13 artifact in place would destroy
    the multi-file steady state ITS runtime pin proves) with
    ``compact_partitioned_layout`` run on it, plus a one-row stats
    artifact recording what the compaction did (partitions/files
    before and after) so tests and audits read measured facts, not
    narrative. The merged extent table is carried over UNCHANGED —
    the whole point: stats are value-derived, and compaction moves
    bytes, not values."""
    def _write(root: str) -> dict:
        paths = _write_zfile_incr_layout(spark, sf, root)
        layout_p = paths["orders_by_zfile_incr"]
        stats = compact_partitioned_layout(spark, layout_p, "zfile")
        if stats["n_touched"] == 0:
            raise ValueError(
                "compaction found no multi-file partitions — the "
                "under-ingest build no longer fragments, so this "
                "query would prove nothing; fix the build")
        stats_p = f"{root}/compact_stats.parquet"
        spark.createDataFrame(
            [(stats["n_partitions"], stats["n_touched"],
              stats["files_before"], stats["files_after"])],
            "n_partitions bigint, n_touched bigint, "
            "files_before bigint, files_after bigint",
        ).coalesce(1).write.mode("overwrite").parquet(stats_p)
        return {"orders_by_zfile_compact": layout_p,
                "zfile_extents_merged": paths["zfile_extents_merged"],
                "compact_stats": stats_p}

    return publish_artifacts(spark, sf, "orders.parquet",
                             "zorder_layout_compact", _write)


def _append_ingest(spark, layout_p: str, rows, prev_ext, ext_out: str):
    """One maintained-table ingest: APPEND the batch into the
    partition directories, roll its write-time extents up from the
    same shuffled frame (one batch scan — cached across the write and
    the rollup), merge them into the carried extent table, and
    MATERIALIZE the merged result to parquet before returning it — the
    ADVICE-r13 discipline: every extent table is pinned to the files
    of its own ingest, never a lazy listing that a later append could
    refresh."""
    batch = rows.repartition("zfile").cache()
    try:
        batch.write.mode("append").partitionBy("zfile").parquet(layout_p)
        (merge_extent_tables(prev_ext, _zfile_extents(batch))
         .coalesce(1).write.mode("overwrite").parquet(ext_out))
    finally:
        batch.unpersist()


def _write_zfile_lifecycle_layout(spark, sf: str, root: str) -> dict:
    """The maintained layout's FULL LOOP in one build: base load →
    delta-1 append + extent merge (the fragmented state round 13
    proved) → OPTIMIZE bin-packing compaction (extents untouched —
    the round-14 primitive) → delta-2 append + a SECOND extent merge
    on top of the carried table. What ships is the mixed steady state
    every maintained z-ordered table actually lives in: some
    partitions packed by the last OPTIMIZE, some re-fragmented by the
    ingest after it, and an extent table that was merged, carried
    across a rewrite, and merged again — associativity exercised on
    artifacts, not in a unit test."""
    od = load_table(spark, "orders", sf)
    from building_permissions_etl_spark.plans.round9_queries import _SPLIT

    layout_p = os.path.join(root, "orders_by_zfile_cycle.parquet")
    base = _zfile_rows(od.filter(F.col("o_orderdate") < F.lit(_SPLIT)))
    (base.repartition("zfile")
     .write.mode("overwrite").partitionBy("zfile").parquet(layout_p))
    ext0_p = os.path.join(root, "ext_base.parquet")
    (_zfile_extents(spark.read.parquet(layout_p))
     .coalesce(1).write.mode("overwrite").parquet(ext0_p))

    # ingest 2: delta-1 fragments partitions the base also wrote
    ext1_p = os.path.join(root, "ext_merged1.parquet")
    _append_ingest(
        spark, layout_p,
        _zfile_rows(od.filter(
            (F.col("o_orderdate") >= F.lit(_SPLIT))
            & (F.col("o_orderdate") < F.lit(_SPLIT2)))),
        spark.read.parquet(ext0_p), ext1_p)

    # OPTIMIZE: pack the fragmented partitions; the extent table is
    # NOT rebuilt (compaction moves bytes, not values)
    stats = compact_partitioned_layout(spark, layout_p, "zfile")
    if stats["n_touched"] == 0:
        raise ValueError("lifecycle compaction found nothing to pack — "
                         "the delta-1 ingest no longer fragments")

    # ingest 3: delta-2 re-fragments part of the packed layout; its
    # extents merge into the CARRIED table (merged once, survived a
    # rewrite, merged again)
    ext2_p = os.path.join(root, "ext_merged2.parquet")
    _append_ingest(
        spark, layout_p,
        _zfile_rows(od.filter(F.col("o_orderdate") >= F.lit(_SPLIT2))),
        spark.read.parquet(ext1_p), ext2_p)

    stats_p = os.path.join(root, "cycle_stats.parquet")
    spark.createDataFrame(
        [(stats["n_partitions"], stats["n_touched"],
          stats["files_before"], stats["files_after"])],
        "n_partitions bigint, n_touched bigint, "
        "files_before bigint, files_after bigint",
    ).coalesce(1).write.mode("overwrite").parquet(stats_p)
    return {"orders_by_zfile_cycle": layout_p,
            "zfile_extents_cycle": ext2_p,
            "cycle_stats": stats_p}


def _layout_lifecycle_artifact(spark, sf: str) -> dict:
    return publish_artifacts(
        spark, sf, "orders.parquet", "zorder_layout_cycle",
        lambda root: _write_zfile_lifecycle_layout(spark, sf, root))


def contribute(register) -> None:
    # ---- OPTIMIZE bin-packing: fragmented layout back to 1 file/dir -------
    def zfile_compacted_skip(spark, sf):
        paths = _layout_compact_artifact(spark, sf)
        return _skip_box_aggregate(spark,
                                   paths["orders_by_zfile_compact"],
                                   paths["zfile_extents_merged"])

    register("zorder_layout_compacted_skip", zfile_compacted_skip,
             _ZFILE_BOX_ORACLE)

    # ---- the full loop: append → compact → append, skip intact ------------
    def zfile_lifecycle_skip(spark, sf):
        paths = _layout_lifecycle_artifact(spark, sf)
        return _skip_box_aggregate(spark,
                                   paths["orders_by_zfile_cycle"],
                                   paths["zfile_extents_cycle"])

    register("zorder_layout_lifecycle_skip", zfile_lifecycle_skip,
             _ZFILE_BOX_ORACLE)
