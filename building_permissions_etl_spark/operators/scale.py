"""Parallelism guard for compute-heavy narrow stages.

A parquet scan yields one task per file split; a small or single-row-group
file therefore scans as ONE partition, and every narrow transformation
stacked on it (shingling, minhashing, per-row feature extraction) runs on
one core no matter how many the cluster has. At warehouse scale the file
source provides thousands of splits and this helper is a no-op; on small
inputs it pays one cheap shuffle of the raw rows to unlock every core for
the expensive projection that follows.

Use it ONLY in front of per-row-expensive work (hash families, n-gram
pipelines, vector math, Pandas UDFs) — a plain filter/agg query should let
Catalyst/AQE pick partitioning, and its first shuffle redistributes anyway.

Contract: apply DIRECTLY to a scan (or narrow transformations of one).
The probe reads the lineage's source file list, which is the partition
count only for scan-rooted plans; a frame that already contains a
shuffle/aggregation reports its SOURCE's files, not its current
(possibly AQE-coalesced) partitioning, so the guard would silently no-op
there. Every in-repo call site follows this contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition iff the scan would yield fewer partitions
    than the session's default parallelism (or ``min_partitions``).

    The probe is the FileIndex's file listing (``inputFiles``) — already
    cached by the data source, no RDD or physical plan is built. A scan
    with at least ``target`` files always yields at least that many
    splits, so the helper is a guaranteed no-op at warehouse scale
    without paying plan-analysis latency per call (the round-1 form
    forced ``df.rdd`` materialization on every invocation). Only
    non-file sources (in-memory test frames) fall back to the exact
    RDD-partition check.
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    try:
        n_files = len(df.inputFiles())
    except Exception:
        n_files = 0
    if n_files >= target:
        return df
    if n_files == 0:
        try:
            # JVM-side internal RDD: physical planning only — skips the
            # Python-serializer conversion layer df.rdd would stack on
            n_parts = df._jdf.queryExecution().toRdd().getNumPartitions()
        except Exception:
            n_parts = df.rdd.getNumPartitions()
        if n_parts >= target:
            return df
    return df.repartition(target)
