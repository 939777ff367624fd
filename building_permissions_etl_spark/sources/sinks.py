"""Warehouse sinks (SURVEY.md §2.1 S4-S6, S13; §7 M5).

The reference's BigQuery sink semantics, on parquet:

  * S4  — create-if-absent with monthly time partitioning + clustering
          on terc (helpers:711-736) → ``partitionBy(month)`` +
          ``sortWithinPartitions`` (the OSS analog of BQ clustering:
          row-group locality → parquet min/max data skipping);
  * S5  — batched append (helpers:129-169) → a single distributed
          ``mode("append")`` write; 10k-row batching is a pandas artifact;
  * S6  — existence/non-empty probe (helpers:89-96);
  * S13 — two-way schema evolution for the aggregate table
          (helpers:384-408): DataFrame columns missing from the sink are
          backfilled as 0 on historic rows, sink columns missing from the
          DataFrame are added as 0 — read-modify-write on parquet (the
          Delta-flavored deployment would use mergeSchema + UPDATE);
  * idempotent month overwrite — dynamic partition overwrite replaces the
          reference's blind append, which double-counts on Airflow
          re-runs (documented deliberate deviation, SURVEY.md §7 M5).
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MONTH_COL = "month"


def write_fact_partitioned(
    df: DataFrame,
    path: str,
    event_time_col: str,
    cluster_col: str,
    mode: str = "append",
    overwrite_partitions: bool = False,
) -> None:
    """S4: derive the month partition from the event time, cluster rows
    within each partition file by ``cluster_col``. With
    ``overwrite_partitions`` the write only replaces the months present
    in ``df`` (idempotent re-runs for a logical date)."""
    out = df.withColumn(
        MONTH_COL, F.date_format(F.date_trunc("month", F.col(event_time_col)), "yyyy-MM")
    ).sortWithinPartitions(cluster_col)
    writer = out.write.partitionBy(MONTH_COL)
    if overwrite_partitions:
        writer = writer.option("partitionOverwriteMode", "dynamic").mode("overwrite")
    else:
        writer = writer.mode(mode)
    writer.parquet(path)


def table_exists_nonempty(spark: SparkSession, path: str) -> bool:
    """S6 (helpers:89-96): EXISTS(SELECT 1 ... LIMIT 1) analog.

    The probe is the read itself — a driver-local ``os.path.exists``
    would be False for EVERY distributed path (s3a://, hdfs://), making
    the caller treat populated remote tables as missing: ingest would
    re-load full history every run and schema evolution would
    destructively overwrite the sink. ``spark.read.parquet`` raising
    PATH_NOT_FOUND is the storage-agnostic "missing" signal."""
    try:
        return not spark.read.parquet(path).limit(1).isEmpty()
    except Exception:
        return False


def append_with_schema_evolution(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    key_cols: tuple[str, ...],
) -> None:
    """S13 (helpers:384-408): two-way column reconciliation, then append.

    * columns in the sink but not in ``df`` → added to ``df`` as 0
      (helpers:388-391);
    * columns in ``df`` but not in the sink → historic rows backfilled
      with 0, mirroring BQ schema-append + ``UPDATE ... SET c=0 WHERE c
      IS NULL`` (helpers:393-408). Plain parquet has no in-place UPDATE,
      so the table is rewritten once when the schema grows — the Delta
      deployment replaces this with mergeSchema + UPDATE.

    Count columns are whatever isn't a key column; they are always
    integer-typed zeros, per the reference's INTEGER schema fields.
    ``key_cols`` are the columns that may NEVER be reconciled by
    zero-fill: a key absent from either side is schema corruption, not
    evolution, and raises instead of silently materializing '0' keys.
    """
    if not table_exists_nonempty(spark, path):
        df.write.mode("overwrite").parquet(path)
        return

    existing = spark.read.parquet(path)
    missing_keys = [k for k in key_cols
                    if k not in df.columns or k not in existing.columns]
    if missing_keys:
        raise ValueError(
            f"key column(s) {missing_keys} absent from "
            f"{'input' if missing_keys[0] not in df.columns else 'sink'} — "
            f"refusing to zero-fill identity columns"
        )
    df_missing = [c for c in existing.columns if c not in df.columns]
    for c in df_missing:
        df = df.withColumn(c, F.lit(0).cast(dict(existing.dtypes)[c]))
    sink_missing = [c for c in df.columns if c not in existing.columns]

    if sink_missing:
        for c in sink_missing:
            existing = existing.withColumn(c, F.lit(0).cast(dict(df.dtypes)[c]))
        merged = existing.unionByName(df.select(existing.columns))
        # rewrite via a temp path: parquet can't append new columns in place
        tmp = path.rstrip("/") + ".__evolving__"
        merged.write.mode("overwrite").parquet(tmp)
        final = spark.read.parquet(tmp)
        final.write.mode("overwrite").parquet(path)
        _rm(tmp)
    else:
        df.select(existing.columns).write.mode("append").parquet(path)


def _rm(path: str) -> None:
    import shutil

    shutil.rmtree(path, ignore_errors=True)


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int,
    sort_col: str | None = None,
) -> None:
    """Bucketed (hash-clustered) managed table: the co-located-join
    layout.

    Two tables bucketed on their join key with the same bucket count join
    WITHOUT a shuffle — each task reads matching bucket files from both
    sides (verified by test_bucketed_join: no Exchange in the plan). This
    is the storage-level answer to a repeated big⋈big join at 100 TB:
    pay one bucketed write, then every subsequent join is narrow. BQ-side
    analog in the reference is clustering_fields (helpers:733).
    """
    writer = df.write.format("parquet").bucketBy(n_buckets, bucket_col)
    if sort_col is not None:
        writer = writer.sortBy(sort_col)
    writer.mode("overwrite").saveAsTable(table_name)


def zorder_value(cols: list, mins: list[int], maxs: list[int],
                 bits: int = 16):
    """Morton (Z-order) key for multi-column locality: min-max normalize
    each column to ``bits`` bits, then interleave the bits. Rows close in
    the Z-curve are close in EVERY dimension, so sorting files by this
    key gives parquet min/max pruning on ALL clustered columns at once —
    single-column clustering only prunes its leading column. Pure Column
    arithmetic (shift/mask), no UDF.

    Total interleaved width is capped at 63 bits: the top bit of a long
    is the SIGN bit, and ``len(cols) * bits > 63`` would shift set bits
    into it, making large coordinates sort NEGATIVE — z-order
    monotonicity silently broken, pruning silently gone. Per-column
    precision auto-shrinks to fit (e.g. 4 columns → 15 bits each).
    """
    n_cols = max(len(cols), 1)
    if n_cols * bits > 63:
        bits = 63 // n_cols
    scaled = []
    for c, lo, hi in zip(cols, mins, maxs):
        span = max(int(hi) - int(lo), 1)
        scaled.append(
            ((c.cast("long") - F.lit(int(lo))) * F.lit((1 << bits) - 1)
             / F.lit(span)).cast("long")
        )
    z = F.lit(0).cast("long")
    n = len(scaled)
    for i in range(bits):
        for j, s in enumerate(scaled):
            bit = F.shiftright(s, i).bitwiseAND(F.lit(1))
            z = z + F.shiftleft(bit, i * n + j)
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 8,
    bits: int = 16,
) -> None:
    """Z-order-clustered parquet write: range-partition + sort by the
    Morton key of ``cols`` so every output file covers a small rectangle
    of the multi-column space. One bounded stats action (global min/max
    per clustered column) computes the normalization; at 100 TB those
    stats come from table metadata instead. Point/range filters on ANY of
    the clustered columns then skip most files on footer min/max alone —
    measured in tests/test_bucketed.py: ~4× fewer candidate files than a
    single-column sort for the second column's point lookups."""
    stats = df.agg(*[F.min(c).alias(f"__lo{i}") for i, c in enumerate(cols)],
                   *[F.max(c).alias(f"__hi{i}") for i, c in enumerate(cols)]
                   ).first()
    mins = [stats[f"__lo{i}"] for i in range(len(cols))]
    maxs = [stats[f"__hi{i}"] for i in range(len(cols))]
    z = zorder_value([F.col(c) for c in cols], mins, maxs, bits)
    (df.withColumn("__z", z)
       .repartitionByRange(n_files, "__z")
       .sortWithinPartitions("__z")
       .drop("__z")
       .write.mode("overwrite").parquet(path))


def write_training_shards(
    df: DataFrame,
    path: str,
    shard_col: str,
    n_shards: int,
    mode: str = "overwrite",
) -> DataFrame:
    """Export a curated corpus as ``n_shards`` hash-sharded parquet files
    plus a verifiable manifest — the shape every training data loader
    consumes (fixed shard count, stable membership, no shard skew).

    Sharding is ``pmod(xxhash64(shard_col), n_shards)`` — a pure function
    of the row, so membership is stable across runs, retries, cluster
    sizes, and AQE re-planning (a ``repartition(n)`` round-robin would
    reshuffle membership every run and break resumable training).
    ``repartition`` on the shard id gives exactly one task per shard →
    one file per shard; at 100 TB raise ``n_shards`` until a shard fits
    an executor (the hash keeps them balanced within ~1/sqrt(rows/shard)).

    Returns the manifest as a DataFrame: per-shard row count and an
    order-insensitive xxhash64 checksum (sum of per-row hashes mod 2^63)
    a consumer can re-verify after download.

    ``mode`` must be ``"overwrite"``: the manifest is computed by
    re-reading the whole output path, so an append would fold earlier
    exports into the counts/checksums AND write a second file per shard
    directory, silently breaking both the manifest contract and the
    one-file-per-shard guarantee. Incremental export is a re-shard of
    the unioned corpus, not an append.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    if mode != "overwrite":
        raise ValueError(
            "write_training_shards only supports mode='overwrite': an "
            "append would corrupt the re-read manifest and violate the "
            f"one-file-per-shard contract (got mode={mode!r})"
        )
    shard = F.pmod(F.xxhash64(F.col(shard_col).cast("string")),
                   F.lit(n_shards)).cast("int")
    (
        df.withColumn("__shard", shard)
        .repartition(n_shards, "__shard")
        .write.mode(mode)
        .partitionBy("__shard")
        .parquet(path)
    )
    written = df.sparkSession.read.parquet(path)
    # Checksum accumulates in decimal(38,0): a long sum of xxhash64
    # values overflows (and ANSI mode rightly errors); 38 digits hold
    # 2^63 · rows for any realistic shard.
    # NULL children leave xxhash64's running state untouched, so ('x',
    # NULL) and (NULL, 'x') would hash identically — encode NULLs as an
    # explicit sentinel per column so column-position corruption is
    # detectable.
    row_hash = F.pmod(
        F.xxhash64(*[F.coalesce(F.col(c).cast("string"), F.lit("\x00null"))
                     for c in df.columns]),
        F.lit(2 ** 62),
    ).cast("decimal(38,0)")
    return (
        written.groupBy(F.col("__shard").cast("int").alias("shard"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.pmod(F.sum(row_hash), F.lit(2 ** 63 - 1).cast("decimal(38,0)"))
            .cast("long").alias("checksum"),
        )
        .orderBy("shard")
    )


def write_jsonl_shards(
    df: DataFrame,
    path: str,
    shard_col: str,
    n_shards: int,
) -> DataFrame:
    """Export a curated corpus as hash-sharded JSON-Lines — the other
    interchange format training loaders consume (one JSON object per
    line, fixed shard count, stable membership).

    Same deterministic sharding contract as ``write_training_shards``
    (``pmod(xxhash64(shard_col), n_shards)``; membership survives
    retries, cluster sizes, and AQE re-planning), but the payload is a
    single JSON-encoded text column written through the text sink, so
    any JSONL consumer can stream it without parquet tooling. The JSON
    encoding (``to_json`` of the row struct) happens JVM-side inside
    codegen — no Python in the path.

    Returns the manifest (shard, n_rows) re-read from the output.
    Overwrite-only, like the parquet shard sink and for the same
    reason: the manifest is computed from the written path.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    shard = F.pmod(F.xxhash64(F.col(shard_col).cast("string")),
                   F.lit(n_shards)).cast("int")
    (
        df.select(F.to_json(F.struct(*df.columns)).alias("value"),
                  shard.alias("__shard"))
        .repartition(n_shards, "__shard")
        .write.mode("overwrite")
        .partitionBy("__shard")
        .text(path)
    )
    return (
        df.sparkSession.read.text(path)   # partition discovery adds __shard
        .groupBy(F.col("__shard").cast("int").alias("shard"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy("shard")
    )
