"""Mergeable maintained-table builders: Bloom registers and per-bucket
extent tables.

The round-9 queries (`plans/round9_queries.py`) prove these merges
equal a full rebuild against DuckDB oracles; this module is the
OPERATOR surface so pipelines (and the streaming fold in
`streaming/maintenance.py`) build and merge the same tables the
queries check. At 100 TB both tables are persisted and appended per
ingest — registers are ~8 KB, extents ≤ #buckets rows — so
maintenance cost is one partial-agg scan of the DELTA plus a
fixed-size merge, never a base re-read.

Reference scope: beyond the reference surface (helpers:* has no
maintained-table tooling); Bloom (1970), the public Delta/Iceberg
file-statistics design for extents.
"""

from __future__ import annotations

import os
import shutil
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from building_permissions_etl_spark.functions.portable import portable_hash64

# Blocked-Bloom geometry shared with the round-9 query: 1024 words of
# 63 usable bits (DuckDB's BIGINT ``<<`` raises on a shift of 63 — the
# sign bit — so portable register parity uses positions 0..62 and a
# word never goes negative).
BLOOM_WORDS = 1024
BLOOM_BITS = 63

# Affine second-probe constants (k=2 without a second md5). ONE
# definition shared by the build (``bloom_registers``), the probe
# (``might_contain_registers``), and the DuckDB oracle twin
# (``plans/sketch_oracles.bloom_regs_sql``), so the three cannot
# drift: MOD keeps the product inside BIGINT under ANSI
# (≤ (2^30)·2654435761 ≈ 2.9e18), MUL is Knuth's 2654435761.
BLOOM_AFFINE_MOD = 2**30 - 35
BLOOM_AFFINE_MUL = 2654435761
BLOOM_AFFINE_ADD = 97


def bloom_registers(
    df: DataFrame,
    key_col: str,
    words: int = BLOOM_WORDS,
    bits: int = BLOOM_BITS,
) -> DataFrame:
    """(word_idx, bits): the blocked-Bloom register table of a key
    column — two probes per key (portable md5-prefix hash + an affine
    second probe, k=2 without a second md5). One partial-agg scan;
    output ≤ ``words`` rows regardless of input size.

    NULL keys are dropped before hashing — md5(NULL) probes are NULL
    and would emit a NULL word_idx register row that crashes
    ``registers_to_bits``; the probe side
    (``might_contain_registers``) already evaluates NULL keys as
    absent, so build and probe agree: a Bloom table answers
    membership of VALUES, and NULL is not a value."""
    keyed = df.filter(F.col(key_col).isNotNull()).select(
        portable_hash64(F.col(key_col).cast("string")).alias("h1"))
    probes = keyed.select(
        F.explode(F.array(
            F.col("h1"),
            F.expr(f"(h1 % {BLOOM_AFFINE_MOD}L) * {BLOOM_AFFINE_MUL}L "
                   f"+ {BLOOM_AFFINE_ADD}L"),
        )).alias("h"))
    return (
        probes.select(
            F.expr(f"CAST(h % {words} AS INT)").alias("word_idx"),
            F.expr(f"shiftleft(1L, CAST((h div {words}) % {bits} "
                   f"AS INT))").alias("bit"))
        .groupBy("word_idx")
        .agg(F.expr("bit_or(bit)").alias("bits"))
    )


def merge_bloom_registers(*tables: DataFrame) -> DataFrame:
    """OR-merge register tables: union + one ≤``words``-row groupBy.
    Associative and commutative, so partials fold in any batch order —
    the property the streaming maintainer relies on. Inputs must share
    the (word_idx, bits) column SET (checked) and fold by NAME — the
    same misalignment contract ``merge_extent_tables`` carries: a
    register table that arrives column-swapped would pass a positional
    union's count/type check (both columns are bigint-compatible) and
    silently OR word indexes into bit masks."""
    if not tables:
        raise ValueError("need at least one register table")
    for i, t in enumerate(tables):
        if set(t.columns) != {"word_idx", "bits"}:
            raise ValueError(
                f"register table {i} columns {sorted(t.columns)} != "
                "['bits', 'word_idx']")
    u = reduce(DataFrame.unionByName, tables)
    return u.groupBy("word_idx").agg(F.expr("bit_or(bits)").alias("bits"))


def registers_to_bits(registers: DataFrame,
                      words: int = BLOOM_WORDS) -> list[int]:
    """Collect a (maintained) register table into the dense
    ``list[int]`` word array the probe consumes. Bounded: ≤``words``
    rows regardless of how many keys ever fed the table; absent words
    are empty registers (no key hashed there)."""
    arr = [0] * words
    for r in registers.collect():
        arr[r["word_idx"]] = r["bits"]
    return arr


def might_contain_registers(key, bits_arr: list[int],
                            words: int = BLOOM_WORDS,
                            bits: int = BLOOM_BITS) -> "F.Column":
    """Probe predicate against a maintained register table (as
    returned by ``registers_to_bits``): True iff BOTH hash probes'
    bits are set. The literal word array appears once per probe (two
    ``element_at`` + compares inside codegen) — apply with
    ``df.filter`` before the exchange feeding the exact join, exactly
    like ``operators/bloom.py::bloom_might_contain``; the difference
    is only the hash scheme (portable md5-prefix + affine second
    probe, matching ``bloom_registers``' build so a table maintained
    across ingests keeps probing correctly)."""
    if len(bits_arr) != words:
        raise ValueError(f"bits_arr has {len(bits_arr)} words, expected "
                         f"{words} — pass registers_to_bits(..., words)")
    if words & (words - 1) != 0:
        # build uses exact `h div words`; the probe reproduces it as a
        # shift, which requires a power-of-two word count (float
        # division would silently lose bits past 2^53)
        raise ValueError(f"words must be a power of two, got {words}")
    shift = words.bit_length() - 1
    arr = F.lit([int(w) for w in bits_arr])
    h1 = portable_hash64(key.cast("string"))
    pred = None
    for h in (h1, (h1 % F.lit(BLOOM_AFFINE_MOD)) * F.lit(BLOOM_AFFINE_MUL)
              + F.lit(BLOOM_AFFINE_ADD)):
        word = h.bitwiseAND(F.lit(words - 1)).cast("int")
        bit = F.call_function(
            "shiftleft", F.lit(1).cast("bigint"),
            F.pmod(F.shiftright(h, shift), F.lit(bits)).cast("int"))
        p = F.element_at(arr, word + 1).bitwiseAND(bit) == bit
        pred = p if pred is None else pred & p
    return pred


def extent_table(
    df: DataFrame,
    bucket_col: str,
    value_cols: list[str],
) -> DataFrame:
    """(bucket, n, min_<c>, max_<c>...): per-bucket extent statistics —
    the file-footer-stats shape behind z-order data skipping. One
    partial-agg scan; output has one row per occupied bucket."""
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n")]
    for c in value_cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    return df.groupBy(F.col(bucket_col).alias("bucket")).agg(*aggs)


def merge_histograms(*tables: DataFrame) -> DataFrame:
    """Merge ``histogram_snapshot`` tables (operators/validation.py)
    built over the SAME [lo, hi)/n_bins domain contract: counts sum
    by bin — the third mergeable maintained table next to Bloom
    registers and extents. Output stays ≤ n_bins + 3 rows, so a
    100 TB table's drift monitor folds per-ingest partials instead of
    re-scanning the base. The domain contract is the CALLER's
    responsibility, exactly as for ``psi_drift``: histograms from
    different domains would merge syntactically and mean nothing."""
    if not tables:
        raise ValueError("need at least one histogram table")
    u = reduce(DataFrame.unionByName, tables)
    return u.groupBy("bin").agg(F.sum("cnt").cast("bigint").alias("cnt"))


def list_partition_files(layout_path: str, partition_col: str) -> dict:
    """{'<col>=<value>': [data files]} for a Hive-partitioned parquet
    layout — the driver-side directory inventory OPTIMIZE plans its
    rewrite set from. Hidden/metadata entries (``_SUCCESS``, ``.crc``)
    are excluded. Driver-side listing is bounded by partition
    CARDINALITY (≤64 for the z-file layout), never row count; a real
    warehouse reads the same inventory from its manifest/catalog
    instead of the filesystem."""
    out: dict[str, list[str]] = {}
    prefix = f"{partition_col}="
    for d in sorted(os.listdir(layout_path)):
        if not d.startswith(prefix):
            continue
        pdir = os.path.join(layout_path, d)
        if not os.path.isdir(pdir):
            continue
        out[d] = sorted(f for f in os.listdir(pdir)
                        if not f.startswith((".", "_")))
    return out


def compaction_read(spark, layout_path: str, partition_col: str,
                    values: list) -> DataFrame:
    """The scan side of ``compact_partitioned_layout``, factored out so
    plan/metrics pins can drive the EXACT frame the rewrite executes:
    the partitioned layout filtered to the touched partition values —
    the IN-list lands in PartitionFilters, so untouched directories
    are never opened — shuffled by the partition column so the
    partitioned write emits exactly one file per directory (each value
    lands in one task)."""
    return (spark.read.parquet(layout_path)
            .filter(F.col(partition_col).isin(list(values)))
            .repartition(partition_col))


def compact_partitioned_layout(spark, layout_path: str,
                               partition_col: str) -> dict:
    """OPTIMIZE bin-packing for a Hive-partitioned parquet layout: for
    every partition directory holding ≥2 data files (the steady state
    appends create), rewrite THAT PARTITION's rows into one file —
    never the whole table. Values are untouched (compaction moves
    bytes, not values), so extent/footer-stats tables built over the
    layout stay valid as-is and data skipping survives the rewrite.

    The rewrite scans ONLY the multi-file partitions (PartitionFilters
    IN-list via ``compaction_read``), writes compacted files to a
    staging root, then commits by swapping the touched directories'
    data files — the driver-side stand-in for a transaction-log/
    manifest commit (public Delta OPTIMIZE / Iceberg
    rewrite_data_files design). Single-file partitions' files are
    never read, rewritten, or moved. At 100 TB this is the layout
    lifecycle's third primitive next to ``extent_table`` (stats at
    write time) and ``merge_extent_tables`` (stats under append):
    appends fragment partitions, compaction restores
    one-file-per-range so scan cost returns to the candidate
    fraction. Returns a stats dict: partitions/files before and
    after, and the touched partition dir names."""
    inv = list_partition_files(layout_path, partition_col)
    # NULL-valued partitions are left as-is (documented limitation):
    # their value cannot ride an isin() rewrite filter, and a fragment
    # left unpacked is benign — the skipped count is surfaced in the
    # stats instead of being silently folded in.
    null_dir = f"{partition_col}=__HIVE_DEFAULT_PARTITION__"
    multi = {d: fs for d, fs in inv.items()
             if len(fs) > 1 and d != null_dir}
    stats = {
        "n_partitions": len(inv),
        "n_touched": len(multi),
        "n_skipped_null": int(len(inv.get(null_dir, [])) > 1),
        "files_before": sum(len(fs) for fs in inv.values()),
        "touched": sorted(multi),
    }
    if not multi:
        stats["files_after"] = stats["files_before"]
        return stats

    # dir name → column value, SCHEMA-driven (review r14): Spark
    # %-escapes special characters in partition dir names, so the raw
    # name must be unquoted, and guessing int-vs-string from the text
    # would round-trip 'p=01' on a string column to the int 1 — the
    # staging write would then emit a differently-named directory and
    # the commit loop would miss it. Parsing by the column's dtype
    # reproduces exactly the value Spark wrote the directory for, so
    # the staging dir names match the layout's byte-for-byte.
    from urllib.parse import unquote

    dt = dict(spark.read.parquet(layout_path).dtypes)[partition_col]
    int_types = {"tinyint", "smallint", "int", "bigint"}

    def _val(dirname: str):
        raw = unquote(dirname.split("=", 1)[1])
        return int(raw) if dt in int_types else raw

    staging = layout_path + ".compact-staging"
    try:
        (compaction_read(spark, layout_path, partition_col,
                         [_val(d) for d in multi])
         .write.mode("overwrite").partitionBy(partition_col)
         .parquet(staging))
        # pre-commit check BEFORE anything destructive: every touched
        # partition must exist in staging under its exact layout dir
        # name — a round-trip mismatch aborts cleanly here with the
        # layout untouched, never mid-swap.
        missing = [d for d in multi
                   if not os.path.isdir(os.path.join(staging, d))]
        if missing:
            raise ValueError(
                f"compaction staging is missing partition dirs "
                f"{missing} — partition-value round-trip failed; "
                "layout left untouched")
        # commit: per touched partition, drop the fragmented files and
        # move the compacted one in. os.replace is atomic per file;
        # the transactional all-or-nothing a warehouse gets from its
        # metadata commit is out of scope for a filesystem fixture.
        for d, old_files in multi.items():
            src = os.path.join(staging, d)
            new_files = sorted(f for f in os.listdir(src)
                               if not f.startswith((".", "_")))
            dst = os.path.join(layout_path, d)
            for f in old_files:
                os.remove(os.path.join(dst, f))
            for f in new_files:
                os.replace(os.path.join(src, f), os.path.join(dst, f))
    finally:
        shutil.rmtree(staging, ignore_errors=True)
    after = list_partition_files(layout_path, partition_col)
    stats["files_after"] = sum(len(fs) for fs in after.values())
    return stats


def merge_extent_tables(*tables: DataFrame) -> DataFrame:
    """Merge extent tables: n sums, mins min, maxes max — all five
    measures mergeable, so maintenance never re-reads the base
    partition. Column roles are derived from the naming convention
    ``extent_table`` emits. Inputs must share an identical column SET
    (checked) and are folded with ``unionByName`` — two extent tables
    built with the same value_cols in a different order would pass a
    positional union's count/type check and silently misalign
    (min_a folded with min_b), defeating merge-equals-rebuild."""
    if not tables:
        raise ValueError("need at least one extent table")
    cols0 = set(tables[0].columns)
    for i, t in enumerate(tables[1:], start=1):
        if set(t.columns) != cols0:
            raise ValueError(
                f"extent table {i} columns {sorted(t.columns)} != "
                f"table 0 columns {sorted(cols0)}")
    u = reduce(DataFrame.unionByName, tables)
    aggs = []
    for c in u.columns:
        if c == "bucket":
            continue
        if c == "n":
            aggs.append(F.sum("n").alias("n"))
        elif c.startswith("min_"):
            aggs.append(F.min(c).alias(c))
        elif c.startswith("max_"):
            aggs.append(F.max(c).alias(c))
        else:
            raise ValueError(f"unexpected extent column {c!r}")
    return u.groupBy("bucket").agg(*aggs)
