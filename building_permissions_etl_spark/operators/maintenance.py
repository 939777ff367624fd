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
