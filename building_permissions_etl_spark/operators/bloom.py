"""Explicit Bloom-filter semi-join reduction (register-blocked).

The 100 TB pattern: a selective dimension predicate should shrink the
FACT scan before the fact ever reaches an exchange. Spark's own runtime
row-group filtering (`spark.sql.optimizer.runtime.bloomFilter.enabled`)
injects exactly this plan when statistics justify it; building the
filter explicitly makes the reduction deterministic, testable, and
available when the dim side is an arbitrary DataFrame the optimizer
cannot see through (a subquery result, a checkpoint, a Python-built
frame).

This is the REGISTER-BLOCKED variant (one cache line — here one 64-bit
word — holds all k bits of a key), the layout production engines use
for runtime filters: ONE hash picks the word, a second hash packs all k
bit positions, so the probe is ONE `element_at` + ONE integer compare.
That matters twice at once: per-row probe work is O(1) instead of O(k),
and the literal bit array appears ONCE in the expression tree instead
of k times (k inlined 8 KiB literals measurably slow whole-stage
codegen compilation and every AQE re-plan — observed 3× on the
unblocked form).

Shape: the dim keys are aggregated with ONE small exchange
(`groupBy(word).agg(bit_or(mask))` — at most m/64 rows cross it,
regardless of dim cardinality), collected bounded (m/64 longs) and
re-broadcast as a literal array. The fact probe is pure JVM expression
work (`xxhash64` + `element_at` + bitwise AND) inside whole-stage
codegen — no join, no shuffle, no Python. False positives are removed
by the exact join that follows, so the reduction is semantically
transparent: result == plain join, which is what the DuckDB oracle
checks.

Sizing: with n keys in m bits, the block load is 64·n/m bits per word;
fpp ≈ (k_set_fraction)^k ≈ ((64n/m)/64)^k. The default m=65536, k=3
gives ~0.25% at n≈3k keys; callers at larger n pass a bigger m (the
literal array costs 8·m/64 bytes in the plan — 8 KiB at the default,
1 MiB at m=2^23, still trivially broadcastable).

Reference scope: the reference engine (helpers:*) has no semi-join
reduction surface; the technique is Bloom (1970), Putze/Sanders/Singler
(2007) blocked Bloom filters, and SPARK-32268 runtime filters.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_M_BITS = 1 << 16
DEFAULT_K = 3


def _word_and_mask(key: Column, n_words: int, k: int) -> tuple[Column, Column]:
    """The shared build/probe hash scheme: hash 0 selects the word,
    disjoint bytes of hash 1 select the k bit positions within it."""
    word = F.pmod(F.xxhash64(key, F.lit(0)), F.lit(n_words)).cast("int")
    h2 = F.xxhash64(key, F.lit(1))
    mask = F.lit(0).cast("bigint")
    for i in range(k):
        bitpos = F.shiftright(h2, 8 * i).bitwiseAND(F.lit(63)).cast("int")
        mask = mask.bitwiseOR(
            F.call_function("shiftleft", F.lit(1).cast("bigint"), bitpos))
    return word, mask


def build_bloom_bits(keys: DataFrame, key_col: str,
                     m_bits: int = DEFAULT_M_BITS,
                     k: int = DEFAULT_K) -> list[int]:
    """Aggregate the dim keys into an m_bits blocked-Bloom bit array.

    Returns the array as m_bits/64 Python ints (the bounded collect is
    m/64 rows max — 1024 at the default — independent of |keys|).
    """
    if m_bits % 64 != 0 or m_bits <= 0:
        raise ValueError(f"m_bits must be a positive multiple of 64, got {m_bits}")
    if not 0 < k <= 8:
        raise ValueError(f"k must be in 1..8 (bit positions come from "
                         f"disjoint bytes of one 64-bit hash), got {k}")
    n_words = m_bits // 64
    word, mask = _word_and_mask(F.col(key_col), n_words, k)
    rows = (
        keys.select(word.alias("word"), mask.alias("mask"))
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
        .collect()
    )
    arr = [0] * n_words
    for row in rows:
        arr[row["word"]] = row["bits"]
    return arr


def bloom_might_contain(key: Column, bits: list[int],
                        k: int = DEFAULT_K) -> Column:
    """Probe predicate: True iff the key's word contains all k bits.

    ONE element_at on a single literal-array occurrence + ONE compare —
    apply it with `.filter(...)` BEFORE the exchange feeding the exact
    join. `k` must match the build call, and so must the key's DATA
    TYPE: xxhash64 hashes the typed value, so probing an int column
    against a filter built from its string rendering (or a bigint dim
    key against an int fact key) sets different bits and silently
    filters EVERYTHING — cast both sides to one type first. The exact
    join downstream turns that bug into an empty result, not a wrong
    one, but empty-at-scale is expensive to debug; keep the types
    aligned.
    """
    if not 0 < k <= 8:
        raise ValueError(f"k must be in 1..8, got {k}")
    if not bits:
        raise ValueError("bits is empty — pass the array returned by "
                         "build_bloom_bits")
    n_words = len(bits)
    arr = F.lit([int(w) for w in bits])
    word, mask = _word_and_mask(key, n_words, k)
    return F.element_at(arr, word + 1).bitwiseAND(mask) == mask
