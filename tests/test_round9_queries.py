"""Round-9 queries: shard-merge CUSUM algebra, incremental Bloom
register maintenance, z-order extent maintenance.

The DuckDB oracles already prove end-to-end value parity at three
scales; these tests pin (a) the ALGEBRA — the per-shard composition
must equal the sequential recurrence for arbitrary inputs and
arbitrary shard splits, property-tested in pure Python where a
counterexample shrinks, (b) the PLAN SHAPE — no window in the
shard-merge query may scan a key's full history in one frame, and
(c) the MAINTENANCE CONTRACTS — merged Bloom registers are exactly
base|delta with no false negatives, merged extents equal a full
rebuild."""

from __future__ import annotations

import hashlib

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from building_permissions_etl_spark.plans.registry import oracle_sql, queries

SF_DIR = "/root/testdata/sf0.001"

Q = queries()


# ---- shard-merge CUSUM algebra (pure Python, hypothesis) -----------------

def _cusum_seq(ds):
    """Reference: the sequential recurrence S_i = max(0, S_{i-1}+d)."""
    s, mx = 0, 0
    for d in ds:
        s = max(0, s + d)
        mx = max(mx, s)
    return s, mx


def _shard_summary(ds):
    """(a, b, rmax, b0max) exactly as the Spark query derives them."""
    r, rmin, rmax, s0, b0max = 0, 0, None, 0, 0
    for d in ds:
        r += d
        rmin = min(rmin, r)
        rmax = r if rmax is None else max(rmax, r)
        s0 = r - min(0, rmin)
        b0max = max(b0max, s0)
    return {"a": r, "b": r - min(0, rmin),
            "rmax": rmax if rmax is not None else 0, "b0max": b0max}


def _merge_shards(summaries):
    """The window fold: S_after(t) = c_t + max_{i<=t}(b_i - c_i)."""
    c, mb, s_in, mx = 0, None, 0, 0
    s_after = 0
    for sm in summaries:
        c += sm["a"]
        mb = sm["b"] - c if mb is None else max(mb, sm["b"] - c)
        exc = max(sm["b0max"], s_in + sm["rmax"])
        mx = max(mx, exc)
        s_after = c + mb
        s_in = s_after
    return s_after, mx


@settings(max_examples=300, deadline=None)
@given(st.lists(st.integers(-50, 50), min_size=1, max_size=60),
       st.integers(1, 8))
def test_cusum_shard_merge_algebra(ds, n_shards):
    """For any integer series and any contiguous shard split, the
    shard-composition fold must reproduce the sequential CUSUM final
    state and max excursion exactly. Empty shards are legal (a month
    with no events for a type) and must be identity elements."""
    k = max(1, len(ds) // n_shards)
    shards = [ds[i:i + k] for i in range(0, len(ds), k)] or [[]]
    seq = _cusum_seq(ds)
    merged = _merge_shards([_shard_summary(s) for s in shards])
    assert merged == seq


def test_cusum_shard_summary_identity():
    """An empty shard's summary is the identity of the composition."""
    e = _shard_summary([])
    assert _merge_shards([e, _shard_summary([3, -1]), e]) \
        == _cusum_seq([3, -1])


# ---- plan shape: no full-history window --------------------------------

def test_cusum_shard_merge_windows_are_sharded(spark):
    """Every Window node must partition by event_type, and the only
    windows ordered by raw event time must ALSO partition by the month
    shard — the whole point of the query is that no task ever sorts or
    scans one key's full history (the single-pass form's ceiling)."""
    plan = (Q["cusum_shard_merge"](spark, SF_DIR)
            ._jdf.queryExecution().executedPlan().toString())
    win_lines = [ln for ln in plan.splitlines() if "Window [" in ln]
    assert win_lines, plan
    for ln in win_lines:
        assert "event_type" in ln, ln
        if "ts" in ln:          # raw-row window → must be per-shard
            assert "shard" in ln, ln


def test_cusum_shard_merge_matches_single_pass_spark(spark):
    """Engine-internal twin check: the shard-merge result equals a
    straightforward per-key single-pass computation done in Python on
    the collected quantized series (small at sf0.001)."""
    rows = Q["cusum_shard_merge"](spark, SF_DIR).collect()
    ev = (spark.read.parquet(f"{SF_DIR}/events.parquet")
          .select("event_type", "ts", "event_id",
                  F.expr("CAST(floor(value * 100) AS BIGINT)").alias("x"))
          .collect())
    by_type: dict[str, list] = {}
    for r in ev:
        by_type.setdefault(r.event_type, []).append(r)
    for out in rows:
        series = sorted(by_type[out.event_type],
                        key=lambda r: (r.ts, r.event_id))
        n = len(series)
        tot = sum(r.x for r in series)
        final, mx = _cusum_seq([r.x * n - tot for r in series])
        assert (out.n, out.final_state, out.max_excursion) \
            == (n, final, mx), out.event_type


# ---- Bloom register maintenance -----------------------------------------

def _py_portable_hash64(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_bloom_union_is_bitwise_or_and_has_no_false_negatives(spark):
    out = {r.word_idx: r for r in
           Q["bloom_incremental_union"](spark, SF_DIR).collect()}
    assert out, "no registers built"
    for r in out.values():
        assert r.merged_bits == r.base_bits | r.delta_bits
        assert r.merged_popcount == bin(r.merged_bits
                                        & ((1 << 64) - 1)).count("1")
        assert r.merged_bits >= 0  # bit 63 never set (DuckDB contract)
    # no false negatives: every customer key from EITHER side probes
    # positive against the merged registers on both hash probes
    keys = [r.o_custkey for r in
            spark.read.parquet(f"{SF_DIR}/orders.parquet")
            .select("o_custkey").distinct().collect()]
    for key in keys:
        h1 = _py_portable_hash64(str(key))
        for h in (h1, (h1 % (2**30 - 35)) * 2654435761 + 97):
            word = out.get(h % 1024)
            assert word is not None, key
            assert word.merged_bits & (1 << ((h // 1024) % 63)), key


# ---- incremental near-dup probe -----------------------------------------

def test_minhash_incremental_finds_corpus_twins_only(spark):
    """Operator-level contract: a batch doc identical to a corpus doc
    pairs with it at est 1.0; a batch doc with unique text pairs with
    nothing; corpus-internal duplicates do NOT appear (the corpus is
    never self-joined)."""
    from building_permissions_etl_spark.operators.dedup import (
        minhash_lsh_incremental,
    )

    t_dup = "the quick brown fox jumps over the lazy dog again and again"
    t_oth = "completely different content about shipping manifests and ports"
    corpus = spark.createDataFrame(
        [(1, t_dup), (2, t_oth), (3, t_oth)], ["doc_id", "text"])
    batch = spark.createDataFrame(
        [(10, t_dup), (11, "unique never seen text with many fresh words")],
        ["doc_id", "text"])
    rows = minhash_lsh_incremental(corpus, batch, "text", "doc_id").collect()
    assert [(r.batch_id, r.corpus_id, r.est_jaccard) for r in rows] \
        == [(10, 1, 1.0)]


# ---- z-order extent maintenance -----------------------------------------

def test_zorder_merge_equals_full_rebuild(spark):
    """Maintenance-equals-rebuild, engine-internally: merging base and
    delta extent tables must give byte-identical rows to the one-pass
    rollup the pruning query computes (restricted to shared columns)."""
    merged = {r.zbucket: (r.n, r.min_day, r.max_day, r.min_price,
                          r.max_price)
              for r in Q["zorder_extent_merge"](spark, SF_DIR).collect()}
    # full rebuild via the oracle-equivalent single pass in Spark
    import duckdb
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM "
                f"read_parquet('{SF_DIR}/orders.parquet')")
    full = {z: t for z, *t in (tuple(r) for r in con.sql(
        oracle_sql()["zorder_extent_merge"]).fetchall())}
    assert merged == {z: tuple(t) for z, t in full.items()}
