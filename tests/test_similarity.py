"""Semantic tests for similarity search: brute-force correctness and LSH
recall against the brute-force baseline."""

from __future__ import annotations

from pyspark.sql import functions as F

from building_permissions_etl_spark.operators.similarity import (
    topk_bruteforce,
    topk_lsh,
)
from building_permissions_etl_spark.catalog import load_table

SF = "/root/testdata/sf0.001"


def test_bruteforce_topk_matches_numpy(spark):
    import numpy as np

    emb = load_table(spark, "embeddings", SF)
    rows = emb.select("vec_id", "embedding").collect()
    vecs = {r.vec_id: np.array(r.embedding, dtype="float64") for r in rows}
    q = vecs[0]
    scores = {
        i: float(v @ q / (np.linalg.norm(v) * np.linalg.norm(q)))
        for i, v in vecs.items() if i != 0
    }
    expected = sorted(scores, key=lambda i: (-round(scores[i], 6), i))[:10]

    got = [r.id for r in topk_bruteforce(emb, "embedding", "vec_id", 0, k=10).collect()]
    assert got == expected


def test_lsh_recall_vs_bruteforce(spark):
    """Multi-probe LSH top-10 should recover most of the exact top-10."""
    emb = load_table(spark, "embeddings", SF)
    exact = {r.id for r in topk_bruteforce(emb, "embedding", "vec_id", 0, k=10).collect()}
    approx = {r.id for r in topk_lsh(emb, "embedding", "vec_id", 0, k=10,
                                     n_planes=8, hamming_probe=2).collect()}
    assert len(exact & approx) >= 5          # ≥50% recall with 2-probe


def test_lsh_prunes_candidates(spark):
    """The LSH path must scan fewer candidates than the corpus."""
    emb = load_table(spark, "embeddings", SF)
    n = emb.count()
    from building_permissions_etl_spark.operators.similarity import (
        _hyperplanes,
        lsh_bucket,
    )

    planes = _hyperplanes(8, 64)
    with_bucket = emb.withColumn("b", lsh_bucket(F.col("embedding"), planes))
    qb = with_bucket.filter(F.col("vec_id") == 0).select("b").first().b
    cand = with_bucket.filter(
        F.bit_count(F.col("b").bitwiseXOR(F.lit(qb)).cast("long")) <= 2
    ).count()
    assert cand < n * 0.6


def test_topk_ivf_recall_and_pruning(spark):
    from building_permissions_etl_spark.operators import similarity as S
    from building_permissions_etl_spark.catalog import load_table
    from pyspark.sql import functions as F

    emb = load_table(spark, "embeddings", "/root/testdata/sf0.01")
    exact = {r["id"] for r in S.topk_bruteforce(emb, "embedding", "vec_id", 0, k=10).collect()}
    got_rows = S.topk_ivf(emb, "embedding", "vec_id", 0, k=10, n_cells=16, n_probe=4).collect()
    got = {r["id"] for r in got_rows}
    assert len(got_rows) == 10
    # multi-probe over a quarter of the cells should keep decent recall
    assert len(got & exact) >= 5
    # and must actually prune: probed cells hold < the full corpus
    cents = S._train_centroids(emb, "embedding", "vec_id", 16, 1024)
    idx = S.ivf_assign(emb, "embedding", cents)
    probed = idx.groupBy("__cell").count().orderBy(F.desc("count")).limit(4)
    assert probed.agg(F.sum("count")).first()[0] < emb.count()


def test_topk_ivf_deterministic(spark):
    from building_permissions_etl_spark.operators import similarity as S
    from building_permissions_etl_spark.catalog import load_table

    emb = load_table(spark, "embeddings", "/root/testdata/sf0.001")
    a = [tuple(r) for r in S.topk_ivf(emb, "embedding", "vec_id", 0, k=5).collect()]
    b = [tuple(r) for r in S.topk_ivf(emb, "embedding", "vec_id", 0, k=5).collect()]
    assert a == b


def test_ivf_query_path_has_no_udf_stage(spark):
    """After build_ivf_index, the query plan must read the persisted
    index (InMemoryTableScan) and contain NO Python-UDF stage — the
    assignment UDF runs only at build time."""
    from building_permissions_etl_spark.operators import similarity as S

    emb = load_table(spark, "embeddings", SF)
    idx = S.build_ivf_index(emb, "embedding", "vec_id", n_cells=8, sample_size=256)
    try:
        q = S.query_ivf(idx, query_id=0, k=5, n_probe=2)
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "InMemoryTableScan" in plan
        # the LIVE plan (everything above the cached relation) must have
        # no Python-UDF stage; the EvalPython inside InMemoryRelation is
        # just the cached lineage printout, already materialized at build
        live = plan.split("InMemoryRelation")[0]
        assert "EvalPython" not in live          # Batch/ArrowEvalPython
        assert len(q.collect()) == 5
        # second query reuses the same persisted index: still no UDF
        q2 = S.query_ivf(idx, query_id=1, k=5, n_probe=2)
        live2 = (q2._jdf.queryExecution().executedPlan().toString()
                 .split("InMemoryRelation")[0])
        assert "EvalPython" not in live2
    finally:
        idx.unpersist()


def test_portable_ivf_prunes_and_recalls(spark):
    """The portable (verification) IVF twin must share the trained path's
    structure: probe ≤ n_probe/n_cells of the corpus, decent recall, and
    a probe-only plan over the persisted index (no re-assignment)."""
    from building_permissions_etl_spark.operators import similarity as S

    emb = load_table(spark, "embeddings", "/root/testdata/sf0.01")
    idx, cents = S.build_ivf_index_portable(emb, "embedding", n_cells=16, dim=64)
    try:
        got_rows = S.query_ivf_portable(
            idx, cents, "embedding", "vec_id", 0, k=10, n_probe=4
        ).collect()
        assert len(got_rows) == 10
        exact = {r.id for r in topk_bruteforce(
            emb, "embedding", "vec_id", 0, k=10).collect()}
        assert len({r.id for r in got_rows} & exact) >= 4
        # probed cells hold less than the corpus (the pruning is real)
        q = S.query_ivf_portable(idx, cents, "embedding", "vec_id", 0,
                                 k=10**6, n_probe=4)
        assert q.count() < emb.count() * 0.5
        # probe-only: the live plan reads the cached index, no re-assign
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "InMemoryTableScan" in plan
    finally:
        idx.unpersist()


def test_lsh_query_path_reads_persisted_buckets(spark):
    """query_lsh over a built index must not recompute buckets: the plan
    reads the cached __bucket column instead of re-deriving it."""
    from building_permissions_etl_spark.operators import similarity as S

    emb = load_table(spark, "embeddings", SF)
    idx = S.build_lsh_index(emb, "embedding", "vec_id", n_planes=8, dim=64)
    try:
        q = S.query_lsh(idx, "embedding", "vec_id", query_id=0, k=5, hamming_probe=2)
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "InMemoryTableScan" in plan
        assert len(q.collect()) == 5
    finally:
        idx.unpersist()


def test_probe_filters_are_in_lists(spark):
    """The candidate filter of both probe paths must be an IN-list on the
    persisted bucket/cell column — a partition-prunable key set over a
    layout clustered by that column at 100 TB — not a computed predicate
    (bit_count(xor) / array_contains) that has to be evaluated against
    every row of the corpus."""
    from building_permissions_etl_spark.operators import similarity as S

    emb = load_table(spark, "embeddings", SF)
    idx = S.build_lsh_index(emb, "embedding", "vec_id", n_planes=8, dim=64)
    try:
        q = S.query_lsh(idx, "embedding", "vec_id", query_id=0, k=5,
                        hamming_probe=2)
        live = (q._jdf.queryExecution().executedPlan().toString()
                .split("InMemoryRelation")[0])
        assert "bit_count" not in live
        assert "__bucket" in live and ("INSET" in live or " IN (" in live)
        assert len(q.collect()) == 5
    finally:
        idx.unpersist()

    pidx, cents = S.build_ivf_index_portable(emb, "embedding", n_cells=16, dim=64)
    try:
        q = S.query_ivf_portable(pidx, cents, "embedding", "vec_id", 0,
                                 k=5, n_probe=4)
        live = (q._jdf.queryExecution().executedPlan().toString()
                .split("InMemoryRelation")[0])
        assert "array_contains" not in live
        assert "__cell" in live and ("INSET" in live or " IN (" in live)
        assert len(q.collect()) == 5
    finally:
        pidx.unpersist()


def test_probe_buckets_enumeration():
    """probe_buckets must enumerate exactly the ids within the hamming
    radius: C(8,0)+C(8,1)+C(8,2) = 37 for radius 2, all within distance."""
    from building_permissions_etl_spark.operators.similarity import probe_buckets

    qb = 0b10110010
    got = probe_buckets(qb, 8, 2)
    assert len(got) == len(set(got)) == 1 + 8 + 28
    assert all(bin(b ^ qb).count("1") <= 2 for b in got)
    assert qb in got
    assert probe_buckets(qb, 8, 0) == [qb]


def test_stratified_sample_deterministic_and_proportional(spark):
    from building_permissions_etl_spark.plans.registry import queries

    q = queries()["stratified_sample_by_lang"]
    a = [tuple(r) for r in q(spark, "/root/testdata/sf0.01").collect()]
    b = [tuple(r) for r in q(spark, "/root/testdata/sf0.01").collect()]
    assert a == b and len(a) > 0
    from building_permissions_etl_spark.catalog import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, "documents", "/root/testdata/sf0.01")
    totals = {r["lang"]: r["count"] for r in docs.groupBy("lang").count().collect()}
    got = {}
    for _, lang in a:
        got[lang] = got.get(lang, 0) + 1
    # en sampled at 0.5 must keep a much larger share than zh at 0.1
    assert got.get("en", 0) / totals["en"] > 0.3
    assert got.get("zh", 0) / totals["zh"] < 0.3


def test_query_lsh_probe_set_follows_index_geometry(spark):
    """A 16-plane index queried without an explicit n_planes must flip
    all 16 bits when probing (the stamped geometry), not a default 8 —
    and a conflicting caller-supplied count must raise, not silently
    drop candidate buckets."""
    import pytest as _pytest

    from building_permissions_etl_spark.operators import similarity as S

    emb = load_table(spark, "embeddings", SF)
    idx = S.build_lsh_index(emb, "embedding", "vec_id", n_planes=16, dim=64)
    try:
        got = S.query_lsh(idx, "embedding", "vec_id", query_id=0, k=5,
                          hamming_probe=1)
        # the probe set must be C(16,1)+1 = 17 buckets wide; with only 8
        # planes probed the filter would enumerate 9. Read the IN-list
        # length straight from the plan.
        plan = got._jdf.queryExecution().optimizedPlan().toString()
        import re
        in_lists = re.findall(r"__bucket#\d+L? INSET ([0-9, ]+)", plan)
        assert in_lists, plan
        assert max(len(lst.split(",")) for lst in in_lists) == 17
        with _pytest.raises(ValueError, match="disagrees"):
            S.query_lsh(idx, "embedding", "vec_id", query_id=0, n_planes=8)
        with _pytest.raises(ValueError, match="not found"):
            S.query_lsh(idx, "embedding", "vec_id", query_id=10**9)
    finally:
        idx.unpersist()


def test_cosine_zero_vector_never_ranks_top(spark):
    """IEEE 0/0 = NaN sorts ABOVE every finite double in Spark — a
    zero embedding must score ~0, not occupy rank 1 of every top-k."""
    from building_permissions_etl_spark.operators.similarity import (
        topk_bruteforce,
    )

    rows = [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = [(r.id, r.score) for r in
           topk_bruteforce(df, "embedding", "vec_id", 0, k=2).collect()]
    assert got[0][0] == 1            # the real neighbor ranks first
    assert got[1] == (2, 0.0)        # zero vector scores 0, not NaN


def test_topk_bruteforce_validates_query_id(spark):
    import pytest as _pytest

    from building_permissions_etl_spark.operators.similarity import (
        topk_bruteforce,
    )

    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (0, [0.0, 1.0]), (1, [1.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    with _pytest.raises(ValueError, match="not found"):
        topk_bruteforce(df, "embedding", "vec_id", 99)
    with _pytest.raises(ValueError, match="multiple"):
        topk_bruteforce(df, "embedding", "vec_id", 0)


def test_ivf_build_tolerates_null_embeddings(spark):
    from building_permissions_etl_spark.operators.similarity import (
        build_ivf_index,
        query_ivf,
    )

    rows = [(i, [float(i % 5), float((i * 3) % 7)]) for i in range(40)]
    rows.append((99, None))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    idx = build_ivf_index(df, "embedding", "vec_id", n_cells=4, sample_size=32)
    try:
        got = query_ivf(idx, query_id=1, k=3)
        assert got.count() == 3
    finally:
        idx.indexed.unpersist()


def test_topk_ivf_oneshot_does_not_leak_cache(spark):
    from building_permissions_etl_spark.catalog import load_table
    from building_permissions_etl_spark.operators.similarity import topk_ivf

    emb = load_table(spark, "embeddings", SF)
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    topk_ivf(emb, "embedding", "vec_id", 0, k=5).collect()
    assert jsc.getPersistentRDDs().size() - before == 0
