"""Approximate-nearest-neighbor similarity search over an embedding
column ``array<float>`` (M7).

Three paths:

  * ``topk_bruteforce`` — exact cosine top-k: one scan, a broadcast of
    the (tiny) query vector, and a global top-k (``orderBy + limit`` —
    Spark executes it as TakeOrderedAndProject: per-partition heaps, no
    full sort shuffle). The correctness baseline.
  * ``topk_lsh`` — random-hyperplane LSH: sign-bit signature of r
    hyperplanes buckets the vectors; only the query's bucket (plus
    neighboring buckets within hamming ≤ 1) is scanned. At 100 TB the
    hyperplanes are literals in the plan (seeded, reproducible) and the
    bucket id is a cheap partition/cluster key — the scan prunes to a
    ~2^-r fraction of the corpus.
  * ``topk_ivf`` — IVF (inverted-file) index: k-means coarse centroids
    trained on a bounded, deterministic sample (driver-side numpy,
    Lloyd iterations); every vector is assigned to its nearest centroid
    by an Arrow-batched pandas UDF (one numpy matmul per batch); a query
    probes only its ``n_probe`` nearest cells and exact-reranks inside
    them. At 100 TB the assignment is a one-off index build persisted as
    a partition/cluster column, and each query scans n_probe/n_cells of
    the corpus.

The first two are pure Column expressions (zip_with/aggregate) — no UDF;
IVF's assignment is the legitimate Pandas-UDF case (dense linear algebra).

Index lifecycle: ``build_ivf_index`` / ``build_lsh_index`` run the
expensive one-off work (centroid training + full-corpus assignment /
bucketing) and persist the result; ``query_ivf`` / ``query_lsh`` only
probe the persisted index — no training action, no UDF stage, no
full-corpus rescan per query (plan-asserted in tests/test_similarity.py).
``topk_ivf`` / ``topk_lsh`` remain as build+query conveniences for
one-shot use.
"""

from __future__ import annotations

import math
import os

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from building_permissions_etl_spark.functions.vectors import cosine, dot


def _hyperplanes(n_planes: int, dim: int, seed: int = 7) -> list[list[float]]:
    """Deterministic pseudo-gaussian hyperplanes via Box-Muller over an
    LCG — plan literals, identical across runs and engines."""
    x = seed

    def lcg() -> float:
        nonlocal x
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        return (x >> 11) / float(1 << 52)  # uniform in [0,1)

    planes = []
    for _ in range(n_planes):
        v = []
        while len(v) < dim:
            u1, u2 = max(lcg(), 1e-12), lcg()
            r = math.sqrt(-2.0 * math.log(u1))
            v.append(r * math.cos(2 * math.pi * u2))
            if len(v) < dim:
                v.append(r * math.sin(2 * math.pi * u2))
        planes.append(v)
    return planes


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit signature of ``vec`` against the hyperplanes → int bucket."""
    bucket = F.lit(0)
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(c)) for c in p])
        bit = F.when(dot(vec, plane) > 0, F.lit(1 << i)).otherwise(F.lit(0))
        bucket = bucket + bit
    return bucket.cast("int")


def topk_bruteforce(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query_id: int,
    k: int = 10,
    round_to: int = 6,
) -> DataFrame:
    """Exact cosine top-k against the embedding of ``query_id``.

    Scores are rounded before ranking so the (score desc, id asc) order is
    reproducible across engines; the query row itself is excluded.

    The query id is validated with one bounded action (same pattern as
    the index queries): a missing id previously returned an empty frame
    indistinguishable from "no neighbors", and a duplicated id would
    cross-join every candidate against BOTH query rows, halving the
    distinct results inside ``limit(k)``.
    """
    n_q = df.filter(F.col(id_col) == query_id).limit(2).count()
    if n_q == 0:
        raise ValueError(f"query_id {query_id!r} not found")
    if n_q > 1:
        raise ValueError(f"query_id {query_id!r} matches multiple rows")
    q = df.filter(F.col(id_col) == query_id).select(F.col(vec_col).alias("__qv"))
    return (
        df.crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != query_id)
        .select(
            F.col(id_col).alias("id"),
            F.round(cosine(F.col(vec_col), F.col("__qv")), round_to).alias("score"),
        )
        .orderBy(F.desc("score"), F.col("id"))
        .limit(k)
    )


def _train_centroids(
    df: DataFrame, vec_col: str, id_col: str,
    n_cells: int, sample_size: int, iters: int = 5,
):
    """Deterministic k-means on a bounded sample: lowest-id rows (stable
    across runs/partitionings), Lloyd iterations in numpy. Returns an
    (n_cells, dim) float32 ndarray. At 100 TB the sample collect is a
    fixed few MB — training cost does not scale with the corpus."""
    import numpy as np

    sample = (
        df.select(id_col, vec_col).orderBy(id_col).limit(sample_size).collect()
    )
    x = np.asarray([r[1] for r in sample], dtype=np.float32)
    # deterministic spread init: evenly spaced rows of the sorted sample
    idx = np.linspace(0, len(x) - 1, n_cells).astype(int)
    cents = x[idx].copy()
    for _ in range(iters):
        # cosine assignment: normalize then argmax dot
        cn = cents / np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)
        xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        assign = np.argmax(xn @ cn.T, axis=1)
        for c in range(n_cells):
            members = x[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    return cents


def ivf_assign(df: DataFrame, vec_col: str, centroids) -> DataFrame:
    """Index build: nearest-centroid cell id per vector via an
    Arrow-batched pandas UDF (one matmul per batch — the dense-algebra
    case where numpy beats interpreted Column HOFs)."""
    from pyspark.sql.functions import pandas_udf

    cn = centroids / np.maximum(
        np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12
    )

    dim = cn.shape[1]

    @pandas_udf("int")
    def cell_of(vecs: pd.Series) -> pd.Series:
        # a NULL embedding must not kill the build job (the LSH and
        # portable-IVF paths tolerate it); map it to the zero vector,
        # which lands in cell 0 like theirs
        zero = [0.0] * dim
        x = np.asarray([v if v is not None else zero for v in vecs],
                       dtype=np.float32)
        xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        return pd.Series(np.argmax(xn @ cn.T, axis=1).astype("int32"))

    from building_permissions_etl_spark.operators.scale import fan_out

    return fan_out(df).withColumn("__cell", cell_of(F.col(vec_col)))


class IvfIndex:
    """Handle to a built IVF index: the assigned+persisted corpus and the
    trained centroids. Build once, query many times."""

    def __init__(self, indexed: DataFrame, centroids, vec_col: str, id_col: str):
        self.indexed = indexed
        self.centroids = centroids
        self.vec_col = vec_col
        self.id_col = id_col

    def unpersist(self) -> None:
        self.indexed.unpersist()


def build_ivf_index(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    n_cells: int = 16,
    sample_size: int = 1024,
) -> IvfIndex:
    """One-off IVF index build: train centroids on the bounded sample,
    assign every vector to its cell (the single pandas-UDF pass), persist.
    At 100 TB the persisted form is a table partitioned/clustered by
    ``__cell``; here ``persist()`` stands in for that materialization."""
    centroids = _train_centroids(df, vec_col, id_col, n_cells, sample_size)
    indexed = ivf_assign(df, vec_col, centroids).persist()
    indexed.count()  # materialize now so queries never re-run the UDF
    return IvfIndex(indexed, centroids, vec_col, id_col)


def query_ivf(
    index: IvfIndex,
    query_id: int,
    k: int = 10,
    n_probe: int = 4,
    round_to: int = 6,
) -> DataFrame:
    """Probe-only IVF query: ``n_probe`` nearest cells of the PERSISTED
    index, exact cosine rerank inside them. No training, no UDF stage —
    the only driver action is the bounded lookup of the query row."""
    qrow = (
        index.indexed.filter(F.col(index.id_col) == query_id)
        .select(index.vec_col).first()
    )
    if qrow is None:
        raise ValueError(f"query_id {query_id!r} not found in the index")
    q = np.asarray(qrow[0], dtype=np.float32)
    cn = index.centroids / np.maximum(
        np.linalg.norm(index.centroids, axis=1, keepdims=True), 1e-12
    )
    qn = q / max(float(np.linalg.norm(q)), 1e-12)
    probe = np.argsort(-(cn @ qn))[:n_probe].tolist()

    qv = F.array(*[F.lit(float(v)) for v in q])
    return (
        index.indexed.filter(F.col("__cell").isin(probe))
        .filter(F.col(index.id_col) != query_id)
        .select(
            F.col(index.id_col).alias("id"),
            F.round(cosine(F.col(index.vec_col), qv), round_to).alias("score"),
        )
        .orderBy(F.desc("score"), F.col("id"))
        .limit(k)
    )


def topk_ivf(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query_id: int,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    sample_size: int = 1024,
    round_to: int = 6,
) -> DataFrame:
    """One-shot convenience: build + single query. Amortized use goes
    through ``build_ivf_index`` + ``query_ivf``. The transient index is
    unpersisted before returning — the handle would otherwise be
    unreachable and every one-shot call would leak a cached copy of the
    assigned corpus; the returned plan recomputes through intact lineage
    on its single collection."""
    index = build_ivf_index(df, vec_col, id_col, n_cells, sample_size)
    out = query_ivf(index, query_id, k, n_probe, round_to)
    index.indexed.unpersist()
    return out


# ---------------------------------------------------------------------------
# Portable IVF (verification variant) — same pattern as the sketch family's
# portable_hash64 twin: the production path above trains centroids (numpy
# float32, non-replicable in SQL); THIS path uses deterministic gaussian
# centroid literals (the same LCG+Box-Muller generator as the LSH planes)
# and assigns cells with pure double-precision Column expressions, so
# DuckDB replicates the whole pipeline bit-exactly
# (plans/sketch_oracles.ivf_topk_sql). Structure under test — cell
# assignment, top-n_probe cell pruning, exact rerank — is identical;
# only the training differs. Recall of the TRAINED variant stays pinned
# by tests/test_similarity.py.

PORTABLE_IVF_SEED = 11


def _lit_matrix(rows: list[list[float]]) -> Column:
    """array<array<double>> literal built from ONE parsed SQL expression.

    The per-element form (``F.array(*[F.lit(c) ...])`` per row) costs a
    py4j round-trip per scalar — ~1k calls for 16×64 centroids — and,
    worse, embedding each row inside its own ``cosine`` call produced a
    ~10k-node expression tree whose analysis/codegen dominated query
    CONSTRUCTION (measured 4.1 s per ``similarity_topk_ivf`` call at
    sf0.1, vs 0.24 s execution — guide §7.3's "driver is planning"
    signature). ``repr(float)`` round-trips exactly and Java's
    ``parseDouble`` is correctly rounded, so the parsed literals are
    bit-identical to ``F.lit(float(...))``."""
    body = ",".join(
        "array(" + ",".join(f"{float(v)!r}D" for v in r) + ")" for r in rows
    )
    return F.expr(f"array({body})")


def _centroid_scores(vec: Column, centroids: list[list[float]]) -> Column:
    """array<double> of cosine(vec, centroid_i) — plan-literal centroids.

    One ``transform`` over a 2-D literal: the cosine lambda appears ONCE
    in the tree instead of once per centroid, collapsing the expression
    from ~10k nodes to ~100 (same doubles, same per-element arithmetic,
    bit-identical scores — the DuckDB IVF oracle is unchanged)."""
    return F.transform(_lit_matrix(centroids), lambda c: cosine(vec, c))


def build_ivf_index_portable(
    df: DataFrame,
    vec_col: str,
    n_cells: int = 16,
    dim: int = 64,
    seed: int = PORTABLE_IVF_SEED,
) -> tuple[DataFrame, list[list[float]]]:
    """One-off portable-IVF index build: nearest-centroid cell per vector
    (argmax over the literal centroids, first index on ties), persisted.
    Returns (indexed df with ``__cell``, centroids)."""
    cents = _hyperplanes(n_cells, dim, seed)
    scores = _centroid_scores(F.col(vec_col), cents)
    indexed = df.withColumn(
        "__cell", (F.array_position(scores, F.array_max(scores)) - 1).cast("int")
    ).persist()
    indexed.count()  # materialize now so queries never re-assign the corpus
    return indexed, cents


def query_ivf_portable(
    indexed: DataFrame,
    centroids: list[list[float]],
    vec_col: str,
    id_col: str,
    query_id: int,
    k: int = 10,
    n_probe: int = 4,
    round_to: int = 6,
) -> DataFrame:
    """Probe-only query over a portable-IVF index: the query row's
    top-``n_probe`` cells (by centroid score desc, cell id asc — via a
    (-score, id) struct sort) are evaluated ON the query row with the
    exact same Column expression the index build used (bit-identical
    ordering, no Python float re-derivation) and collected once — a
    bounded driver action, same pattern as ``query_ivf``. Candidates are
    then selected with ``isin`` on the persisted ``__cell``: a
    partition-prunable IN-list, so at 100 TB a layout clustered by
    ``__cell`` scans only n_probe/n_cells of the corpus instead of
    evaluating ``array_contains`` against every row."""
    qs = _centroid_scores(F.col(vec_col), centroids)
    probe_expr = F.transform(
        F.slice(
            F.array_sort(F.transform(
                qs, lambda s, i: F.struct((-s).alias("ns"), i.alias("i"))
            )),
            1, n_probe,
        ),
        lambda x: x["i"],
    )
    qrow = (
        indexed.filter(F.col(id_col) == query_id)
        .select(F.col(vec_col), probe_expr.alias("__probe")).first()
    )
    if qrow is None:
        raise ValueError(f"query_id {query_id!r} not found in the index")
    probe = [int(c) for c in qrow[1]]
    qv = F.array(*[F.lit(float(v)) for v in qrow[0]])
    return (
        indexed.filter(F.col("__cell").isin(probe))
        .filter(F.col(id_col) != query_id)
        .select(
            F.col(id_col).alias("id"),
            F.round(cosine(F.col(vec_col), qv), round_to).alias("score"),
        )
        .orderBy(F.desc("score"), F.col("id"))
        .limit(k)
    )


def build_lsh_index(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 7,
) -> DataFrame:
    """One-off LSH index build: sign-bit bucket per vector from the
    deterministic hyperplane literals, persisted. At 100 TB ``__bucket``
    is the partition/cluster key of the materialized table, so a query
    scans ~2^-r of the corpus; ``persist()`` stands in for that here."""
    planes = _hyperplanes(n_planes, dim, seed)
    indexed = (
        df.withColumn("__bucket", lsh_bucket(F.col(vec_col), planes))
        # record the geometry ON the index: the probe enumeration at
        # query time must flip exactly the bits this build used, and a
        # caller-supplied plane count that disagrees would silently drop
        # candidate buckets
        .withColumn("__n_planes", F.lit(n_planes))
        .persist()
    )
    indexed.count()  # materialize now so queries never re-bucket the corpus
    return indexed


def write_lsh_index(
    df: DataFrame,
    vec_col: str,
    path: str,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 7,
) -> None:
    """Materialize the LSH index as a parquet table PARTITIONED BY
    ``__bucket`` — the 100 TB layout the in-memory ``build_lsh_index``
    stands in for. ``query_lsh`` over the read-back table prunes at
    PLANNING time: its driver-enumerated ``isin`` probe list lands in
    the scan's PartitionFilters, so only the ≤ C(n_planes, radius)
    probed bucket directories are listed and read — the other
    2^n_planes − probes buckets are never touched
    (tests/test_plan_shape.py asserts the PartitionFilters)."""
    planes = _hyperplanes(n_planes, dim, seed)
    (
        df.withColumn("__bucket", lsh_bucket(F.col(vec_col), planes))
        .withColumn("__n_planes", F.lit(n_planes))
        .write.mode("overwrite").partitionBy("__bucket").parquet(path)
    )


def read_lsh_index(spark, path: str) -> DataFrame:
    """Load a ``write_lsh_index`` table; drop-in for the in-memory index
    in ``query_lsh`` (the ``__n_planes`` geometry stamp rides along)."""
    return spark.read.parquet(path)


def write_ivf_index_portable(
    df: DataFrame,
    vec_col: str,
    path: str,
    n_cells: int = 16,
    dim: int = 64,
    seed: int = PORTABLE_IVF_SEED,
) -> list[list[float]]:
    """Materialize the portable-IVF index as a parquet table PARTITIONED
    BY ``__cell`` (the 100 TB layout). Returns the centroids — pass them
    with the read-back table to ``query_ivf_portable``, whose ``isin``
    cell probe then prunes to n_probe of n_cells partitions at planning
    time instead of scanning the corpus."""
    cents = _hyperplanes(n_cells, dim, seed)
    scores = _centroid_scores(F.col(vec_col), cents)
    (
        df.withColumn(
            "__cell",
            (F.array_position(scores, F.array_max(scores)) - 1).cast("int"),
        )
        .write.mode("overwrite").partitionBy("__cell").parquet(path)
    )
    return cents


def append_ivf_index_portable(
    df: DataFrame,
    vec_col: str,
    path: str,
    n_cells: int = 16,
    dim: int = 64,
    seed: int = PORTABLE_IVF_SEED,
) -> list[list[float]]:
    """INCREMENTAL index maintenance: assign only the NEW vectors to
    the same deterministic centroids and APPEND into the ``__cell``
    partition directories of an existing ``write_ivf_index_portable``
    table. Because cell assignment is per-vector (the centroids are
    deterministic literals, never retrained), append-then-query is
    byte-identical to rebuild-then-query — the maintenance-equals-
    rebuild property the round-9 extent/register tables prove for
    their merges, here bought structurally: no merge step at all, the
    partitioned layout IS the mergeable structure, and ingest cost is
    one scan of the delta. Returns the (identical) centroids.

    Real k-means IVF (trained centroids) loses this property — a
    retrain reassigns old vectors — which is exactly why the portable
    variant pins its centroids to seed-derived literals; production
    systems do the same between periodic re-trains."""
    cents = _hyperplanes(n_cells, dim, seed)
    scores = _centroid_scores(F.col(vec_col), cents)
    (
        df.withColumn(
            "__cell",
            (F.array_position(scores, F.array_max(scores)) - 1).cast("int"),
        )
        .write.mode("append").partitionBy("__cell").parquet(path)
    )
    return cents


def append_lsh_index(
    df: DataFrame,
    vec_col: str,
    path: str,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 7,
) -> None:
    """INCREMENTAL LSH index maintenance: bucket only the new vectors
    with the identical hyperplane literals and append into the
    ``__bucket`` partition directories — same structural
    append-equals-rebuild argument as ``append_ivf_index_portable``
    (sign-bit bucketing is per-vector; the geometry stamp rides along
    so a probe against mixed-geometry partitions still fails fast)."""
    planes = _hyperplanes(n_planes, dim, seed)
    (
        df.withColumn("__bucket", lsh_bucket(F.col(vec_col), planes))
        .withColumn("__n_planes", F.lit(n_planes))
        .write.mode("append").partitionBy("__bucket").parquet(path)
    )


def probe_buckets(bucket: int, n_planes: int, radius: int) -> list[int]:
    """All bucket ids within ``radius`` bit flips of ``bucket`` — the
    multi-probe set, enumerated driver-side (C(n_planes, ≤radius) ids,
    pure integer math). As an explicit id list the probe is a
    partition-prunable ``isin`` key set over a layout clustered by
    ``__bucket`` — unlike a ``bit_count(xor)`` predicate, which must be
    evaluated against every row of the corpus."""
    from itertools import combinations

    out = []
    for r in range(radius + 1):
        for bits in combinations(range(n_planes), r):
            b = bucket
            for i in bits:
                b ^= 1 << i
            out.append(b)
    return sorted(out)


def query_lsh(
    indexed: DataFrame,
    vec_col: str,
    id_col: str,
    query_id: int,
    k: int = 10,
    hamming_probe: int = 1,
    round_to: int = 6,
    n_planes: int | None = None,
) -> DataFrame:
    """Probe-only LSH query over a built index: the query row's bucket is
    looked up once (bounded driver action, same pattern as ``query_ivf``),
    the ≤ C(n_planes, hamming_probe) probe bucket ids are enumerated
    driver-side, and candidates are selected with ``isin`` on the
    persisted ``__bucket`` — a partition-prunable IN-list, so at 100 TB a
    layout clustered by ``__bucket`` scans only the probed buckets
    instead of evaluating a hamming predicate over every row. Exact
    cosine rerank of candidates only.

    The plane count comes from the index itself (``__n_planes``, stamped
    by ``build_lsh_index``) so the probe set always matches the build
    geometry; the ``n_planes`` parameter is only a fallback for indexes
    built before the stamp existed."""
    has_stamp = "__n_planes" in indexed.columns
    qcols = [F.col(vec_col), F.col("__bucket")]
    if has_stamp:
        qcols.append(F.col("__n_planes"))
    qrow = (
        indexed.filter(F.col(id_col) == query_id).select(*qcols).first()
    )
    if qrow is None:
        raise ValueError(f"query_id {query_id!r} not found in the index")
    if has_stamp:
        idx_planes = int(qrow[2])
        if n_planes is not None and n_planes != idx_planes:
            raise ValueError(
                f"n_planes={n_planes} disagrees with the index "
                f"(built with {idx_planes})"
            )
        n_planes = idx_planes
    elif n_planes is None:
        n_planes = 8
    probe = probe_buckets(int(qrow[1]), n_planes, hamming_probe)
    qv = F.array(*[F.lit(float(v)) for v in qrow[0]])
    return (
        indexed.filter(F.col("__bucket").isin(probe))
        .filter(F.col(id_col) != query_id)
        .select(
            F.col(id_col).alias("id"),
            F.round(cosine(F.col(vec_col), qv), round_to).alias("score"),
        )
        .orderBy(F.desc("score"), F.col("id"))
        .limit(k)
    )


def topk_lsh(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query_id: int,
    k: int = 10,
    n_planes: int = 8,
    dim: int = 64,
    hamming_probe: int = 1,
    round_to: int = 6,
) -> DataFrame:
    """One-shot convenience: bucket + single query without persisting.
    Amortized use (and the registry) goes through ``build_lsh_index`` +
    ``query_lsh``."""
    planes = _hyperplanes(n_planes, dim)
    with_bucket = df.withColumn("__bucket", lsh_bucket(F.col(vec_col), planes))
    return query_lsh(with_bucket, vec_col, id_col, query_id, k, hamming_probe,
                     round_to, n_planes=n_planes)


# ---------------------------------------------------------------------------
# int8 scalar quantization — the memory-bound scale path: a 64-dim float
# embedding is 256 bytes; symmetric per-vector int8 is 64 bytes + one
# float scale (4× less scan I/O, and integer dot products vectorize).
# At 100 TB the quantized column is written NEXT TO the float column at
# ingest; queries scan only the narrow column and re-rank the final
# candidates on floats if exactness matters.
# ---------------------------------------------------------------------------

def quantize_scale(vec: Column) -> Column:
    """Symmetric per-vector scale: max|x| / 127, floored at 1e-12 so the
    all-zero vector quantizes to zeros instead of NaN."""
    maxabs = F.array_max(F.transform(vec, lambda x: F.abs(x.cast("double"))))
    return F.greatest(maxabs, F.lit(1e-12)) / F.lit(127.0)


def quantize_int8(vec: Column, scale: Column) -> Column:
    """Round-half-up to integers in [-127, 127]. ``floor(x/s + 0.5)`` is
    used (not ``round``) because its IEEE evaluation is identical in
    every engine — half-even vs half-up ``round`` variants differ.

    ``scale`` must be a CHEAP column (a materialized projection column,
    not the inline ``quantize_scale`` subtree): it is referenced inside
    the per-element lambda, and higher-order functions are interpreted
    outside codegen subexpression elimination — an inline scale subtree
    would re-run its array_max for every element (O(d²) per row)."""
    return F.transform(
        vec, lambda x: F.floor(x.cast("double") / scale + F.lit(0.5)).cast("long")
    )


def topk_quantized(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query_id: int,
    k: int = 10,
    round_to: int = 6,
) -> DataFrame:
    """Approximate top-k by quantized dot product.

    score = scale_d * scale_q * Σ q_d[i]·q_q[i] — the integer Σ is exact
    (no float-association drift), so the ONLY approximation is the
    quantization itself, and the result is bit-reproducible across
    engines: the DuckDB oracle replays the identical pipeline.

    Same validation contract as ``topk_bruteforce``: unknown or
    duplicated query ids raise instead of returning a plausible frame.
    """
    n_q = df.filter(F.col(id_col) == query_id).limit(2).count()
    if n_q == 0:
        raise ValueError(f"query_id {query_id!r} not found")
    if n_q > 1:
        raise ValueError(f"query_id {query_id!r} matches multiple rows")

    def quantized(prefix: str, frame: DataFrame) -> DataFrame:
        # scale staged through a projection so the lambda reads a
        # materialized column (see quantize_int8's contract)
        staged = frame.select(
            F.col(id_col).alias(f"{prefix}_id"),
            quantize_scale(F.col(vec_col)).alias(f"{prefix}_scale"),
            F.col(vec_col).alias(f"{prefix}_v"),
        )
        return staged.select(
            f"{prefix}_id", f"{prefix}_scale",
            quantize_int8(F.col(f"{prefix}_v"),
                          F.col(f"{prefix}_scale")).alias(f"{prefix}_q"),
        )

    docs = quantized("d", df.filter(F.col(id_col) != query_id))
    q = quantized("q", df.filter(F.col(id_col) == query_id))
    int_dot = F.aggregate(
        F.zip_with(F.col("d_q"), F.col("q_q"), lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return (
        docs.crossJoin(F.broadcast(q))
        .select(
            F.col("d_id").alias("id"),
            F.round(F.col("d_scale") * F.col("q_scale")
                    * int_dot.cast("double"), round_to).alias("score"),
        )
        .orderBy(F.desc("score"), F.col("id"))
        .limit(k)
    )


def build_quantized_index(
    df: DataFrame, vec_col: str, id_col: str
) -> DataFrame:
    """One-off quantization pass: persist (id, scale, int8 vector). At
    100 TB this column pair is written NEXT TO the float embedding at
    ingest (4× less scan I/O); here it is computed once per session and
    cached, mirroring the LSH/IVF index lifecycle."""
    staged = df.select(
        F.col(id_col).alias("__qid"),
        quantize_scale(F.col(vec_col)).alias("__qscale"),
        F.col(vec_col).alias("__v"),
    )
    out = staged.select(
        "__qid", "__qscale",
        quantize_int8(F.col("__v"), F.col("__qscale")).alias("__qvec"),
    )
    out.persist()
    out.count()  # materialize so every query is probe-only
    return out


def query_quantized(
    index: DataFrame,
    query_id: int,
    k: int = 10,
    round_to: int = 6,
) -> DataFrame:
    """Top-k by quantized dot product against a persisted index — the
    scan reads only the narrow int8 column; no per-query re-quantization.
    Same id-validation contract as the other query paths."""
    qrows = index.filter(F.col("__qid") == query_id).limit(2).collect()
    if len(qrows) == 0:
        raise ValueError(f"query_id {query_id!r} not found")
    if len(qrows) > 1:
        raise ValueError(f"query_id {query_id!r} matches multiple rows")
    q_scale = float(qrows[0]["__qscale"])
    q_vec = F.array(*[F.lit(int(v)) for v in qrows[0]["__qvec"]])
    int_dot = F.aggregate(
        F.zip_with(F.col("__qvec"), q_vec, lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return (
        index.filter(F.col("__qid") != query_id)
        .select(
            F.col("__qid").alias("id"),
            F.round(F.col("__qscale") * F.lit(q_scale)
                    * int_dot.cast("double"), round_to).alias("score"),
        )
        .orderBy(F.desc("score"), F.col("id"))
        .limit(k)
    )


def topk_bruteforce_batch(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query_ids: list[int],
    k: int = 10,
    round_to: int = 6,
) -> DataFrame:
    """Exact cosine top-k for a BATCH of query ids in one corpus scan —
    the shape offline retrieval jobs want (M queries against 100 TB of
    embeddings must not scan the corpus M times).

    The M query vectors are fetched ONCE driver-side (a bounded
    pushed-`isin` read returning ≤ M rows — the same lookup any probe
    needs) and re-broadcast as a LITERAL frame, so the scoring plan
    contains exactly ONE scan of the corpus relation; missing-id
    validation rides that fetch for free instead of costing its own
    action. Each corpus row scores all M in place (M·dim fused
    multiply-adds inside one whole-stage-codegen pipeline), and a
    per-query window keeps rank ≤ k. Scores are rounded before ranking
    so the (query, score desc, id asc) order is reproducible across
    engines; self-matches are excluded. One corpus scan, one shuffle on
    query_id (M partitions of ≤ corpus rows each — for corpus-scale M
    switch to the LSH/IVF index paths instead).
    """
    if not query_ids:
        raise ValueError("query_ids must be non-empty")
    if len(set(query_ids)) != len(query_ids):
        raise ValueError("query_ids must be distinct")
    q_sel = df.filter(F.col(id_col).isin([int(q) for q in query_ids])).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    q_rows = q_sel.collect()    # bounded: ≤ len(query_ids) rows per id
    missing = {int(q) for q in query_ids} - {int(r["query_id"]) for r in q_rows}
    if missing:
        raise ValueError(
            f"{len(missing)} of the query_ids are missing from the corpus"
        )
    if len(q_rows) != len(query_ids):
        # set-difference can't see this case: a corpus with duplicate id
        # rows returns MORE rows than ids and would silently duplicate
        # every (query_id, id) result pair
        raise ValueError(
            f"corpus has duplicate rows for {len(q_rows) - len(query_ids)} "
            f"query id(s); {id_col} must be unique"
        )
    queries = df.sparkSession.createDataFrame(q_rows, schema=q_sel.schema)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.col("id").asc()
    )
    return (
        df.crossJoin(F.broadcast(queries))
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            F.col("query_id"),
            F.col(id_col).alias("id"),
            F.round(cosine(F.col(vec_col), F.col("__qv")), round_to).alias("score"),
        )
        .withColumn("__rnk", F.row_number().over(w))
        .filter(F.col("__rnk") <= k)
        .drop("__rnk")
        .orderBy("query_id", F.desc("score"), "id")
    )


# Seed frames at or under this row count are collected and inlined as
# plan literals (same fits-on-the-driver discipline as dedup.py's CC
# short-circuit: the probe collects at most cap+1 rows, and 0 disables
# the fast path entirely). SemDeDup-realistic seed counts (10^4-10^5)
# exceed the cap and keep the broadcast-join shape.
SEED_LITERAL_CAP = int(os.environ.get("SPARK_GRAFT_SEED_LITERAL_CAP", "256"))


def _seed_literal_rows(seeds, seed_id_col, seed_vec_col):
    """Collected, seed-id-sorted (id, vec) rows iff the seed frame fits
    under ``SEED_LITERAL_CAP`` and is literal-safe (non-null ids and
    vectors, no null elements, one common dimension), else None."""
    cap = SEED_LITERAL_CAP
    if cap <= 0:
        return None
    head = seeds.select(seed_id_col, seed_vec_col).limit(cap + 1).collect()
    if not head or len(head) > cap:
        return None
    dims = set()
    for r in head:
        if r[0] is None or r[1] is None or any(v is None for v in r[1]):
            return None
        dims.add(len(r[1]))
    if len(dims) != 1:
        return None
    return sorted(head, key=lambda r: r[0])


def assign_nearest_seed(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    seeds: DataFrame,
    seed_id_col: str = "seed_id",
    seed_vec_col: str = "sv",
    round_to: int = 6,
) -> DataFrame:
    """Nearest-centroid assignment (the Lloyd's-iteration E-step and the
    SemDeDup blocking step): every vector takes the argmin squared-L2
    distance against the seed set — rounded to ``round_to`` so the
    comparison key is engine-portable — with the seed id as a
    deterministic tiebreak. Returns the input columns plus
    (``seed_id_col``, ``dist2``). ``id_col`` is assumed unique (it is a
    vector id).

    Shape (round 14, guide §2.4 "remove shuffles outright"): when the
    seed frame fits under ``SEED_LITERAL_CAP`` it is collected (bounded
    probe, ≤ cap+1 rows) and inlined as a 2-D double literal, making
    the whole assignment ONE narrow projection — no join, no aggregate,
    no exchange. First-position-of-min over seed-id-ascending literal
    rows reproduces the join path's min_by (dist2, seed_id) tie-break
    exactly, and ``repr(float)``/``parseDouble`` round-trip keeps the
    literal seed values bit-identical to the column values, so the
    arithmetic (element-wise double subtract/multiply, left-fold sum,
    round) is unchanged. When every distance is NULL (null/mismatched
    corpus vector) both paths yield the lowest seed id with NULL dist2.

    Past the cap: one broadcast nested-loop against the O(k) seed
    frame, then a ``min_by`` aggregation keyed on the vector id whose
    partial pass collapses each vector's k scored rows to ONE inside
    the map task — the exchange moves N rows, not k·N. Round 6 shipped
    this as a ``row_number`` window, which shuffled the full k·N cross
    product. Per-iteration cost of k-means and the cluster-assignment
    pass of semantic dedup (Abbas et al. 2023, SemDeDup) at any corpus
    size; both shapes pinned in tests/test_plan_shape.py.
    """
    lit_rows = _seed_literal_rows(seeds, seed_id_col, seed_vec_col)
    if lit_rows is not None:
        from building_permissions_etl_spark.functions.expr import let

        sv_mat = _lit_matrix([list(r[1]) for r in lit_rows])
        sid_arr = F.array(*[F.lit(r[0]) for r in lit_rows])
        vec = F.col(vec_col)

        def d2(sv):
            diff2 = F.zip_with(
                vec, sv,
                lambda a, b: (a.cast("double") - b.cast("double"))
                * (a.cast("double") - b.cast("double")),
            )
            return F.round(
                F.aggregate(diff2, F.lit(0.0), lambda acc, x: acc + x),
                round_to)

        best = let(
            F.transform(sv_mat, d2),
            lambda d: let(
                F.array_min(d),
                lambda m: F.struct(
                    F.element_at(
                        sid_arr,
                        F.coalesce(F.array_position(d, m), F.lit(1))
                        .cast("int"),
                    ).alias("__sid"),
                    m.alias("__d2"),
                ),
            ),
        )
        return df.select(*df.columns, best.alias("__b")).select(
            *df.columns,
            F.col("__b").getField("__sid").alias(seed_id_col),
            F.col("__b").getField("__d2").alias("dist2"),
        )
    diff2 = F.zip_with(
        F.col(vec_col), F.col(seed_vec_col),
        lambda a, b: (a.cast("double") - b.cast("double"))
        * (a.cast("double") - b.cast("double")),
    )
    dist = F.round(F.aggregate(diff2, F.lit(0.0), lambda acc, x: acc + x),
                   round_to)
    carried = [c for c in df.columns if c != id_col] + [seed_id_col, "dist2"]
    best = (
        df.crossJoin(F.broadcast(seeds.select(seed_id_col, seed_vec_col)))
        .withColumn("dist2", dist)
        .groupBy(id_col)
        .agg(F.min_by(
            F.struct(*[F.col(c) for c in carried]),
            F.struct(F.col("dist2"), F.col(seed_id_col)),
        ).alias("__best"))
    )
    out_order = [*df.columns, seed_id_col, "dist2"]
    return best.select(
        *[F.col(id_col) if c == id_col else F.col(f"__best.{c}").alias(c)
          for c in out_order]
    )
