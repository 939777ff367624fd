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
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

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
    """
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

    @pandas_udf("int")
    def cell_of(vecs: pd.Series) -> pd.Series:
        x = np.asarray(list(vecs), dtype=np.float32)
        xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        return pd.Series(np.argmax(xn @ cn.T, axis=1).astype("int32"))

    from building_permissions_etl_spark.operators.scale import fan_out

    return fan_out(df).withColumn("__cell", cell_of(F.col(vec_col)))


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
    """Approximate top-k via IVF: probe the query's ``n_probe`` nearest
    cells, exact cosine rerank inside them only."""
    centroids = _train_centroids(df, vec_col, id_col, n_cells, sample_size)
    indexed = ivf_assign(df, vec_col, centroids)

    qrow = df.filter(F.col(id_col) == query_id).select(vec_col).first()
    q = np.asarray(qrow[0], dtype=np.float32)
    cn = centroids / np.maximum(np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12)
    qn = q / max(float(np.linalg.norm(q)), 1e-12)
    probe = np.argsort(-(cn @ qn))[:n_probe].tolist()

    qv = F.array(*[F.lit(float(v)) for v in q])
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
    """Approximate top-k: candidates from the query's LSH bucket and all
    buckets within ``hamming_probe`` bit flips (multi-probe), then exact
    cosine rerank of the candidates only.
    """
    planes = _hyperplanes(n_planes, dim)
    with_bucket = df.withColumn("__bucket", lsh_bucket(F.col(vec_col), planes))
    q = with_bucket.filter(F.col(id_col) == query_id).select(
        F.col(vec_col).alias("__qv"), F.col("__bucket").alias("__qb")
    )
    cand = with_bucket.crossJoin(F.broadcast(q)).filter(F.col(id_col) != query_id)
    if hamming_probe > 0:
        cand = cand.filter(
            F.bit_count(F.col("__bucket").bitwiseXOR(F.col("__qb")).cast("long"))
            <= hamming_probe
        )
    else:
        cand = cand.filter(F.col("__bucket") == F.col("__qb"))
    return (
        cand.select(
            F.col(id_col).alias("id"),
            F.round(cosine(F.col(vec_col), F.col("__qv")), round_to).alias("score"),
        )
        .orderBy(F.desc("score"), F.col("id"))
        .limit(k)
    )
