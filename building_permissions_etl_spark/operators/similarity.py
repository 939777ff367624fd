"""Approximate-nearest-neighbor similarity search over an embedding
column ``array<float>`` (M7).

Two paths:

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

Both are pure Column expressions (zip_with/aggregate) — no UDF.
"""

from __future__ import annotations

import math

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
