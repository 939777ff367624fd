"""Registry contributions: training-data curation — deterministic
splits, mixture resampling, Gopher-rule filtering, and int8-quantized
similarity.

Everything here is hash- or arithmetic-deterministic (no RNG), so each
query is value-checked end-to-end by a DuckDB oracle that replays the
identical pipeline:

  * splits/mixing reuse ``portable_hash64`` (md5-prefix — bit-identical
    in DuckDB), the same cross-engine device as the sketch family;
  * int8 quantization uses ``floor(x/s + 0.5)`` (never ``round``, whose
    half-tie behavior differs between engines) and an exact integer dot
    product, so scores are bit-reproducible.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from building_permissions_etl_spark.catalog import load_table
from building_permissions_etl_spark.functions.portable import PORTABLE_HASH_SQL
from building_permissions_etl_spark.operators import corpus as C
from building_permissions_etl_spark.operators import similarity as S
from building_permissions_etl_spark.operators import textstats as T

# coalesce mirrors assign_split/resample_to_mix: NULL ids hash '' so no
# row can fall out of every split bucket.
_BUCKET_SQL = (PORTABLE_HASH_SQL.format(
    x="COALESCE(CAST(doc_id AS VARCHAR), '')") + " % 10000")

_TOKS = "list_filter(string_split_regex(lower(text), '\\s+'), t -> t != '')"

_MIX_WEIGHTS = {"src0": 0.3, "src1": 0.3, "src2": 0.2, "src3": 0.2}

# Session-scoped quantized-index cache (same lifecycle as extensions.py's
# _ANN_CACHE: expensive build once per (session, sf), probe-only after).
_QUANT_CACHE: dict = {}


def contribute(register) -> None:
    # ---- deterministic train/val/test split ---------------------------
    # Registered as the per-(split, lang) census so the oracle checks the
    # exact member assignment, not just marginal totals.
    def split_census(spark, sf):
        docs = load_table(spark, "documents", sf)
        return (
            C.assign_split(docs, "doc_id")
            .groupBy("split", "lang")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_chars").alias("sum_chars"))
            .orderBy("split", "lang")
        )

    register(
        "train_split_census",
        split_census,
        f"""
        SELECT CASE WHEN {_BUCKET_SQL} < 9800 THEN 'train'
                    WHEN {_BUCKET_SQL} < 9900 THEN 'val'
                    ELSE 'test' END AS split,
               lang, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS sum_chars
        FROM documents GROUP BY 1, 2 ORDER BY 1, 2
        """,
    )

    # ---- mixture resampling to target source weights ------------------
    def mixture_resample(spark, sf):
        docs = load_table(spark, "documents", sf)
        kept = C.resample_to_mix(docs, "source", "doc_id", _MIX_WEIGHTS)
        return (
            kept.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_kept"))
            .orderBy("source")
        )

    _w_case = "".join(
        f"WHEN '{g}' THEN {w} " for g, w in sorted(_MIX_WEIGHTS.items())
    )
    _in = ", ".join(f"'{g}'" for g in sorted(_MIX_WEIGHTS))
    register(
        "mixture_resample_counts",
        mixture_resample,
        f"""
        WITH in_scope AS (
          SELECT *, (CASE source {_w_case}END) AS w FROM documents
          WHERE source IN ({_in})
        ), counts AS (
          SELECT source, w, CAST(count(*) AS DOUBLE) AS n
          FROM in_scope GROUP BY 1, 2
        ), feasible AS (
          SELECT min(n / w) AS t FROM counts
        ), thr AS (
          SELECT source,
                 least(10000.0,
                       CAST(floor(10000.0 * w * t / n) AS DOUBLE)) AS thr
          FROM counts, feasible
        )
        SELECT d.source, CAST(count(*) AS BIGINT) AS n_kept
        FROM in_scope d JOIN thr ON d.source = thr.source
        WHERE CAST({_BUCKET_SQL} AS DOUBLE) < thr
        GROUP BY 1 ORDER BY 1
        """,
    )

    # ---- Gopher-rule quality filter -----------------------------------
    def gopher(spark, sf):
        docs = load_table(spark, "documents", sf)
        return T.gopher_rules(docs, "text", "doc_id").orderBy("doc_id")

    register(
        "gopher_rule_filter",
        gopher,
        f"""
        SELECT doc_id, word_count, mean_word_len, stop_hits,
               (word_count BETWEEN 30 AND 90) AS rule_words,
               (mean_word_len BETWEEN 3.5 AND 5.0) AS rule_word_len,
               (stop_hits >= 2) AS rule_stopwords,
               ((word_count BETWEEN 30 AND 90)
                AND (mean_word_len BETWEEN 3.5 AND 5.0)
                AND (stop_hits >= 2)) AS keep
        FROM (
          SELECT doc_id,
                 CAST(len(t) AS INT) AS word_count,
                 round(list_sum(list_transform(t, x -> CAST(len(x) AS DOUBLE)))
                       / greatest(len(t), 1), 4) AS mean_word_len,
                 CAST(len(list_filter(t, x -> x IN ('a', 'the'))) AS INT)
                   AS stop_hits
          FROM (SELECT doc_id, {_TOKS} AS t FROM documents)
        ) ORDER BY doc_id
        """,
    )

    # ---- int8-quantized similarity top-k ------------------------------
    # Build/query split like the LSH/IVF paths: the quantization pass
    # runs once per (session, sf) and persists; the registered query is
    # probe-only over the narrow int8 index. topk_quantized (one-shot)
    # stays pinned by tests/test_training.py.
    def _quant_index(spark, sf):
        key = ("quant", spark.sparkContext.applicationId, sf)
        if key not in _QUANT_CACHE:
            _QUANT_CACHE[key] = S.build_quantized_index(
                load_table(spark, "embeddings", sf), "embedding", "vec_id")
        return _QUANT_CACHE[key]

    _QD = ("list_transform({v}, x -> CAST(floor(CAST(x AS DOUBLE) / {s} + 0.5)"
           " AS BIGINT))")
    _SCALE = ("greatest(list_max(list_transform({v}, "
              "x -> abs(CAST(x AS DOUBLE)))), 1e-12) / 127.0")
    register(
        "similarity_topk_quantized",
        lambda spark, sf: S.query_quantized(
            _quant_index(spark, sf), query_id=0, k=10,
        ),
        f"""
        WITH scaled AS (
          SELECT vec_id, {_SCALE.format(v='embedding')} AS s,
                 embedding FROM embeddings
        ), quant AS (
          SELECT vec_id, s, {_QD.format(v='embedding', s='s')} AS q FROM scaled
        ), qv AS (
          SELECT s AS qs, q AS qq FROM quant WHERE vec_id = 0
        )
        SELECT vec_id AS id,
               round(s * qs * CAST(list_sum(list_transform(range(1, 65),
                     i -> q[i] * qq[i])) AS DOUBLE), 6) AS score
        FROM quant, qv WHERE vec_id <> 0
        ORDER BY score DESC, id LIMIT 10
        """,
    )

    _contribute_round2(register)


def _contribute_round2(register) -> None:
    # ---- temperature (alpha) mixture resampling ------------------------
    # Target share ∝ n^alpha over five sources; the oracle replays the
    # weight derivation (sqrt for alpha=0.5 — correctly rounded per
    # IEEE 754, so bit-identical across engines, unlike pow), the
    # sorted-order z summation, feasibility min, and floor thresholds
    # with the identical IEEE op order, then draws the same
    # portable-hash membership.
    _TGROUPS = ["src0", "src1", "src2", "src3", "src4"]

    def temperature(spark, sf):
        docs = load_table(spark, "documents", sf)
        kept = C.resample_temperature(docs, "source", "doc_id",
                                      _TGROUPS, alpha=0.5)
        return (
            kept.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_kept"))
            .orderBy("source")
        )

    _in = ", ".join(f"'{g}'" for g in _TGROUPS)
    register(
        "mixture_temperature_resample",
        temperature,
        f"""
        WITH in_scope AS (
          SELECT * FROM documents WHERE source IN ({_in})
        ), counts AS (
          SELECT source, CAST(count(*) AS DOUBLE) AS n
          FROM in_scope GROUP BY 1
        ), z AS (
          -- sequential sum in sorted-source order: matches the engine's
          -- driver-side summation order exactly (a parallel/arbitrary-
          -- order sum(sqrt(n)) could differ in the last ulp and flip a
          -- floor()'d threshold on knife-edge counts)
          SELECT list_sum(list(sqrt(n) ORDER BY source)) AS z FROM counts
        ), weighted AS (
          SELECT source, n, sqrt(n) / z AS w FROM counts, z
        ), feasible AS (
          SELECT min(n / w) AS t FROM weighted
        ), thr AS (
          SELECT source,
                 least(10000.0,
                       CAST(floor(10000.0 * w * t / n) AS DOUBLE)) AS thr
          FROM weighted, feasible
        )
        SELECT d.source, CAST(count(*) AS BIGINT) AS n_kept
        FROM in_scope d JOIN thr ON d.source = thr.source
        WHERE CAST({_BUCKET_SQL} AS DOUBLE) < thr
        GROUP BY 1 ORDER BY 1
        """,
    )

    # ---- fixed-budget document chunking --------------------------------
    def chunking(spark, sf):
        docs = load_table(spark, "documents", sf)
        return (
            C.chunk_documents(docs, "text", "doc_id", budget=32)
            .orderBy("doc_id", "chunk_idx")
        )

    register(
        "chunk_documents_32",
        chunking,
        f"""
        SELECT doc_id,
               CAST(i - 1 AS INT) AS chunk_idx,
               CAST(len(t[(i - 1) * 32 + 1 : (i - 1) * 32 + 32]) AS INT)
                 AS n_tokens,
               array_to_string(t[(i - 1) * 32 + 1 : (i - 1) * 32 + 32], ' ')
                 AS chunk_text
        FROM (
          SELECT doc_id, {_TOKS} AS t FROM documents
        ), unnest(range(1, CAST(ceil(len(t) / 32.0) AS BIGINT) + 1)) AS u(i)
        WHERE len(t) > 0
        ORDER BY doc_id, chunk_idx
        """,
    )
