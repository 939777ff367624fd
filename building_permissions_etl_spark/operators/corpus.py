"""Corpus-preparation operators for LLM training-data pipelines: PII
redaction, benchmark decontamination, sequence packing, repetition
detection, and corpus-composition reporting.

These extend the reference's text-column surface (it stops at simple
string scalars — SURVEY.md §2.8) with the standard pre-training curation
stages described in public pipeline papers: decontamination via n-gram
overlap (Brown et al. 2020 §4, GPT-3 appendix C), repetition filters
(Rae et al. 2021, Gopher §A1.1), and greedy sequence packing (the
concat-then-chunk scheme every causal-LM data loader uses).

All row-level logic is native Column expressions — no Python UDFs. The
only shuffles are (a) the broadcast-joined eval-gram probe and the final
per-doc count in decontamination, and (b) the per-partition window in
packing; everything else runs at parquet-scan speed. Every operator has
an independently-formulated DuckDB oracle in ``plans/corpus_queries.py``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from building_permissions_etl_spark.functions.expr import let
from building_permissions_etl_spark.operators.dedup import tokens, word_shingles
from building_permissions_etl_spark.operators.scale import fan_out

# PII patterns restricted to the regex subset with identical semantics in
# Java regex (Spark) and RE2 (DuckDB oracle): no lookaround, no
# backreferences, ASCII classes only.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
LONGNUM_RE = r"\b\d{7,}\b"  # phone-ish / account-ish digit runs


def pii_redact(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Redact emails, IPv4 literals, and long digit runs; count each.

    Counts are taken on the ORIGINAL text (so they are audit metrics, not
    post-hoc), and replacement is sequential email → ip → number so a
    digit run inside an already-redacted span is not double-counted in
    the output text. One narrow pass, no shuffle; at 100 TB this runs at
    scan speed and the regexes stay inside codegen.
    """
    t = F.col(text_col)
    clean = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, EMAIL_RE, "<EMAIL>"),
            IPV4_RE, "<IP>"),
        LONGNUM_RE, "<NUM>")
    return fan_out(df).select(
        F.col(id_col).alias("id"),
        clean.alias("clean_text"),
        F.regexp_count(t, F.lit(EMAIL_RE)).cast("bigint").alias("n_emails"),
        F.regexp_count(t, F.lit(IPV4_RE)).cast("bigint").alias("n_ips"),
        F.regexp_count(t, F.lit(LONGNUM_RE)).cast("bigint").alias("n_longnums"),
    )


def word_ngrams(col: Column, n: int) -> Column:
    """Alias of ``dedup.word_shingles`` — ONE n-gram builder serves the
    dedup and decontamination families, so a semantics fix cannot make
    them silently diverge (it did exist twice through round 3)."""
    return word_shingles(col, n)


def decontaminate(
    df: DataFrame,
    text_col: str,
    id_col: str,
    eval_pred: Column,
    n: int = 8,
) -> DataFrame:
    """Flag training docs that share any word ``n``-gram with the eval
    partition (the GPT-3-style 8-gram decontamination rule).

    Returns (doc_id, n_shared_grams) for contaminated training docs.
    Scale shape: the eval side (held-out benchmarks) is orders of
    magnitude smaller than the corpus, so its distinct gram set is
    BROADCAST — the train side never shuffles its exploded grams; the
    only wide exchange is the final per-doc count, whose input is already
    filtered down to matching grams.
    """
    grams = word_ngrams(F.col(text_col), n)
    eval_grams = (
        df.filter(eval_pred)
        .select(F.explode(grams).alias("gram"))
        .distinct()
    )
    train = (
        fan_out(df.filter(~eval_pred))
        .select(F.col(id_col).alias("id"), F.explode(grams).alias("gram"))
    )
    return (
        train.join(F.broadcast(eval_grams), "gram")
        .groupBy("id")
        .agg(F.count("*").alias("n_shared_grams"))
        .orderBy("id")
    )


def decontaminate_containment(
    df: DataFrame,
    text_col: str,
    id_col: str,
    eval_pred: Column,
    n: int = 3,
) -> DataFrame:
    """Per-training-doc CONTAINMENT fraction: what share of the doc's
    distinct word ``n``-grams appear anywhere in the eval partition.

    The binary n-gram rule (``decontaminate``) flags any overlap at all;
    real pipelines threshold on the overlap *fraction* (e.g. drop when
    >50% of a doc's grams are benchmark text — the containment form of
    the GPT-3 rule). Returns every training doc with its gram count and
    fraction, zeros included, so thresholding is a downstream filter.

    Same scale shape as ``decontaminate``: the eval gram set is
    broadcast; train grams explode into a partial-agg count, never a
    wide shuffle of text. Both tallies come out of ONE pass over the
    exploded train grams — a broadcast LEFT join marks eval hits and a
    single groupBy counts rows and non-null marks together, so the
    tokenize+explode subtree executes once, not twice.
    """
    grams = word_ngrams(F.col(text_col), n)
    eval_grams = (
        df.filter(eval_pred)
        .select(F.explode(grams).alias("gram"))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    train = (
        fan_out(df.filter(~eval_pred))
        .select(F.col(id_col).alias("id"), F.explode(grams).alias("gram"))
    )
    return (
        train.join(F.broadcast(eval_grams), "gram", "left")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count("__hit").alias("n_shared"),
        )
        .select(
            "id",
            F.col("n_grams").cast("bigint").alias("n_grams"),
            F.col("n_shared").cast("bigint").alias("n_shared"),
            F.round(
                F.col("n_shared").cast("double") / F.col("n_grams"), 6
            ).alias("containment"),
        )
        .orderBy("id")
    )


def pack_sequences(
    df: DataFrame,
    text_col: str,
    id_col: str,
    budget: int = 512,
    part_col: str | None = None,
) -> DataFrame:
    """Deterministic contiguous sequence packing: order docs by id within
    each partition stream, accumulate token counts, and assign each doc
    to the fixed-budget sequence in which it STARTS (concat-then-chunk
    semantics — a doc may straddle a boundary; its sequence is where its
    first token lands).

    Scale shape: the running sum is windowed PER ``part_col`` (language
    here), never a global single-partition window — each language stream
    packs independently and in parallel, which is both the realistic
    curriculum layout and the scalable plan. ``part_col=None`` (a global
    pack) DELEGATES to ``pack_sequences_global``'s two-pass
    range-partitioned prefix-sum: the old behavior silently built
    ``Window.partitionBy()`` — the exact single-task serialization this
    module's docstring forbids.
    """
    if part_col is None:
        return pack_sequences_global(df, text_col, id_col, budget)
    n_tok = F.size(tokens(F.col(text_col))).cast("bigint")
    part = [part_col] if part_col else []
    w = (
        Window.partitionBy(*part).orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(n_tok).over(w)
    start = cum - n_tok  # tokens before this doc in its stream
    out = [F.col(part_col).alias(part_col)] if part_col else []
    return df.select(
        F.col(id_col).alias("id"),
        *out,
        n_tok.alias("n_tokens"),
        F.floor(start / budget).cast("bigint").alias("seq_id"),
        (start % budget).cast("bigint").alias("seq_offset"),
    ).orderBy("id")


def pack_sequences_global(
    df: DataFrame,
    text_col: str,
    id_col: str,
    budget: int = 512,
    num_ranges: int | None = None,
) -> DataFrame:
    """Globally-ordered sequence packing — the two-pass range-partitioned
    prefix-sum ``pack_sequences`` names as the scalable alternative to a
    single-partition window.

    Pass 1: ids are bucketed into contiguous ranges by DETERMINISTIC
    literal boundaries (one bounded ``approxQuantile`` driver action —
    #ranges values, like the IVF training sample), and a per-range
    window computes LOCAL running token sums in parallel. Pass 2:
    per-range totals — ONE ROW per range, bounded by the range count,
    not the data — get an exclusive prefix sum on a single partition
    (the only SinglePartition exchange in the plan, plan-asserted), and
    the offsets broadcast-join back so every doc's global start is
    local_cum + its range's offset. Result is row-identical to the
    one-partition window form, but the per-row work runs in
    ``num_ranges``-way parallel — at 100 TB the serialized stage touches
    only ~#ranges rows instead of the corpus.

    The range id is a pure literal function of the id column —
    ``repartitionByRange + spark_partition_id`` would be wrong here: the
    frame is consumed by BOTH the totals aggregate and the final join,
    RangePartitioner re-samples boundaries per execution, and
    ``spark_partition_id`` is documented non-deterministic, so without
    exchange reuse the two subtrees could disagree on a row's range and
    silently corrupt offsets.
    """
    id_type = dict(df.dtypes).get(id_col, "")
    if not (id_type.startswith(("int", "bigint", "smallint", "tinyint",
                                "float", "double", "decimal"))):
        # the bucket assignment compares id AS DOUBLE against numeric
        # quantile boundaries; for string ids numeric vs lexicographic
        # order disagree and seq offsets would be silently wrong
        raise ValueError(
            f"pack_sequences_global needs a numeric {id_col!r} "
            f"(got {id_type}); map string ids to a numeric sort key first"
        )
    n_tok = F.size(tokens(F.col(text_col))).cast("bigint")
    base = fan_out(df).select(F.col(id_col).alias("id"), n_tok.alias("n_tokens"))
    spark = df.sparkSession
    ranges = num_ranges or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    qs = [i / ranges for i in range(1, ranges)]
    bounds = base.select(F.col("id").cast("double").alias("id")) \
                 .approxQuantile("id", qs, 0.001) if qs else []
    pid = F.aggregate(
        F.array(*[F.lit(float(b)) for b in bounds]),
        F.lit(0),
        lambda acc, b: acc + F.when(F.col("id") > b, 1).otherwise(0),
    ) if bounds else F.lit(0)
    ranged = base.withColumn("__pid", pid)
    w_local = (
        Window.partitionBy("__pid").orderBy("id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = ranged.withColumn("__cum", F.sum("n_tokens").over(w_local))
    totals = local.groupBy("__pid").agg(F.sum("n_tokens").alias("__tot"))
    w_off = (
        Window.orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = totals.select(
        "__pid",
        F.coalesce(F.sum("__tot").over(w_off), F.lit(0)).alias("__off"),
    )
    start = F.col("__cum") - F.col("n_tokens") + F.col("__off")
    return (
        local.join(F.broadcast(offs), "__pid")
        .select(
            "id",
            F.col("n_tokens"),
            F.floor(start / budget).cast("bigint").alias("seq_id"),
            (start % budget).cast("bigint").alias("seq_offset"),
        )
        .orderBy("id")
    )


def repetition_stats(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Within-document repetition features (Gopher-style filters):
    distinct-token ratio, top-token share, duplicate-bigram ratio.

    Pure per-row higher-order functions — no explode, no shuffle. The
    top-token count sorts the token array and takes the longest run of
    equal neighbours with one linear ``aggregate`` pass: O(n log n) per
    row in the doc's own length, so a planted 100k-token doc costs ~100k
    comparisons, not the 10^10 the earlier distinct×tokens form did
    (measured flat in SCALE.md). The oracle formulates the same features
    via unnest + GROUP BY, an independent computation path.
    """
    def _max_run(sorted_tk: Column) -> Column:
        # state = (prev token, current run, best run); exact max token
        # frequency because equal tokens are adjacent after the sort
        def merge(acc, x):
            run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
            return F.struct(
                x.alias("prev"), run.alias("run"),
                F.greatest(acc["best"], run).alias("best"),
            )

        return F.aggregate(
            sorted_tk,
            F.struct(
                F.lit(None).cast("string").alias("prev"),
                F.lit(0).alias("run"), F.lit(0).alias("best"),
            ),
            merge,
            lambda acc: acc["best"],
        )

    def body(tk: Column) -> list[Column]:
        n = F.size(tk)
        dist = F.array_distinct(tk)
        top = F.coalesce(_max_run(F.array_sort(tk)), F.lit(0))
        bigrams = F.when(
            n >= 2,
            F.transform(F.sequence(F.lit(0), n - 2),
                        lambda i: F.concat_ws(" ", F.slice(tk, i + 1, 2))),
        ).otherwise(F.array().cast("array<string>"))
        dup_big = let(bigrams, lambda bg: F.when(
            F.size(bg) > 0,
            1.0 - F.size(F.array_distinct(bg)).cast("double") / F.size(bg),
        ).otherwise(F.lit(0.0)))
        safe_n = F.greatest(n, F.lit(1))
        return [
            n.cast("bigint").alias("n_tokens"),
            F.size(dist).cast("bigint").alias("n_distinct"),
            F.round(F.size(dist).cast("double") / safe_n, 6).alias("distinct_ratio"),
            F.round(top.cast("double") / safe_n, 6).alias("top_token_share"),
            F.round(dup_big, 6).alias("dup_bigram_ratio"),
        ]

    toks = tokens(F.col(text_col))
    packed = let(toks, lambda tk: F.struct(*body(tk)))
    return fan_out(df).select(
        F.col(id_col).alias("id"), packed.alias("_s")
    ).select("id", "_s.*")


def corpus_composition(df: DataFrame, text_col: str) -> DataFrame:
    """Per (source, lang) corpus mix report: docs, token volume, mean doc
    length, and share of total corpus tokens.

    Aggregate-then-window: the global-total window runs over the tiny
    aggregated result (|sources|×|langs| rows), never the corpus — the
    expensive pass is one partial-aggregated groupBy.
    """
    n_tok = F.size(tokens(F.col(text_col))).cast("bigint")
    agg = df.groupBy("source", "lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(n_tok).alias("total_tokens"),
        F.round(F.avg(F.length(F.col(text_col))), 6).alias("avg_chars"),
    )
    share = F.col("total_tokens").cast("double") / F.sum("total_tokens").over(
        Window.partitionBy()
    )
    return agg.select(
        "source", "lang", "n_docs", "total_tokens", "avg_chars",
        F.round(share, 6).alias("token_share"),
    ).orderBy("source", "lang")


# ---------------------------------------------------------------------------
# Deterministic splits and mixture resampling. Both are HASH-derived, not
# RNG-derived: rand() splits are irreproducible across retries and
# engines, and a retried task at 100 TB would re-draw its rows. A content
# hash makes the assignment a pure function of the row — stable across
# runs, engines, cluster sizes, and AQE re-planning — and lets an
# independent SQL engine verify the exact member set.
# ---------------------------------------------------------------------------

def assign_split(
    df: DataFrame,
    id_col: str,
    buckets: tuple[tuple[str, int], ...] = (
        ("train", 9800), ("val", 100), ("test", 100),
    ),
) -> DataFrame:
    """Add a ``split`` column by portable-hash bucket of ``id_col``.

    ``buckets`` are (name, parts-per-10000) in priority order and must sum
    to 10000 so every row lands in exactly one split. Narrow projection:
    no shuffle, no RNG, reproducible under retry.
    """
    from building_permissions_etl_spark.functions.portable import portable_hash64

    total = sum(n for _, n in buckets)
    if total != 10000:
        raise ValueError(f"bucket weights must sum to 10000, got {total}")
    # NULL ids hash the empty string (md5(NULL) is NULL, which would make
    # the when-chain yield NULL and silently drop the row from every
    # split — violating the every-row-lands-somewhere invariant).
    bucket = F.pmod(
        portable_hash64(F.coalesce(F.col(id_col).cast("string"), F.lit(""))),
        F.lit(10000),
    )
    expr = None
    cum = 0
    for name, n in buckets:
        cum += n
        cond = bucket < F.lit(cum)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return df.withColumn("split", expr)


def resample_to_mix(
    df: DataFrame,
    group_col: str,
    id_col: str,
    weights: dict[str, float],
) -> DataFrame:
    """Deterministically downsample groups to target mixture proportions.

    The output is the LARGEST feasible corpus in which group ``g`` makes
    up ``weights[g]`` of the rows without upsampling any group: feasible
    total ``T = min_g(n_g / w_g)``, per-group keep threshold
    ``floor(10000 · w_g · T / n_g)`` applied to the portable hash bucket
    of the id. Groups not in ``weights`` are dropped.

    Scale shape: ONE aggregate action computes the per-group counts (a
    few-row frame, collected for validation anyway); the feasible total
    and per-group thresholds derive from those rows driver-side and
    enter the plan as literals, so the keep decision is a narrow
    map-side filter — no row-level shuffle of the corpus, no re-derived
    aggregate subplans.
    """
    import math

    from building_permissions_etl_spark.functions.portable import portable_hash64

    if not weights or any(w <= 0 for w in weights.values()):
        raise ValueError("weights must be non-empty and positive")
    in_scope = df.filter(F.col(group_col).isin(*weights.keys()))
    counts = in_scope.groupBy(group_col).agg(F.count(F.lit(1)).alias("__n"))
    # A weighted group with ZERO rows makes the true feasible total 0 —
    # silently ignoring it would emit a full-size corpus with the wrong
    # mixture (a typo'd source name must fail loudly). One bounded
    # action: counts has ≤ len(weights) rows, and the same rows yield
    # the thresholds below.
    n_by_group = {r[group_col]: r["__n"] for r in counts.collect()}
    missing = sorted(set(weights) - set(n_by_group))
    if missing:
        raise ValueError(
            f"weight groups with no rows in the input: {missing}; "
            f"the target mixture is infeasible without upsampling"
        )
    # Feasible total and per-group thresholds as plan LITERALS (IEEE op
    # order identical to the SQL oracle's distributed replay).
    t = min(n / w for g in weights for n, w in [(n_by_group[g], weights[g])])
    thr_by_group = {
        g: min(10000.0, float(math.floor(10000.0 * weights[g] * t
                                         / n_by_group[g])))
        for g in weights
    }
    thr_map = F.create_map(
        *[F.lit(x) for g, v in sorted(thr_by_group.items()) for x in (g, v)]
    )
    bucket = F.pmod(
        portable_hash64(F.coalesce(F.col(id_col).cast("string"), F.lit(""))),
        F.lit(10000),
    )
    return in_scope.filter(bucket.cast("double") < thr_map[F.col(group_col)])


def resample_temperature(
    df: DataFrame,
    group_col: str,
    id_col: str,
    groups: list[str] | tuple[str, ...],
    alpha: float = 0.5,
) -> DataFrame:
    """Temperature-based mixture resampling (the multilingual
    alpha-sampling rule, XLM-R §3.1 / mBERT exponent smoothing): target
    share of group g ∝ n_g^alpha, so low-resource groups are boosted
    toward (but not past) parity as alpha → 0, and alpha = 1 keeps the
    natural distribution.

    Weights derive from the SAME one-action per-group counts as
    ``resample_to_mix`` and feed its largest-feasible threshold rule —
    deterministic portable-hash membership, map-side keep filter.
    """
    import math

    from building_permissions_etl_spark.functions.portable import portable_hash64

    if not 0 < alpha <= 1:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    if not groups:
        raise ValueError("groups must be non-empty")
    in_scope = df.filter(F.col(group_col).isin(*groups))
    counts = in_scope.groupBy(group_col).agg(F.count(F.lit(1)).alias("__n"))
    n_by_group = {r[group_col]: r["__n"] for r in counts.collect()}
    missing = sorted(set(groups) - set(n_by_group))
    if missing:
        raise ValueError(f"groups with no rows in the input: {missing}")
    # w_g = n_g^alpha / Σ n^alpha, then the resample_to_mix feasibility
    # rule with the same IEEE op order as the SQL oracle replay. For
    # alpha = 0.5 use sqrt, NOT x**0.5: IEEE 754 requires sqrt to be
    # correctly rounded (so every conforming libm agrees to the last
    # ulp) but makes no such promise for pow — a one-ulp pow divergence
    # between engines can flip a floor()'d threshold on knife-edge
    # counts. z is summed in sorted-group order; the oracle replays the
    # same order via an ORDER BY'd list aggregation.
    if alpha == 0.5:
        powed = {g: math.sqrt(float(n_by_group[g])) for g in groups}
    else:
        powed = {g: float(n_by_group[g]) ** alpha for g in groups}
    z = sum(powed[g] for g in sorted(groups))
    t = min(n_by_group[g] / (powed[g] / z) for g in sorted(groups))
    thr_by_group = {
        g: min(10000.0,
               float(math.floor(10000.0 * (powed[g] / z) * t / n_by_group[g])))
        for g in groups
    }
    thr_map = F.create_map(
        *[F.lit(x) for g, v in sorted(thr_by_group.items()) for x in (g, v)]
    )
    bucket = F.pmod(
        portable_hash64(F.coalesce(F.col(id_col).cast("string"), F.lit(""))),
        F.lit(10000),
    )
    return in_scope.filter(bucket.cast("double") < thr_map[F.col(group_col)])


def chunk_documents(
    df: DataFrame,
    text_col: str,
    id_col: str,
    budget: int = 64,
) -> DataFrame:
    """Split each document into fixed-budget token chunks, one output
    row per chunk — the context-window chunking every pretraining loader
    applies to long documents (the complement of sequence PACKING, which
    concatenates short ones).

    Pure Column expressions: tokenize once (staged projection — HOF CSE
    rule), build chunk slices with transform-over-sequence, posexplode
    for the chunk index. Chunk text rejoins with single spaces (the
    tokenizer's inverse up to whitespace runs, which lower+split already
    collapsed). A doc shorter than ``budget`` yields exactly one chunk;
    empty/whitespace docs yield ZERO rows (nothing to train on).

    Scale shape: narrow map-side transform, no shuffle; output rows =
    ceil(tokens/budget) per doc, bounded by corpus token count.
    """
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    staged = df.select(
        F.col(id_col), tokens(F.col(text_col)).alias("__toks"))
    n = F.size(F.col("__toks"))
    n_chunks = F.ceil(n.cast("double") / budget).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.slice(F.col("__toks"), i * budget + 1, budget),
    )
    return (
        staged.filter(n > 0)
        .select(F.col(id_col), F.posexplode(chunks).alias("chunk_idx", "__c"))
        .select(
            F.col(id_col),
            F.col("chunk_idx").cast("int").alias("chunk_idx"),
            F.size("__c").alias("n_tokens"),
            F.array_join("__c", " ").alias("chunk_text"),
        )
    )


def top_fraction_per_group(
    df: DataFrame,
    group_col: str,
    order_by,
    id_col: str,
    fraction: float = 0.5,
) -> DataFrame:
    """Curriculum cut: keep the top ``fraction`` of each group under an
    explicit quality ordering (e.g. longest / highest-scored documents
    per language) — the data-selection step quality-ranked pretraining
    mixes apply per source.

    Membership is rank-based and deterministic: ``row_number`` under
    (``order_by``, ``id_col`` asc) ≤ ``ceil(fraction · group_size)`` —
    0.5 is an exact binary double, so the threshold arithmetic is
    engine-portable. One window shuffle on the group key computes both
    the rank and the group size; no second aggregation pass, no
    driver-side group census.
    """
    if not 0 < fraction <= 1:
        raise ValueError(f"fraction must be in (0, 1], got {fraction}")
    w = Window.partitionBy(group_col).orderBy(*order_by, F.col(id_col).asc())
    wc = Window.partitionBy(group_col)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .withColumn("__n", F.count(F.lit(1)).over(wc))
        .filter(F.col("__rn") <= F.ceil(F.col("__n") * F.lit(float(fraction))))
        .drop("__rn", "__n")
    )


def paragraph_dedup(
    df: DataFrame,
    text_col: str,
    id_col: str,
    budget: int = 16,
) -> DataFrame:
    """Paragraph-level exact dedup across the corpus (the C4/Dolma rule:
    repeated boilerplate paragraphs are removed everywhere but their
    first occurrence, and documents are REASSEMBLED from their surviving
    paragraphs in original order).

    Paragraph unit = the fixed-budget token chunks of
    ``chunk_documents`` (a real pipeline splits on newlines; the unit is
    a parameter of the chunker, not of this rule). First occurrence is
    ordered by (doc_id, chunk_idx) — deterministic across runs and
    partitionings. Returns (id, n_paragraphs, n_kept, clean_text); a
    fully-deduplicated document survives with n_kept = 0 and empty text
    (it still exists — dropping is the caller's thresholding decision).

    Scale shape: the first-occurrence window shuffles on
    (xxhash64(paragraph), paragraph) — 8-byte partitioning key, the text
    rides only inside its own bucket (same discipline as
    ``dedup_exact``); reassembly is one groupBy on the doc id with an
    in-group sort. No self-joins, nothing quadratic. Round 14 (guide
    §2.4): totals, kept-count and reassembly all come out of that ONE
    doc-id aggregate over the windowed frame — dropped chunks survive to
    the aggregate as ``rn > 1`` rows and are excluded by conditional
    count/collect (``collect_list`` skips NULLs), so the former separate
    totals branch (which re-computed the whole tokenize+chunk explode)
    and its left join are gone; a fully-deduplicated document still
    surfaces with n_kept = 0 and empty text because its rows reach the
    aggregate.
    """
    chunks = chunk_documents(df, text_col, id_col, budget)
    w = Window.partitionBy(
        F.xxhash64("chunk_text"), F.col("chunk_text")
    ).orderBy(id_col, "chunk_idx")
    first = F.col("__rn") == 1
    return (
        chunks.withColumn("__rn", F.row_number().over(w))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_paragraphs"),
            F.count(F.when(first, F.lit(1))).cast("bigint")
            .alias("n_kept"),
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.when(
                            first, F.struct("chunk_idx", "chunk_text")))
                    ),
                    lambda s: s["chunk_text"],
                ),
            ).alias("clean_text"),
        )
    )
