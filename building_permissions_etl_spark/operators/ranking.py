"""Lexical ranking and statistical LM scoring over a document corpus:
TF-IDF top terms, BM25 retrieval, unigram log-probability scoring, and
chunk-level cross-document duplication (the C4/RefinedWeb-style "how
much of this doc exists elsewhere" signal).

The reference stops at scalar string ops (SURVEY.md §2.8); these extend
the text surface with the standard corpus-analysis primitives a
training-data pipeline needs, built the Spark-first way:

  * token streams come from ONE ``explode`` whose output is immediately
    partially aggregated (map-side combine) — the (doc, term) matrix is
    never materialized wider than its aggregated form;
  * corpus-level statistics (document frequencies, unigram counts, the
    doc count N, average doc length) are tiny aggregates — always
    BROADCAST back, never shuffled against the corpus;
  * ordering ties are broken lexically so results are deterministic and
    the DuckDB oracles can reproduce them exactly (scores rounded to 6
    before ranking — both engines rank the same rounded value).

Scale notes (100 TB): every operator here is one explode-shuffle over
tokens plus broadcast joins of aggregate tables. Document frequency /
vocabulary tables grow with DISTINCT terms (Heaps' law — millions, not
billions) and stay broadcastable; if a vocabulary outgrows the broadcast
threshold the same plans degrade gracefully to a shuffle join on term,
still linear. No operator holds a whole document's cross-product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from building_permissions_etl_spark.operators.dedup import tokens


def _doc_terms(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, term, tf) — term frequency per document; one explode, then
    partial-agg shuffle on (id, term)."""
    return (
        df.select(F.col(id_col).alias("id"),
                  F.explode(tokens(F.col(text_col))).alias("term"))
        .groupBy("id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def tfidf_top_terms(
    df: DataFrame, text_col: str, id_col: str, k: int = 3
) -> DataFrame:
    """Top-``k`` terms per document by TF-IDF (idf = ln(N/df), the
    classic unsmoothed form; every fixture term appears in ≥1 doc so the
    log argument is always ≥ 1).

    Rank on the ROUNDED score (6 dp) with a lexical tie-break, so the
    ordering is reproducible across engines. Plan: one token shuffle for
    tf, an aggregate df table broadcast back, one window for the top-k.
    """
    terms = _doc_terms(df, text_col, id_col)
    docfreq = terms.groupBy("term").agg(
        F.countDistinct("id").alias("df")
    )
    n_docs = df.agg(F.countDistinct(id_col).alias("n_docs"))
    scored = (
        terms.join(F.broadcast(docfreq), "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6),
        )
    )
    w = Window.partitionBy("id").orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("id", "rank", "term", "tf", "df", "tfidf")
        .orderBy("id", "rank")
    )


def bm25_topk(
    df: DataFrame,
    text_col: str,
    id_col: str,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` documents for a bag-of-words query under BM25 (Lucene
    idf: ln(1 + (N - df + 0.5)/(df + 0.5)), always positive).

    The query side is a literal handful of terms, so the token stream is
    FILTERED to them before the tf aggregation — the shuffle carries only
    matching (doc, term) rows. Doc lengths are one narrow aggregate; N,
    avgdl, and the per-term idf table are broadcast. Final top-k is
    orderBy+limit → TakeOrderedAndProject, no global sort.
    """
    qlit = F.array(*[F.lit(t) for t in query_terms])
    toks = tokens(F.col(text_col))
    dl = df.select(F.col(id_col).alias("id"),
                   F.size(toks).alias("dl"))
    tf = (
        df.select(F.col(id_col).alias("id"),
                  F.explode(toks).alias("term"))
        .filter(F.array_contains(qlit, F.col("term")))
        .groupBy("id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    docfreq = tf.groupBy("term").agg(F.countDistinct("id").alias("df"))
    scalars = df.agg(
        F.countDistinct(id_col).alias("n_docs"),
    ).crossJoin(
        dl.agg(F.avg("dl").alias("avgdl"))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    per_term = (
        tf.join(F.broadcast(docfreq), "term")
        .join(dl, "id")
        .crossJoin(F.broadcast(scalars))
        .withColumn(
            "contrib",
            idf * (F.col("tf") * (k1 + 1))
            / (F.col("tf")
               + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))),
        )
    )
    return (
        per_term.groupBy("id")
        .agg(F.round(F.sum("contrib"), 6).alias("bm25"))
        .orderBy(F.col("bm25").desc(), F.col("id").asc())
        .limit(k)
    )


def unigram_logprob(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-document mean natural-log probability of its tokens under the
    corpus unigram (maximum-likelihood) distribution — the cheapest
    useful "how surprising is this text" quality signal; real pipelines
    threshold on it before paying for model-based perplexity.

    Every token in a doc is by construction in the corpus vocabulary, so
    no smoothing is needed and the score is exact. Plan: the (doc, term)
    tf shuffle, a global unigram table broadcast back, one final per-doc
    aggregation.
    """
    terms = _doc_terms(df, text_col, id_col)
    uni = terms.groupBy("term").agg(F.sum("tf").alias("ctot"))
    total = terms.agg(F.sum("tf").alias("ntot"))
    scored = (
        terms.join(F.broadcast(uni), "term")
        .crossJoin(F.broadcast(total))
        .groupBy("id")
        .agg(
            F.sum("tf").alias("n_tokens"),
            (F.sum(F.col("tf") * F.log(F.col("ctot") / F.col("ntot")))
             / F.sum("tf")).alias("raw"),
        )
    )
    # one left join (not union + anti, which would execute the scored
    # subtree twice) carries empty docs through with zero/null
    return (
        df.select(F.col(id_col).alias("id"))
        .join(scored, "id", "left")
        .select(
            "id",
            F.coalesce("n_tokens", F.lit(0)).cast("bigint").alias("n_tokens"),
            F.round(F.col("raw"), 6).alias("avg_logprob"),
        )
        .orderBy("id")
    )


def classifier_weights(dim: int = 64, seed: int = 7) -> list[float]:
    """Deterministic pseudo-random weight vector for the hashed linear
    classifier — 6-dp rounded so the identical literals embed in both the
    Spark plan and the DuckDB oracle."""
    import random

    rng = random.Random(seed)
    return [round(rng.uniform(-1.0, 1.0), 6) for _ in range(dim)]


def quality_classifier_score(
    df: DataFrame,
    text_col: str,
    id_col: str,
    dim: int = 64,
    seed: int = 7,
    bias: float = 0.0,
) -> DataFrame:
    """Model-based quality scoring, fasttext-architecture: each token
    hashes into a ``dim``-bucket weight vector (hashing trick), the doc
    logit is the mean bucket weight plus a bias, and the score is its
    sigmoid. The weights here are a fixed seeded stand-in — swapping in
    trained weights changes ONE literal array, not the plan.

    Pure per-row fold — no explode, no shuffle, runs at scan speed; this
    is the cheap gate real pipelines run on every document before paying
    for model-based perplexity. The hash is ``portable_hash64`` so the
    DuckDB oracle replays the exact featureization (fold order and
    per-element hashing included); empty docs carry a null score.
    """
    from building_permissions_etl_spark.functions.expr import let
    from building_permissions_etl_spark.functions.portable import (
        portable_hash64,
    )

    warr = F.array(*[F.lit(x) for x in classifier_weights(dim, seed)])

    def feat(t):
        return F.element_at(
            warr, (F.pmod(portable_hash64(t), F.lit(dim)) + 1).cast("int")
        )

    def body(tk):
        n = F.size(tk)
        logit = (
            F.lit(bias)
            + F.aggregate(tk, F.lit(0.0), lambda a, t: a + feat(t)) / n
        )
        return F.struct(
            n.cast("bigint").alias("n_tokens"),
            F.when(
                n > 0,
                F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-logit)), 6),
            ).alias("quality_score"),
        )

    packed = let(tokens(F.col(text_col)), body)
    return (
        df.select(F.col(id_col).alias("id"), packed.alias("_s"))
        .select("id", "_s.*")
        .orderBy("id")
    )


def bigram_logprob(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-document mean conditional log-probability ln p(w_i | w_{i-1})
    under the corpus bigram maximum-likelihood model, where the prefix
    count c(w1) is w1's occurrence count as a bigram prefix — so
    p(·|w1) sums to exactly 1 and no smoothing is needed (every doc
    bigram is by construction in the corpus model).

    The fluency upgrade over ``unigram_logprob``: repeated boilerplate
    scores high, shuffled word salad scores low, at one extra broadcast.
    Docs with fewer than two tokens carry a null score. Same scale shape:
    one bigram explode → (doc, bigram) partial agg; the bigram and
    prefix tables are aggregates broadcast back.

    Pair construction is ``let``-bound + ``zip_with`` over two shifted
    slices — linear per row. (An element_at(tokens(text), i) lambda
    re-tokenizes the whole text per element: O(n²) per row, measured
    8.1 s vs 1.2 s on this query at sf0.1.)
    """
    from building_permissions_etl_spark.functions.expr import let

    pairs = let(
        tokens(F.col(text_col)),
        lambda tk: F.when(
            F.size(tk) >= 2,
            F.zip_with(
                F.slice(tk, 1, F.size(tk) - 1),
                F.slice(tk, 2, F.size(tk) - 1),
                lambda a, b: F.concat_ws(" ", a, b),
            ),
        ).otherwise(F.array().cast("array<string>")),
    )
    bi = (
        df.select(F.col(id_col).alias("id"), F.explode(pairs).alias("bg"))
        .groupBy("id", "bg")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    btab = bi.groupBy("bg").agg(F.sum("tf").alias("cb"))
    ptab = (
        btab.groupBy(F.substring_index("bg", " ", 1).alias("prefix"))
        .agg(F.sum("cb").alias("cp"))
    )
    scored = (
        bi.join(F.broadcast(btab), "bg")
        .withColumn("prefix", F.substring_index("bg", " ", 1))
        .join(F.broadcast(ptab), "prefix")
        .groupBy("id")
        .agg(
            F.sum("tf").alias("n_bigrams"),
            (F.sum(F.col("tf") * F.log(F.col("cb") / F.col("cp")))
             / F.sum("tf")).alias("raw"),
        )
    )
    # one left join (not union + anti, which would execute the scored
    # subtree twice) carries short docs through with zero/null
    return (
        df.select(F.col(id_col).alias("id"))
        .join(scored, "id", "left")
        .select(
            "id",
            F.coalesce("n_bigrams", F.lit(0)).cast("bigint").alias("n_bigrams"),
            F.round(F.col("raw"), 6).alias("avg_logprob"),
        )
        .orderBy("id")
    )


def chunk_dup_fraction(
    df: DataFrame, text_col: str, id_col: str, chunk_chars: int = 32
) -> DataFrame:
    """Per-document fraction of fixed-width character chunks whose exact
    content also appears in at least one OTHER document — the corpus-level
    boilerplate signal (C4's "three-sentence span seen before" rule,
    recast as aligned chunks so it is deterministic and oracle-checkable).

    Chunking is position-aligned: chunk i = substring(text, i·w+1, w),
    trailing remainder included. A chunk position counts as duplicated
    when its content occurs in ≥ 2 distinct docs corpus-wide. Plan: one
    explode over chunks, a (chunk → distinct-doc count) aggregate joined
    back on the chunk hash, one per-doc mean. The chunk-count table is
    aggregated BEFORE the join-back, and at 100 TB the join key is
    xxhash64(chunk), so the wide exchange carries 8-byte keys, not text.
    """
    t = F.col(text_col)
    n_chunks = F.ceil(F.length(t) / F.lit(chunk_chars)).cast("int")
    # sequence(0, -1) counts DOWN in Spark — empty docs must short-circuit
    # to an empty array, not a descending sequence
    chunk_arr = F.when(
        n_chunks > 0,
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: t.substr(i * chunk_chars + 1, F.lit(chunk_chars)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # explode must be top-level; hash in a follow-up projection so the
    # exchange and the occurrence table carry 8-byte keys, not chunk text
    chunks = df.select(
        F.col(id_col).alias("id"), F.explode(chunk_arr).alias("ch_text")
    ).select("id", F.xxhash64("ch_text").alias("ch"))
    occ = chunks.groupBy("ch").agg(F.countDistinct("id").alias("ndocs"))
    return (
        chunks.join(occ, "ch")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
            F.round(
                F.avg(F.when(F.col("ndocs") >= 2, 1.0).otherwise(0.0)), 6
            ).alias("dup_fraction"),
        )
        .orderBy("id")
    )


def dsir_scores(
    df: DataFrame,
    text_col: str,
    id_col: str,
    target_col: str,
    n_buckets: int = 256,
) -> DataFrame:
    """Hashed-n-gram importance scores for data selection (the DSIR
    recipe, Xie et al. 2023 — "Data Selection for Language Models via
    Importance Resampling" — with hashed unigram features): every token
    hashes into one of ``n_buckets`` buckets; a document's affinity to
    the target distribution is how often its tokens land in buckets the
    TARGET subset (rows where boolean ``target_col`` is true) populates.

    Production DSIR weights are the log-likelihood ratio
    ``Σ log(p_target[b]/p_raw[b])`` — a float sum whose value depends on
    summation order. This operator keeps the per-doc feature sums as
    EXACT INTEGERS (``target_hits`` = Σ target-bucket count over the
    doc's tokens, ``total_hits`` = the same against the full corpus) and
    takes ONE double division for the score, so ranking is
    order-independent and engine-portable; the monotone integer
    surrogate selects the same top set as the ratio it approximates
    whenever bucket masses dominate (documented trade — swap the final
    expression for the log-ratio on a real run, where a tolerance
    replaces bit-parity).

    Returns (id, target_hits, total_hits, score) for every document
    with ≥1 token. Shape: one token explode shuffled on the 8-byte
    bucket key, the two O(n_buckets) count tables broadcast back, one
    per-doc re-aggregation — linear at any corpus size, never a
    vocabulary-sized shuffle against the corpus.
    """
    from building_permissions_etl_spark.functions.portable import (
        portable_hash64,
    )

    toks = df.select(
        F.col(id_col).alias("id"),
        F.col(target_col).cast("boolean").alias("__tgt"),
        F.explode(tokens(F.col(text_col))).alias("term"),
    ).withColumn("b", portable_hash64(F.col("term")) % n_buckets)
    # Round 15 (guide §2.3/§2.4): aggregate the explode to per-(id,
    # bucket) counts FIRST. Both branches — the ≤n_buckets mass table
    # and the per-doc re-aggregation — now read the SAME (id, b, __tgt,
    # n) aggregate, so its exchange is planned once and the second
    # reference is a ReusedExchange: the tokenize+explode pass runs
    # once per query instead of twice (round 14 had already folded
    # three passes to two), and the broadcast join probes compact count
    # rows, never one row per token. Values are exact-integer
    # identical: __tc = Σ n over target groups reproduces
    # count(CASE WHEN target) (a null/false __tgt contributes 0 both
    # ways), and Σ_token mass == Σ_(id,b) n·mass.
    counts = toks.groupBy("id", "b", "__tgt").agg(
        F.count(F.lit(1)).alias("__n"))
    buckets = counts.groupBy("b").agg(
        F.sum(F.when(F.col("__tgt"), F.col("__n")).otherwise(F.lit(0)))
        .alias("__tc"),
        F.sum("__n").alias("__ac"),
    )
    return (
        counts.join(F.broadcast(buckets), "b")
        .groupBy("id")
        .agg(
            F.sum(F.col("__n") * F.col("__tc")).cast("bigint")
            .alias("target_hits"),
            F.sum(F.col("__n") * F.col("__ac")).cast("bigint")
            .alias("total_hits"),
        )
        .withColumn(
            "score",
            F.col("target_hits").cast("double")
            / F.col("total_hits").cast("double"),
        )
    )
