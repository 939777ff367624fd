"""Text analysis operators for training-data pipelines (M7): quality
scoring, language ID, token counting, document fingerprinting.

All row-level logic is native Column expressions — one narrow pass over
the documents table, no shuffle, no UDF. At 100 TB these run at parquet
scan speed and are the cheap first stage before dedup/filtering.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from building_permissions_etl_spark.functions.expr import let
from building_permissions_etl_spark.operators.dedup import tokens
from building_permissions_etl_spark.operators.scale import fan_out

# Tiny per-language marker lexicons for the n-gram/stopword heuristic.
# Real pipelines plug in fastText/CLD3 via a pandas UDF; the heuristic is
# the engine-native fallback and the deterministic testable path.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "et", "les", "des"),
    "es": ("el", "la", "de", "los", "que"),
    "zh": ("的", "是", "在", "了", "我"),
}

# BPE-ish pre-tokenization: letter runs, digit runs, single non-space
# punctuation — the classic GPT-2-style split shape.
BPE_TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

STOPWORDS = ("the", "and", "of", "to", "a", "in", "is", "it", "that", "for")


def quality_stats(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-document quality features: lengths, token stats, punctuation /
    stopword / uppercase ratios, plus a composite quality score."""
    toks = tokens(F.col(text_col))
    n_chars = F.length(F.col(text_col))
    n_tokens = F.size(toks)
    punct = n_chars - F.length(F.regexp_replace(F.col(text_col), r"[^\w\s]", ""))
    upper = n_chars - F.length(F.regexp_replace(F.col(text_col), r"[A-Z]", ""))
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(*[F.lit(s) for s in STOPWORDS])))
    avg_tok = F.when(n_tokens > 0,
                     F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
                     .cast("double") / n_tokens).otherwise(F.lit(0.0))
    return fan_out(df).select(
        F.col(id_col).alias("id"),
        n_chars.cast("bigint").alias("n_chars"),
        n_tokens.cast("bigint").alias("n_tokens"),
        F.round(avg_tok, 6).alias("avg_token_len"),
        # greatest(·, 1): an empty doc gets ratio 0.0, not NULL (Spark)
        # vs NaN (DuckDB 0/0) — the one divisor here that can be zero
        F.round(punct.cast("double") / F.greatest(n_chars, F.lit(1)), 6)
        .alias("punct_ratio"),
        F.round(upper.cast("double") / F.greatest(n_chars, F.lit(1)), 6)
        .alias("upper_ratio"),
        F.round(stop_hits.cast("double") / F.greatest(n_tokens, F.lit(1)), 6)
        .alias("stopword_ratio"),
    )


def quality_filter(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_score: float = 0.5,
) -> DataFrame:
    """The filter stage a training pipeline runs on the stats: composite
    quality score in [0,1] from the per-document features, keep rows
    scoring ≥ ``min_score``. Weights are fixed plan literals — the scoring
    is one narrow pass, the filter lands on the same stage."""
    s = quality_stats(df, text_col, id_col)
    length_ok = F.when((F.col("n_tokens") >= 10) & (F.col("n_tokens") <= 5000), 1.0).otherwise(0.0)
    punct_ok = F.when(F.col("punct_ratio") <= 0.2, 1.0).otherwise(0.0)
    stop_ok = F.when(F.col("stopword_ratio") >= 0.01, 1.0).otherwise(0.0)
    caps_ok = F.when(F.col("upper_ratio") <= 0.3, 1.0).otherwise(0.0)
    score = F.round(
        0.4 * length_ok + 0.2 * punct_ok + 0.2 * stop_ok + 0.2 * caps_ok, 6
    )
    return (
        s.withColumn("quality_score", score)
        .filter(F.col("quality_score") >= min_score)
        .select("id", "quality_score", "n_tokens")
    )


def language_id(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Heuristic language ID: count marker-lexicon hits per language over
    the token set; argmax wins, ties broken by language code, zero hits →
    'und' (undetermined). Pure conditional aggregation per row."""
    toks = tokens(F.col(text_col))

    def _hits(markers: tuple[str, ...]):
        vals = list(markers)
        # single-arg lambda: pyspark's higher-order-function wrapper
        # introspects arity, so extra default args would mis-bind
        return lambda t: t.isin(vals)

    scores = {
        lang: F.size(F.filter(toks, _hits(markers)))
        for lang, markers in sorted(LANG_MARKERS.items())
    }
    best = F.greatest(*scores.values())
    guess = F.lit("und")
    # reverse order + when-chains ⇒ first (alphabetically smallest) max wins
    for lang in sorted(scores, reverse=True):
        guess = F.when(scores[lang] == best, F.lit(lang)).otherwise(guess)
    guess = F.when(best > 0, guess).otherwise(F.lit("und"))
    return fan_out(df).select(
        F.col(id_col).alias("id"),
        guess.alias("lang_guess"),
        best.cast("bigint").alias("marker_hits"),
    )


def token_counts(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Whitespace and BPE-ish regex token counts per document."""
    return fan_out(df).select(
        F.col(id_col).alias("id"),
        F.size(tokens(F.col(text_col))).cast("bigint").alias("ws_tokens"),
        F.regexp_count(F.col(text_col), F.lit(BPE_TOKEN_REGEX)).cast("bigint")
        .alias("bpe_tokens"),
    )


def doc_fingerprint(df: DataFrame, text_col: str, id_col: str,
                    window: int = 4, base_hash=None) -> DataFrame:
    """Winnowing-style fingerprint: rolling min over token hashes.

    fingerprint = hash of the sequence of per-window minima of the
    token-hash rolling windows — robust to small edits away from the
    minima (Schleimer et al., SIGMOD 2003 winnowing scheme, public).
    Default hash family is Spark's xxhash64; the registry variant passes
    ``portable_hash64`` so the whole winnowing pipeline is replicated and
    value-checked in DuckDB.
    """
    hash_fn = base_hash or F.xxhash64
    hs = F.transform(tokens(F.col(text_col)), lambda t: hash_fn(t))

    def body(hsb):
        # hsb is the let-bound materialized hash array: the rolling
        # windows below reference it O(n) times, which would otherwise
        # re-run the tokenize+hash pipeline per window position.
        n = F.size(hsb)
        mins = F.when(
            n >= window,
            F.transform(
                F.sequence(F.lit(0), n - window),
                lambda i: F.array_min(F.slice(hsb, i + 1, window)),
            ),
        ).otherwise(F.array(F.array_min(hsb)))
        return hash_fn(
            F.concat_ws(",", F.transform(mins, lambda m: m.cast("string")))
        )

    return fan_out(df).select(
        F.col(id_col).alias("id"),
        let(hs, body).alias("fingerprint"),
    )


def gopher_rules(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_words: int = 30,
    max_words: int = 90,
    min_mean_word_len: float = 3.5,
    max_mean_word_len: float = 5.0,
    stopwords: tuple[str, ...] = ("a", "the"),
    min_stop_hits: int = 2,
) -> DataFrame:
    """Gopher-style document quality rules (Rae et al. 2021, §A1.1):
    word-count bounds, mean-word-length band, and a minimum stopword
    presence. Each rule is emitted as its own boolean next to the inputs
    it judged — pipelines tune thresholds by inspecting rule marginals,
    not just the conjunction.

    Pure Column expressions over one narrow pass, STAGED as three
    projections so each expensive subtree is evaluated once per row:
    HOFs (split/aggregate/filter) are interpreted, outside whole-stage
    codegen's subexpression elimination, so a flat select that mentions
    the token array k times tokenizes k times (measured 2× on this
    operator); a projection boundary materializes it, and CollapseProject
    keeps the stage because the expressions are not cheap. No shuffle,
    no UDF. Thresholds default to the fixture corpus's scale; production
    corpora pass the paper's values (50/100k words, 3-10 chars).
    """
    with_toks = df.select(F.col(id_col), tokens(F.col(text_col)).alias("__toks"))
    toks = F.col("__toks")
    raw = with_toks.select(
        F.col(id_col),
        F.size(toks).alias("word_count"),
        F.aggregate(toks, F.lit(0.0), lambda acc, t: acc + F.length(t))
        .alias("__char_sum"),
        F.size(F.filter(toks, lambda t: t.isin(*stopwords)))
        .alias("stop_hits"),
    )
    # Empty/whitespace-only docs: mean word length is NULL (not the 0.0
    # aggregate seed), matching SQL's list_sum over an empty list — the
    # length-band rule is then NULL and ``keep`` is still FALSE via the
    # word-count rule (FALSE AND NULL = FALSE in both engines).
    word_count = F.col("word_count")
    mean_wl = F.round(
        F.when(word_count > 0,
               F.col("__char_sum") / word_count.cast("double")), 4)
    stop_hits = F.col("stop_hits")
    return raw.select(
        F.col(id_col),
        word_count,
        mean_wl.alias("mean_word_len"),
        stop_hits,
        ((word_count >= min_words) & (word_count <= max_words))
        .alias("rule_words"),
        ((mean_wl >= min_mean_word_len)
         & (mean_wl <= max_mean_word_len)).alias("rule_word_len"),
        (stop_hits >= min_stop_hits).alias("rule_stopwords"),
    ).withColumn(
        "keep",
        F.col("rule_words") & F.col("rule_word_len") & F.col("rule_stopwords"),
    )
