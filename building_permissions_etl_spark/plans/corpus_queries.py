"""Registry contributions: corpus-preparation operators (PII redaction,
decontamination, sequence packing, repetition filters, composition
report) over the ``documents`` fixture table.

Every query here is value-checked: the DuckDB oracles re-derive the same
features through an INDEPENDENT computation path (unnest + GROUP BY
where Spark uses per-row higher-order functions), so a shared bug in the
formulation can't hide. Tokenization parity with the dedup/textstats
families is pinned by reusing the same ``_TOKS`` SQL fragment shape:
split on whitespace runs, lowercase, drop empties.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from building_permissions_etl_spark.catalog import load_table
from building_permissions_etl_spark.operators import corpus as C

_TOKS = "list_filter(string_split_regex(lower(text), '\\s+'), t -> t != '')"

# 8-gram decontamination: eval partition = every 97th doc (deterministic
# stand-in for a held-out benchmark set).
_EVAL_MOD = 97
_NGRAM = 8

_PACK_BUDGET = 512


def contribute(register) -> None:
    register(
        "pii_redact",
        lambda spark, sf: C.pii_redact(
            load_table(spark, "documents", sf), "text", "doc_id"
        ).orderBy("id"),
        f"""
        SELECT doc_id AS id,
               regexp_replace(regexp_replace(regexp_replace(text,
                   '{C.EMAIL_RE}', '<EMAIL>', 'g'),
                   '{C.IPV4_RE}', '<IP>', 'g'),
                   '{C.LONGNUM_RE}', '<NUM>', 'g') AS clean_text,
               CAST(len(regexp_extract_all(text, '{C.EMAIL_RE}')) AS BIGINT) AS n_emails,
               CAST(len(regexp_extract_all(text, '{C.IPV4_RE}')) AS BIGINT) AS n_ips,
               CAST(len(regexp_extract_all(text, '{C.LONGNUM_RE}')) AS BIGINT) AS n_longnums
        FROM documents ORDER BY id
        """,
    )

    register(
        "decontaminate_8gram",
        lambda spark, sf: C.decontaminate(
            load_table(spark, "documents", sf), "text", "doc_id",
            eval_pred=F.col("doc_id") % _EVAL_MOD == 0, n=_NGRAM,
        ),
        f"""
        WITH toks AS (SELECT doc_id, {_TOKS} AS w FROM documents),
        grams AS (
          SELECT doc_id,
                 CASE WHEN len(w) >= {_NGRAM} THEN
                   list_distinct(list_transform(range(1, len(w) - {_NGRAM - 2}),
                     i -> array_to_string(list_slice(w, i, i + {_NGRAM - 1}), ' ')))
                 WHEN len(w) > 0 THEN [array_to_string(w, ' ')]
                 ELSE [] END AS gs
          FROM toks),
        e AS (SELECT DISTINCT unnest(gs) AS gram FROM grams
              WHERE doc_id % {_EVAL_MOD} = 0),
        t AS (SELECT doc_id, unnest(gs) AS gram FROM grams
              WHERE doc_id % {_EVAL_MOD} <> 0)
        SELECT t.doc_id AS id, count(*) AS n_shared_grams
        FROM t JOIN e USING (gram)
        GROUP BY t.doc_id ORDER BY id
        """,
    )

    register(
        "pack_sequences_by_lang",
        lambda spark, sf: C.pack_sequences(
            load_table(spark, "documents", sf), "text", "doc_id",
            budget=_PACK_BUDGET, part_col="lang",
        ),
        f"""
        WITH t AS (SELECT doc_id, lang,
                          CAST(len({_TOKS}) AS BIGINT) AS n_tokens
                   FROM documents),
        c AS (SELECT doc_id, lang, n_tokens,
                     sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
              FROM t)
        SELECT doc_id AS id, lang, n_tokens,
               CAST(floor((cum - n_tokens) / {_PACK_BUDGET}) AS BIGINT) AS seq_id,
               CAST((cum - n_tokens) % {_PACK_BUDGET} AS BIGINT) AS seq_offset
        FROM c ORDER BY id
        """,
    )

    register(
        "pack_sequences_global",
        lambda spark, sf: C.pack_sequences_global(
            load_table(spark, "documents", sf), "text", "doc_id",
            budget=_PACK_BUDGET,
        ),
        f"""
        WITH t AS (SELECT doc_id,
                          CAST(len({_TOKS}) AS BIGINT) AS n_tokens
                   FROM documents),
        c AS (SELECT doc_id, n_tokens,
                     sum(n_tokens) OVER (ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
              FROM t)
        SELECT doc_id AS id, n_tokens,
               CAST(floor((cum - n_tokens) / {_PACK_BUDGET}) AS BIGINT) AS seq_id,
               CAST((cum - n_tokens) % {_PACK_BUDGET} AS BIGINT) AS seq_offset
        FROM c ORDER BY id
        """,
    )

    register(
        "repetition_stats",
        lambda spark, sf: C.repetition_stats(
            load_table(spark, "documents", sf), "text", "doc_id"
        ).orderBy("id"),
        f"""
        WITH w AS (SELECT doc_id, {_TOKS} AS w FROM documents),
        tok AS (SELECT doc_id, unnest(w) AS tok FROM w),
        cnt AS (SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY 1, 2),
        agg AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
                       CAST(count(*) AS BIGINT) AS n_distinct,
                       max(c) AS top_c
                FROM cnt GROUP BY 1),
        big AS (SELECT doc_id,
                       CASE WHEN len(w) >= 2 THEN
                         list_transform(range(1, len(w)),
                                        i -> w[i] || ' ' || w[i + 1])
                       ELSE [] END AS bg
                FROM w)
        SELECT w.doc_id AS id,
               coalesce(a.n_tokens, 0) AS n_tokens,
               coalesce(a.n_distinct, 0) AS n_distinct,
               round(coalesce(a.n_distinct, 0) /
                     greatest(coalesce(a.n_tokens, 0), 1), 6) AS distinct_ratio,
               round(coalesce(a.top_c, 0) /
                     greatest(coalesce(a.n_tokens, 0), 1), 6) AS top_token_share,
               CASE WHEN len(b.bg) > 0 THEN
                 round(1 - len(list_distinct(b.bg)) / len(b.bg), 6)
               ELSE 0.0 END AS dup_bigram_ratio
        FROM w LEFT JOIN agg a ON w.doc_id = a.doc_id
               LEFT JOIN big b ON w.doc_id = b.doc_id
        ORDER BY id
        """,
    )

    register(
        "corpus_composition",
        lambda spark, sf: C.corpus_composition(
            load_table(spark, "documents", sf), "text"
        ),
        f"""
        WITH a AS (SELECT source, lang, count(*) AS n_docs,
                          CAST(sum(len({_TOKS})) AS BIGINT) AS total_tokens,
                          round(avg(len(text)), 6) AS avg_chars
                   FROM documents GROUP BY 1, 2)
        SELECT source, lang, n_docs, total_tokens, avg_chars,
               round(total_tokens / sum(total_tokens) OVER (), 6) AS token_share
        FROM a ORDER BY source, lang
        """,
    )
