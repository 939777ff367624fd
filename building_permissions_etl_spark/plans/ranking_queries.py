"""Registry contributions: lexical ranking / LM scoring over documents
(TF-IDF, BM25, unigram log-prob, chunk-level duplication, containment
decontamination) plus the TPC-H Q5-shape multi-join revenue query.

Oracles re-derive every score through DuckDB's unnest + GROUP BY path —
independent of the Spark explode/broadcast formulation. Ranking queries
order by the ROUNDED (6 dp) score with lexical/id tie-breaks so both
engines produce identical orderings, not just identical score sets.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from building_permissions_etl_spark.catalog import load_table
from building_permissions_etl_spark.functions.portable import (
    PORTABLE_HASH_SQL,
)
from building_permissions_etl_spark.operators import ranking as R
from building_permissions_etl_spark.operators.corpus import (
    decontaminate_containment,
)

_TOKS = "list_filter(string_split_regex(lower(text), '\\s+'), t -> t != '')"

_BM25_TERMS = ["data", "spark", "fast"]
_CHUNK = 32
_CONTAIN_N = 3
_EVAL_MOD = 97  # same eval partition as decontaminate_8gram


def contribute(register) -> None:
    register(
        "tfidf_top_terms",
        lambda spark, sf: R.tfidf_top_terms(
            load_table(spark, "documents", sf), "text", "doc_id", k=3
        ),
        f"""
        WITH toks AS (SELECT doc_id, unnest({_TOKS}) AS term FROM documents),
        tfc AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
                FROM toks GROUP BY 1, 2),
        dfreq AS (SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
                  FROM tfc GROUP BY 1),
        n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
        scored AS (SELECT doc_id, term, tf, df,
                          round(tf * ln(n_docs / df), 6) AS tfidf
                   FROM tfc JOIN dfreq USING (term) CROSS JOIN n),
        ranked AS (SELECT *, row_number() OVER (
                     PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rank
                   FROM scored)
        SELECT doc_id AS id, CAST(rank AS INT) AS rank, term, tf, df, tfidf
        FROM ranked WHERE rank <= 3 ORDER BY id, rank
        """,
    )

    register(
        "bm25_topk",
        lambda spark, sf: R.bm25_topk(
            load_table(spark, "documents", sf), "text", "doc_id",
            _BM25_TERMS, k=10,
        ),
        f"""
        WITH toks AS (SELECT doc_id, unnest({_TOKS}) AS term FROM documents),
        tfc AS (SELECT doc_id, term, count(*) AS tf FROM toks
                WHERE term IN ('data', 'spark', 'fast') GROUP BY 1, 2),
        dfreq AS (SELECT term, count(DISTINCT doc_id) AS df FROM tfc GROUP BY 1),
        dl AS (SELECT doc_id, len({_TOKS}) AS dl FROM documents),
        s AS (SELECT (SELECT count(DISTINCT doc_id) FROM documents) AS n_docs,
                     (SELECT avg(dl) FROM dl) AS avgdl),
        contrib AS (
          SELECT t.doc_id,
                 ln(1 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
                   * (t.tf * 2.2)
                   / (t.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) AS c
          FROM tfc t JOIN dfreq d USING (term)
                     JOIN dl ON t.doc_id = dl.doc_id CROSS JOIN s)
        SELECT doc_id AS id, round(sum(c), 6) AS bm25
        FROM contrib GROUP BY 1
        ORDER BY bm25 DESC, id LIMIT 10
        """,
    )

    register(
        "unigram_logprob",
        lambda spark, sf: R.unigram_logprob(
            load_table(spark, "documents", sf), "text", "doc_id"
        ),
        f"""
        WITH toks AS (SELECT doc_id, unnest({_TOKS}) AS term FROM documents),
        tfc AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
        uni AS (SELECT term, sum(tf) AS ctot FROM tfc GROUP BY 1),
        tot AS (SELECT sum(tf) AS ntot FROM tfc),
        scored AS (
          SELECT t.doc_id, CAST(sum(t.tf) AS BIGINT) AS n_tokens,
                 round(sum(t.tf * ln(u.ctot / s.ntot)) / sum(t.tf), 6)
                   AS avg_logprob
          FROM tfc t JOIN uni u USING (term) CROSS JOIN tot s
          GROUP BY 1)
        SELECT d.doc_id AS id,
               coalesce(sc.n_tokens, 0) AS n_tokens,
               sc.avg_logprob
        FROM documents d LEFT JOIN scored sc ON d.doc_id = sc.doc_id
        ORDER BY id
        """,
    )

    register(
        "bigram_logprob",
        lambda spark, sf: R.bigram_logprob(
            load_table(spark, "documents", sf), "text", "doc_id"
        ),
        f"""
        WITH toks AS (SELECT doc_id, {_TOKS} AS w FROM documents),
        bg AS (SELECT doc_id,
                      unnest(CASE WHEN len(w) >= 2 THEN
                        list_transform(range(1, len(w)),
                                       i -> w[i] || ' ' || w[i + 1])
                      ELSE [] END) AS bg
               FROM toks),
        tf AS (SELECT doc_id, bg, count(*) AS tf FROM bg GROUP BY 1, 2),
        bt AS (SELECT bg, sum(tf) AS cb FROM tf GROUP BY 1),
        pt AS (SELECT split_part(bg, ' ', 1) AS prefix, sum(cb) AS cp
               FROM bt GROUP BY 1),
        sc AS (
          SELECT t.doc_id, CAST(sum(t.tf) AS BIGINT) AS n_bigrams,
                 round(sum(t.tf * ln(b.cb / p.cp)) / sum(t.tf), 6)
                   AS avg_logprob
          FROM tf t JOIN bt b USING (bg)
                    JOIN pt p ON split_part(t.bg, ' ', 1) = p.prefix
          GROUP BY 1)
        SELECT d.doc_id AS id,
               coalesce(sc.n_bigrams, 0) AS n_bigrams,
               sc.avg_logprob
        FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id
        ORDER BY id
        """,
    )

    register(
        "chunk_dup_fraction",
        lambda spark, sf: R.chunk_dup_fraction(
            load_table(spark, "documents", sf), "text", "doc_id",
            chunk_chars=_CHUNK,
        ),
        f"""
        WITH chunks AS (
          SELECT doc_id,
                 unnest(list_transform(
                   range(0, CAST(ceil(len(text) / {_CHUNK}.0) AS INT)),
                   i -> substr(text, i * {_CHUNK} + 1, {_CHUNK}))) AS ch
          FROM documents),
        occ AS (SELECT ch, count(DISTINCT doc_id) AS ndocs
                FROM chunks GROUP BY 1)
        SELECT doc_id AS id, CAST(count(*) AS BIGINT) AS n_chunks,
               round(avg(CASE WHEN ndocs >= 2 THEN 1.0 ELSE 0.0 END), 6)
                 AS dup_fraction
        FROM chunks JOIN occ USING (ch)
        GROUP BY 1 ORDER BY id
        """,
    )

    register(
        "decontaminate_containment",
        lambda spark, sf: decontaminate_containment(
            load_table(spark, "documents", sf), "text", "doc_id",
            eval_pred=F.col("doc_id") % _EVAL_MOD == 0, n=_CONTAIN_N,
        ),
        f"""
        WITH toks AS (SELECT doc_id, {_TOKS} AS w FROM documents),
        grams AS (
          SELECT doc_id,
                 CASE WHEN len(w) >= {_CONTAIN_N} THEN
                   list_distinct(list_transform(
                     range(1, len(w) - {_CONTAIN_N - 2}),
                     i -> array_to_string(
                       list_slice(w, i, i + {_CONTAIN_N - 1}), ' ')))
                 WHEN len(w) > 0 THEN [array_to_string(w, ' ')]
                 ELSE [] END AS gs
          FROM toks),
        e AS (SELECT DISTINCT unnest(gs) AS gram FROM grams
              WHERE doc_id % {_EVAL_MOD} = 0),
        t AS (SELECT doc_id, unnest(gs) AS gram FROM grams
              WHERE doc_id % {_EVAL_MOD} <> 0),
        shared AS (SELECT t.doc_id, count(*) AS n_shared
                   FROM t SEMI JOIN e USING (gram) GROUP BY 1),
        totals AS (SELECT doc_id, count(*) AS n_grams FROM t GROUP BY 1)
        SELECT totals.doc_id AS id,
               CAST(n_grams AS BIGINT) AS n_grams,
               CAST(coalesce(n_shared, 0) AS BIGINT) AS n_shared,
               round(coalesce(n_shared, 0) / n_grams, 6) AS containment
        FROM totals LEFT JOIN shared USING (doc_id)
        ORDER BY id
        """,
    )

    w_sql = "[" + ", ".join(f"{x:.6f}" for x in R.classifier_weights()) + "]"
    ph = PORTABLE_HASH_SQL.format(x="tok")
    register(
        "quality_classifier_score",
        lambda spark, sf: R.quality_classifier_score(
            load_table(spark, "documents", sf), "text", "doc_id"
        ),
        f"""
        WITH t AS (SELECT doc_id, {_TOKS} AS w FROM documents)
        SELECT doc_id AS id,
               CAST(len(w) AS BIGINT) AS n_tokens,
               CASE WHEN len(w) > 0 THEN
                 round(1.0 / (1.0 + exp(-(
                   list_sum(list_transform(w,
                     tok -> ({w_sql})[CAST({ph} % 64 AS INT) + 1]))
                   / len(w)))), 6)
               END AS quality_score
        FROM t ORDER BY id
        """,
    )

    # TPC-H Q5 shape: 6-table join, selective region + date-range filter,
    # revenue per nation. Catalyst broadcasts every dim (region, nation,
    # supplier are in BROADCAST_DIMS territory); the only wide shuffles
    # are lineitem⋈orders⋈customer on their keys and the final tiny agg.
    def local_supplier_volume(spark, sf):
        li = load_table(spark, "lineitem", sf)
        orders = load_table(spark, "orders", sf).filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        cust = load_table(spark, "customer", sf)
        supp = load_table(spark, "supplier", sf)
        nat = load_table(spark, "nation", sf)
        reg = load_table(spark, "region", sf).filter(F.col("r_name") == "ASIA")
        return (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .join(cust, orders.o_custkey == cust.c_custkey)
            .join(
                F.broadcast(supp),
                (li.l_suppkey == supp.s_suppkey)
                & (cust.c_nationkey == supp.s_nationkey),
            )
            .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
            .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
            .groupBy("n_name")
            .agg(
                F.round(
                    F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                    2,
                ).alias("revenue")
            )
            .orderBy(F.desc("revenue"), F.col("n_name"))
        )

    register(
        "local_supplier_volume",
        local_supplier_volume,
        """
        SELECT n_name,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY 1 ORDER BY revenue DESC, n_name
        """,
    )
