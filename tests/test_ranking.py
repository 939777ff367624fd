"""Ranking / LM-scoring operators: semantics on hand-built corpora plus
plan-shape pins for the scale-critical properties (broadcast aggregate
tables, TakeOrderedAndProject top-k, hashed chunk keys)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from building_permissions_etl_spark.operators.corpus import (
    decontaminate_containment,
)
from building_permissions_etl_spark.operators.ranking import (
    bm25_topk,
    chunk_dup_fraction,
    tfidf_top_terms,
    unigram_logprob,
)


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [
            (1, "apple banana apple cherry"),
            (2, "banana cherry cherry cherry"),
            (3, "apple unique banana"),
            (4, ""),
        ],
        "doc_id long, text string",
    )


def test_tfidf_ranks_rare_terms_higher(spark, corpus):
    out = {
        (r["id"], r["rank"]): (r["term"], r["tfidf"])
        for r in tfidf_top_terms(corpus, "text", "doc_id", k=2).collect()
    }
    # doc 3: 'unique' appears in 1 of 4 docs → idf ln(4), beats the
    # common terms despite tf=1
    assert out[(3, 1)][0] == "unique"
    assert out[(3, 1)][1] == pytest.approx(math.log(4.0), abs=1e-6)
    # doc 2: cherry tf=3 in 2 of 4 docs → 3·ln(2)
    assert out[(2, 1)][0] == "cherry"
    assert out[(2, 1)][1] == pytest.approx(3 * math.log(2.0), abs=1e-6)
    # empty doc contributes no rows
    assert not any(k[0] == 4 for k in out)


def test_tfidf_tie_breaks_lexically(spark):
    df = spark.createDataFrame(
        [(1, "b a"), (2, "a b")], "doc_id long, text string"
    )
    rows = tfidf_top_terms(df, "text", "doc_id", k=2).collect()
    # all scores equal (tf=1, df=2) → rank order must be lexical
    for r in rows:
        assert (r["rank"] == 1) == (r["term"] == "a")


def test_bm25_prefers_matching_docs(spark, corpus):
    rows = bm25_topk(corpus, "text", "doc_id", ["cherry"], k=2).collect()
    assert [r["id"] for r in rows] == [2, 1]  # tf 3 beats tf 1
    assert rows[0]["bm25"] > rows[1]["bm25"] > 0


def test_bm25_topk_is_take_ordered(spark, corpus):
    plan = bm25_topk(corpus, "text", "doc_id", ["cherry"], k=2)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_unigram_logprob_values(spark, corpus):
    out = {r["id"]: r for r in unigram_logprob(corpus, "text", "doc_id").collect()}
    # corpus: apple 3, banana 3, cherry 4, unique 1; total 11
    exp1 = (2 * math.log(3 / 11) + math.log(3 / 11) + math.log(4 / 11)) / 4
    assert out[1]["avg_logprob"] == pytest.approx(exp1, abs=1e-6)
    assert out[1]["n_tokens"] == 4
    # empty doc present with null score, zero tokens
    assert out[4]["n_tokens"] == 0 and out[4]["avg_logprob"] is None
    # all probabilities < 1 → scores strictly negative
    assert all(r["avg_logprob"] < 0 for r in out.values()
               if r["avg_logprob"] is not None)


def test_chunk_dup_fraction_flags_shared_chunks(spark):
    # 8-char chunks; doc 1 and 2 share their first chunk exactly
    df = spark.createDataFrame(
        [
            (1, "AAAABBBBCCCCDDDD"),
            (2, "AAAABBBBEEEEFFFF"),
            (3, "GGGGHHHHIIIIJJJJ"),
        ],
        "doc_id long, text string",
    )
    out = {r["id"]: r for r in
           chunk_dup_fraction(df, "text", "doc_id", chunk_chars=8).collect()}
    assert out[1]["n_chunks"] == 2 and out[1]["dup_fraction"] == 0.5
    assert out[2]["dup_fraction"] == 0.5
    assert out[3]["dup_fraction"] == 0.0


def test_chunk_join_key_is_hashed(spark, corpus):
    plan = chunk_dup_fraction(corpus, "text", "doc_id")._jdf.queryExecution().executedPlan().toString()
    assert "xxhash64" in plan


def test_containment_fraction_bounds(spark):
    df = spark.createDataFrame(
        [
            (0, "x y z w"),          # eval doc (id % 2 == 0 → 0, 2 eval)
            (2, "p q r s"),
            (1, "x y z w"),          # fully contained in eval grams
            (3, "a b c d"),          # disjoint
        ],
        "doc_id long, text string",
    )
    out = {r["id"]: r for r in decontaminate_containment(
        df, "text", "doc_id", eval_pred=F.col("doc_id") % 2 == 0, n=3
    ).collect()}
    assert set(out) == {1, 3}              # train docs only, zeros kept
    assert out[1]["containment"] == 1.0
    assert out[3]["containment"] == 0.0
    assert out[3]["n_shared"] == 0 and out[3]["n_grams"] == 2


def test_quality_classifier_bounds_and_empty(spark, corpus):
    from building_permissions_etl_spark.operators.ranking import (
        quality_classifier_score,
    )

    out = {r["id"]: r for r in
           quality_classifier_score(corpus, "text", "doc_id").collect()}
    assert out[4]["quality_score"] is None and out[4]["n_tokens"] == 0
    for i in (1, 2, 3):
        assert 0.0 < out[i]["quality_score"] < 1.0
    # deterministic: same tokens → same score regardless of doc identity
    again = {r["id"]: r["quality_score"] for r in
             quality_classifier_score(corpus, "text", "doc_id").collect()}
    assert all(again[i] == out[i]["quality_score"] for i in (1, 2, 3))


def test_quality_classifier_plan_is_shuffle_free(spark, corpus):
    from building_permissions_etl_spark.operators.ranking import (
        quality_classifier_score,
    )

    plan = (
        quality_classifier_score(corpus, "text", "doc_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    # scan-speed gate: sorting for the final orderBy is the ONLY exchange
    assert plan.count("Exchange hashpartitioning") == 0


def test_tfidf_broadcasts_aggregate_tables(spark, corpus):
    plan = tfidf_top_terms(corpus, "text", "doc_id")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
