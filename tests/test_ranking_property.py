"""Property-based checks of the ranking/scoring operators against pure-
Python oracles on hypothesis-generated corpora: the Spark column/plan
formulations must agree with straight-line Python on arbitrary inputs —
tokenization edge cases (runs of whitespace, empty docs, single tokens),
tie-heavy vocabularies, and chunk boundaries included.
"""

from __future__ import annotations

import math
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from building_permissions_etl_spark.operators.ranking import (
    chunk_dup_fraction,
    tfidf_top_terms,
    unigram_logprob,
)

# Small alphabet → dense collisions, which is the hard case for
# dedup/ranking ties. Texts may contain whitespace runs.
_word = st.sampled_from(["aa", "bb", "cc", "Aa", "b", ""])
_text = st.lists(_word, min_size=0, max_size=8).map(" ".join)
_corpus = st.lists(_text, min_size=1, max_size=6)


def _toks(s):
    return [t for t in s.lower().split() if t]


def _mkdf(spark, texts):
    return spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(_corpus)
def test_unigram_logprob_matches_python(spark, texts):
    uni = Counter()
    for s in texts:
        uni.update(_toks(s))
    ntot = sum(uni.values())
    got = {r["id"]: r for r in
           unigram_logprob(_mkdf(spark, texts), "text", "doc_id").collect()}
    assert set(got) == set(range(len(texts)))
    for i, s in enumerate(texts):
        tk = _toks(s)
        assert got[i]["n_tokens"] == len(tk)
        if not tk:
            assert got[i]["avg_logprob"] is None
        else:
            exp = sum(math.log(uni[t] / ntot) for t in tk) / len(tk)
            assert got[i]["avg_logprob"] == round(exp, 6) or \
                abs(got[i]["avg_logprob"] - exp) < 2e-6


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(_corpus)
def test_tfidf_top1_matches_python(spark, texts):
    n_docs = len(texts)
    df_counts = Counter()
    for s in texts:
        df_counts.update(set(_toks(s)))
    got = {}
    for r in tfidf_top_terms(_mkdf(spark, texts), "text", "doc_id",
                             k=1).collect():
        got[r["id"]] = (r["term"], r["tfidf"])
    for i, s in enumerate(texts):
        tk = _toks(s)
        if not tk:
            assert i not in got
            continue
        tf = Counter(tk)
        best = min(
            ((-round(c * math.log(n_docs / df_counts[t]), 6), t)
             for t, c in tf.items()),
        )
        assert got[i][0] == best[1]
        assert got[i][1] == -best[0]


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.text(alphabet="abAB ", min_size=0, max_size=20),
                min_size=1, max_size=6),
       st.integers(min_value=1, max_value=7))
def test_chunk_dup_fraction_matches_python(spark, texts, width):
    def chunks(s):
        return [s[i:i + width] for i in range(0, len(s), width)]

    owners = {}
    for i, s in enumerate(texts):
        for c in set(chunks(s)):
            owners.setdefault(c, set()).add(i)
    got = {r["id"]: r for r in chunk_dup_fraction(
        _mkdf(spark, texts), "text", "doc_id", chunk_chars=width
    ).collect()}
    for i, s in enumerate(texts):
        cs = chunks(s)
        if not cs:
            assert i not in got
            continue
        dup = sum(1 for c in cs if len(owners[c]) >= 2)
        assert got[i]["n_chunks"] == len(cs)
        assert got[i]["dup_fraction"] == round(dup / len(cs), 6)
