"""Planted-fixture tests for the corpus-preparation operators
(operators/corpus.py): PII redaction, decontamination, sequence packing,
repetition stats, composition. The registry parity suite value-checks
these against DuckDB on the fixture tables; here we verify the SEMANTICS
on constructed inputs where the right answer is known by hand."""

from __future__ import annotations

from pyspark.sql import functions as F

from building_permissions_etl_spark.operators import corpus as C


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")


def test_pii_redact_planted(spark):
    df = _docs(spark, [
        (1, "mail me at alice.smith+x@example.co.uk now", "en", "web"),
        (2, "server 10.0.254.3 answered, then 192.168.1.1 dropped", "en", "web"),
        (3, "call 5551234567 or acct 00012345678", "en", "web"),
        (4, "nothing sensitive here 123", "en", "web"),
    ])
    rows = {r["id"]: r for r in C.pii_redact(df, "text", "doc_id").collect()}
    assert rows[1]["clean_text"] == "mail me at <EMAIL> now"
    assert rows[1]["n_emails"] == 1 and rows[1]["n_ips"] == 0
    assert rows[2]["clean_text"] == "server <IP> answered, then <IP> dropped"
    assert rows[2]["n_ips"] == 2
    assert rows[3]["clean_text"] == "call <NUM> or acct <NUM>"
    assert rows[3]["n_longnums"] == 2
    # short digit runs survive
    assert rows[4]["clean_text"] == "nothing sensitive here 123"
    assert rows[4]["n_emails"] == rows[4]["n_ips"] == rows[4]["n_longnums"] == 0


def test_decontaminate_flags_only_real_overlap(spark):
    shared = "one two three four five six seven eight"
    df = _docs(spark, [
        (0, f"benchmark prompt {shared} trailing words", "en", "eval"),   # eval (id%2==0 pred below)
        (1, f"training doc contains {shared} in the middle", "en", "web"),
        (3, "completely unrelated text with no overlap at all here", "en", "web"),
        (5, "one two three four five six seven NINE different tail", "en", "web"),
    ])
    out = {r["id"]: r["n_shared_grams"] for r in C.decontaminate(
        df, "text", "doc_id", eval_pred=F.col("doc_id") % 2 == 0, n=8
    ).collect()}
    assert 1 in out and out[1] >= 1      # shares the full 8-gram
    assert 3 not in out                  # no overlap
    assert 5 not in out                  # 7-token prefix only — below n


def test_pack_sequences_contiguous_budget(spark):
    # 3 docs of 4 tokens each per lang, budget 6: starts at 0,4,8 → seqs 0,0,1
    rows = [(i, "a b c d", lang, "s") for lang in ("en", "de") for i in range(3)]
    rows = [(i + (0 if lang == "en" else 10), t, lang, s)
            for (i, t, lang, s) in rows]
    df = _docs(spark, rows)
    out = C.pack_sequences(df, "text", "doc_id", budget=6, part_col="lang").collect()
    by_id = {r["id"]: r for r in out}
    for base in (0, 10):
        assert [by_id[base + i]["seq_id"] for i in range(3)] == [0, 0, 1]
        assert [by_id[base + i]["seq_offset"] for i in range(3)] == [0, 4, 2]
    # packing is per-language: both streams start at seq 0
    assert by_id[0]["seq_id"] == by_id[10]["seq_id"] == 0


def test_pack_sequences_global_matches_single_window(spark):
    """The two-pass range-partitioned prefix-sum must be row-identical to
    the ground-truth single-stream pack (pack_sequences with no part_col,
    which runs one global window), across many range partitions."""
    from building_permissions_etl_spark.catalog import load_table

    docs = load_table(spark, "documents", "/root/testdata/sf0.001")
    want = [
        (r["id"], r["n_tokens"], r["seq_id"], r["seq_offset"])
        for r in C.pack_sequences(docs, "text", "doc_id", budget=512).collect()
    ]
    got = [
        (r["id"], r["n_tokens"], r["seq_id"], r["seq_offset"])
        for r in C.pack_sequences_global(
            docs, "text", "doc_id", budget=512, num_ranges=7
        ).collect()
    ]
    assert got == want and len(got) == 500


def test_pack_sequences_global_no_data_wide_single_partition(spark):
    """The only SinglePartition exchange in the plan must sit above the
    per-partition totals aggregate (one row per range partition) — the
    corpus itself is never funneled through one partition."""
    from building_permissions_etl_spark.catalog import load_table

    docs = load_table(spark, "documents", "/root/testdata/sf0.001")
    q = C.pack_sequences_global(docs, "text", "doc_id", budget=512)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan.lower()          # pass-1 range split
    hits = [i for i in range(len(plan))
            if plan.startswith("Exchange SinglePartition", i)]
    assert len(hits) == 1
    # the subtree under that exchange must be the tiny totals aggregate
    below = plan[hits[0]:].splitlines()
    agg_soon = any("HashAggregate" in ln for ln in below[1:4])
    assert agg_soon, below[:4]


def test_repetition_stats_known_values(spark):
    df = _docs(spark, [
        (1, "a a a a", "en", "s"),          # 1 distinct / 4, top share 1.0, bigrams all "a a"
        (2, "a b c d", "en", "s"),          # all distinct
        (3, "x", "en", "s"),                # single token → no bigrams
    ])
    rows = {r["id"]: r for r in C.repetition_stats(df, "text", "doc_id").collect()}
    assert rows[1]["n_tokens"] == 4 and rows[1]["n_distinct"] == 1
    assert rows[1]["top_token_share"] == 1.0
    assert abs(rows[1]["dup_bigram_ratio"] - (1 - 1 / 3)) < 1e-6
    assert rows[2]["distinct_ratio"] == 1.0 and rows[2]["dup_bigram_ratio"] == 0.0
    assert rows[3]["n_tokens"] == 1 and rows[3]["dup_bigram_ratio"] == 0.0


def test_corpus_composition_shares_sum_to_one(spark):
    df = _docs(spark, [
        (1, "a b c", "en", "web"),
        (2, "d e", "en", "web"),
        (3, "f g h i", "de", "books"),
    ])
    rows = C.corpus_composition(df, "text").collect()
    assert {(r["source"], r["lang"]) for r in rows} == {("web", "en"), ("books", "de")}
    shares = {(r["source"], r["lang"]): r["token_share"] for r in rows}
    assert abs(sum(shares.values()) - 1.0) < 1e-6
    assert abs(shares[("web", "en")] - 5 / 9) < 1e-6
    tot = {(r["source"], r["lang"]): r["total_tokens"] for r in rows}
    assert tot[("web", "en")] == 5 and tot[("books", "de")] == 4


def test_empty_doc_produces_no_grams_and_no_contamination(spark):
    """An empty/whitespace-only doc must not share a phantom '' gram."""
    from building_permissions_etl_spark.operators.corpus import (
        decontaminate_containment,
        word_ngrams,
    )

    df = spark.createDataFrame(
        [(0, ""), (1, "   "), (2, "alpha beta gamma")],
        "doc_id long, text string",
    )
    grams = {r["doc_id"]: r["g"] for r in df.select(
        "doc_id", word_ngrams(F.col("text"), 3).alias("g")).collect()}
    assert grams[0] == [] and grams[1] == []
    assert grams[2] == ["alpha beta gamma"]
    # doc 0 is "eval": docs 1 (empty) and 2 must show zero containment
    got = {r["id"]: r["containment"] for r in decontaminate_containment(
        df, "text", "doc_id", eval_pred=F.col("doc_id") == 0).collect()}
    assert all(v in (0.0, None) for v in got.values()), got


def test_pack_sequences_none_part_delegates_to_global(spark):
    """part_col=None must NOT build a single-partition window."""
    from building_permissions_etl_spark.operators.corpus import (
        pack_sequences,
        pack_sequences_global,
    )

    df = spark.createDataFrame(
        [(i, "tok " * (i % 7 + 1)) for i in range(50)],
        "doc_id long, text string",
    )
    a = sorted(map(tuple, pack_sequences(
        df, "text", "doc_id", budget=16, part_col=None).collect()))
    b = sorted(map(tuple, pack_sequences_global(
        df, "text", "doc_id", budget=16).collect()))
    assert a == b
    plan = pack_sequences(df, "text", "doc_id", budget=16, part_col=None) \
        ._jdf.queryExecution().executedPlan().toString()
    # the only SinglePartition exchange allowed is the tiny offsets one
    assert plan.count("SinglePartition") <= 1


def test_pack_sequences_global_rejects_string_ids(spark):
    import pytest as _pytest

    from building_permissions_etl_spark.operators.corpus import (
        pack_sequences_global,
    )

    df = spark.createDataFrame([("a", "x y"), ("b", "z")],
                               "doc_id string, text string")
    with _pytest.raises(ValueError, match="numeric"):
        pack_sequences_global(df, "text", "doc_id")
