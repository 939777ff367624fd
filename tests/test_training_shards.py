"""Contracts for the hash-sharded training export sink: stable
membership, one file per shard, verifiable manifest."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from building_permissions_etl_spark.catalog import load_table
from building_permissions_etl_spark.sources.sinks import write_training_shards

SF = "/root/testdata/sf0.001"


def test_shards_cover_all_rows_and_are_stable(spark, tmp_path):
    docs = load_table(spark, "documents", SF).select("doc_id", "text", "lang")
    out = str(tmp_path / "shards")
    m1 = write_training_shards(docs, out, "doc_id", 4).collect()
    total = sum(r["n_rows"] for r in m1)
    assert total == docs.count()
    assert {r["shard"] for r in m1} <= set(range(4))
    # re-export is bit-stable: same membership, same checksums
    m2 = write_training_shards(docs, out, "doc_id", 4).collect()
    assert sorted(map(tuple, m1)) == sorted(map(tuple, m2))


def test_one_file_per_shard(spark, tmp_path):
    docs = load_table(spark, "documents", SF).select("doc_id", "text")
    out = str(tmp_path / "shards")
    write_training_shards(docs, out, "doc_id", 3).collect()
    for d in glob.glob(os.path.join(out, "__shard=*")):
        files = [f for f in os.listdir(d) if f.endswith(".parquet")]
        assert len(files) == 1, f"{d} has {len(files)} files"


def test_manifest_detects_membership_change(spark, tmp_path):
    docs = load_table(spark, "documents", SF).select("doc_id", "text")
    out = str(tmp_path / "shards")
    m_full = {r["shard"]: r["checksum"]
              for r in write_training_shards(docs, out, "doc_id", 2).collect()}
    m_drop = {r["shard"]: r["checksum"]
              for r in write_training_shards(
                  docs.filter(F.col("doc_id") != 0), out, "doc_id", 2
              ).collect()}
    assert m_full != m_drop


def test_rejects_bad_shard_count(spark, tmp_path):
    docs = load_table(spark, "documents", SF)
    with pytest.raises(ValueError, match="n_shards"):
        write_training_shards(docs, str(tmp_path / "x"), "doc_id", 0)


def test_rejects_append_mode(spark, tmp_path):
    """Append would fold earlier exports into the re-read manifest and
    write a second file per shard dir — the sink must refuse loudly."""
    docs = load_table(spark, "documents", SF)
    with pytest.raises(ValueError, match="overwrite"):
        write_training_shards(docs, str(tmp_path / "x"), "doc_id", 2,
                              mode="append")


def test_jsonl_shards_roundtrip_and_manifest(spark, tmp_path):
    """JSONL export: stable hash sharding, valid JSON lines that
    round-trip through spark.read.json, manifest counts match."""
    from pyspark.sql import functions as F

    from building_permissions_etl_spark.sources.sinks import write_jsonl_shards

    docs = load_table(spark, "documents", SF).select("doc_id", "text", "lang")
    out = str(tmp_path / "jsonl")
    m = {r["shard"]: r["n_rows"]
         for r in write_jsonl_shards(docs, out, "doc_id", 4).collect()}
    assert sum(m.values()) == docs.count()
    assert set(m) <= set(range(4))
    # every line parses back to the original rows
    back = spark.read.json(out + "/__shard=*")
    assert back.count() == docs.count()
    orig = {r["doc_id"]: (r["text"], r["lang"]) for r in docs.collect()}
    got = {r["doc_id"]: (r["text"], r["lang"]) for r in back.collect()}
    assert got == orig
    # deterministic membership across re-export
    m2 = {r["shard"]: r["n_rows"]
          for r in write_jsonl_shards(docs, out, "doc_id", 4).collect()}
    assert m2 == m
    with pytest.raises(ValueError, match="n_shards"):
        write_jsonl_shards(docs, str(tmp_path / "x"), "doc_id", 0)
