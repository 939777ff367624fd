"""Physical-plan regression guards: the properties that make the plans
scale must stay visible in explain output — column pruning, predicate
pushdown, broadcast dim joins, no duplicated aggregate subtree in the
one-pass flagship, and a single shuffle for the single-pass shape."""

import re

from building_permissions_etl_spark.plans.flagship import (
    flagship_merge_shape,
    flagship_single_pass,
)

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_flagship_scan_prunes_columns(spark):
    plan = _plan(flagship_single_pass(spark, SF))
    scans = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    li = [s for s in scans if "l_suppkey" in s]
    assert li, plan
    # 4 of lineitem's 16 columns — projection reached the scan
    assert all(len(s.split(",")) == 4 for s in li), li


def test_flagship_pushes_filters(spark):
    plan = _plan(flagship_single_pass(spark, SF))
    assert "PushedFilters: [" in plan
    assert re.search(r"PushedFilters: \[[^\]]*IsNotNull", plan), plan


def test_flagship_broadcasts_dims(spark):
    plan = _plan(flagship_single_pass(spark, SF))
    assert "BroadcastHashJoin" in plan
    # the fact side must never sort-merge against a dim
    assert "SortMergeJoin Inner" not in plan, plan


def test_single_pass_aggregates_once(spark):
    """The fused LEFT JOIN completion evaluates the aggregate subtree
    once; the parity merge shape (union completion) pays for it twice."""
    # merge_shape caches its base: a warm cache from earlier tests would
    # replace the parquet scans this test counts with InMemoryTableScans
    spark.catalog.clearCache()
    one = _plan(flagship_single_pass(spark, SF))
    twice = _plan(flagship_merge_shape(spark, SF))
    n_li_scans_one = len(re.findall(r"lineitem\.parquet", one))
    n_li_scans_twice = len(re.findall(r"lineitem\.parquet", twice))
    assert n_li_scans_one < n_li_scans_twice
    # exactly one grouped aggregation pair (partial+final) over the fact
    assert one.count("HashAggregate") <= 4, one


def test_month_partition_pruning_on_fact_layout(spark, tmp_path):
    """The month-partitioned fact layout must prune: a month-filtered
    read shows PartitionFilters and scans only the matching partition."""
    import datetime as dt

    from pyspark.sql import functions as F

    from building_permissions_etl_spark.sources.sinks import write_fact_partitioned

    rows = [
        (i, dt.datetime(2022, 1 + i % 6, 3), f"14650{i % 10}1")
        for i in range(600)
    ]
    df = spark.createDataFrame(rows, "id long, event_ts timestamp, terc string")
    path = str(tmp_path / "fact")
    write_fact_partitioned(df, path, "event_ts", "terc")

    q = spark.read.parquet(path).filter(F.col("month") == "2022-03")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "2022-03" in plan, plan
    assert q.count() == 100
    # data-level sanity: only March rows came back
    months = [r[0] for r in q.select("month").distinct().collect()]
    assert months == ["2022-03"]


def test_asof_join_shuffles_once(spark):
    """The as-of composition's cost claim: ONE exchange (the per-key
    window), not an inequality-join nested loop."""
    import datetime as dt

    from building_permissions_etl_spark.operators.asof import asof_join_backward

    left = spark.createDataFrame(
        [(1, "a", dt.datetime(2024, 1, 1))], "id long, k string, ts timestamp"
    )
    right = spark.createDataFrame(
        [("a", dt.datetime(2024, 1, 1), 1.0)], "k string, ts timestamp, v double"
    )
    plan = _plan(asof_join_backward(left, right, "k", "ts", "ts", ["v"]))
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "NestedLoop" not in plan, plan


def test_forecast_revenue_full_pushdown(spark):
    from building_permissions_etl_spark.plans.registry import queries

    plan = _plan(queries()["forecast_revenue"](spark, SF))
    # toString truncates long filter lists with '…' — bound the segment
    # by the ReadSchema field instead of the closing bracket
    pushed = re.search(r"PushedFilters: \[(.*?), ReadSchema:", plan)
    assert pushed, plan
    for frag in ("l_shipdate", "l_discount", "l_quantity"):
        assert frag in pushed.group(1), pushed.group(1)
    scans = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    assert any(len(s.split(",")) == 4 for s in scans), scans


def test_order_priority_semi_join_builds_on_aggregate(spark):
    """The semi join's build side must be the per-order max-shipdate
    AGGREGATE, never the raw lineitem fact (the scale-fragile shape a
    misestimated broadcast OOMs on — fixed after the sf0.1 sweep)."""
    from building_permissions_etl_spark.plans.registry import queries

    plan = _plan(queries()["order_priority_checking"](spark, SF))
    assert "LeftSemi" in plan, plan
    # the lineitem subtree feeding the join carries a partial max
    assert "partial_max" in plan or "max(l_shipdate" in plan, plan


def test_tpch_fact_joins_never_cartesian_and_dims_broadcast(spark):
    from building_permissions_etl_spark.plans.registry import queries

    qs = queries()
    for name in ("volume_shipping", "national_market_share",
                 "returned_items_report", "min_cost_supplier_per_part"):
        plan = _plan(qs[name](spark, SF))
        assert "CartesianProduct" not in plan, name
        assert "BroadcastHashJoin" in plan, name


def test_mixture_resample_keep_filter_is_mapside(spark):
    """The corpus-side keep decision must be a broadcast join + filter —
    no shuffle of the documents rows themselves (only the few-row
    per-group counts aggregate may exchange)."""
    from building_permissions_etl_spark.plans.registry import queries

    plan = _plan(queries()["mixture_resample_counts"](spark, SF))
    # documents scan must not feed an Exchange before the join: every
    # hashpartitioning exchange in the plan keys on the group/agg side
    pre_agg_exchanges = re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan)
    for keys in pre_agg_exchanges:
        assert "doc_id" not in keys, plan


def test_lsh_index_table_probe_prunes_partitions(spark, tmp_path):
    """An LSH index persisted as a __bucket-partitioned table must give
    query_lsh's driver-enumerated isin probe PLANNING-time pruning: the
    scan's PartitionFilters carry the probe IN-list, so only the probed
    bucket directories are read — not the corpus. Results must equal the
    in-memory index's exactly."""
    from building_permissions_etl_spark.catalog import load_table
    from building_permissions_etl_spark.operators.similarity import (
        build_lsh_index,
        query_lsh,
        read_lsh_index,
        write_lsh_index,
    )

    emb = load_table(spark, "embeddings", SF)
    path = str(tmp_path / "lsh_index")
    write_lsh_index(emb, "embedding", path)
    table = read_lsh_index(spark, path)

    q = query_lsh(table, "embedding", "vec_id", query_id=3, k=5)
    plan = q._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[[^\]]*__bucket[^\]]*IN", plan)
    assert m, plan

    mem = build_lsh_index(emb, "embedding", "vec_id")
    try:
        expect = [tuple(r) for r in
                  query_lsh(mem, "embedding", "vec_id", query_id=3, k=5).collect()]
    finally:
        mem.unpersist()
    assert [tuple(r) for r in q.collect()] == expect


def test_ivf_index_table_probe_prunes_partitions(spark, tmp_path):
    """Same planning-time pruning contract for the portable-IVF layout:
    the __cell-partitioned table's scan must show the n_probe IN-list in
    PartitionFilters and match the in-memory index's results."""
    from building_permissions_etl_spark.catalog import load_table
    from building_permissions_etl_spark.operators.similarity import (
        build_ivf_index_portable,
        query_ivf_portable,
        write_ivf_index_portable,
    )

    emb = load_table(spark, "embeddings", SF)
    path = str(tmp_path / "ivf_index")
    cents = write_ivf_index_portable(emb, "embedding", path)
    table = spark.read.parquet(path)

    q = query_ivf_portable(table, cents, "embedding", "vec_id",
                           query_id=3, k=5)
    plan = q._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[[^\]]*__cell[^\]]*IN", plan)
    assert m, plan

    mem, cents2 = build_ivf_index_portable(emb, "embedding")
    try:
        assert cents2 == cents
        expect = [tuple(r) for r in query_ivf_portable(
            mem, cents2, "embedding", "vec_id", query_id=3, k=5).collect()]
    finally:
        mem.unpersist()
    assert [tuple(r) for r in q.collect()] == expect


def test_batched_ann_scans_corpus_once(spark):
    """topk_bruteforce_batch must cost exactly ONE scan of the corpus
    relation in the scoring plan: the M query vectors are fetched
    driver-side (a bounded pushed-isin read at call time) and
    re-broadcast as a literal frame, so neither a validation action nor
    the broadcast build re-reads the embeddings table."""
    from building_permissions_etl_spark.catalog import load_table
    from building_permissions_etl_spark.operators.similarity import (
        topk_bruteforce_batch,
    )

    emb = load_table(spark, "embeddings", SF)
    q = topk_bruteforce_batch(emb, "embedding", "vec_id", [0, 1, 2], k=3)
    plan = _plan(q)
    scans = re.findall(r"Scan parquet|FileScan parquet", plan)
    assert len(scans) == 1, plan


def test_assign_nearest_seed_literal_path_is_projection(spark):
    """Under SEED_LITERAL_CAP the nearest-seed argmin is ONE narrow
    projection over the corpus scan (round 14, guide §2.4): the seeds
    are plan literals, so there is no join, no aggregate and no
    exchange anywhere in the assignment."""
    from building_permissions_etl_spark.catalog import load_table
    from building_permissions_etl_spark.operators.similarity import (
        assign_nearest_seed,
    )
    from pyspark.sql import functions as F

    emb = load_table(spark, "embeddings", SF)
    seeds = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("seed_id"), F.col("embedding").alias("sv"))
    plan = _plan(assign_nearest_seed(emb, "embedding", "vec_id", seeds))
    assert "row_number" not in plan, plan
    assert "Exchange" not in plan, plan
    assert "Join" not in plan and "CartesianProduct" not in plan, plan
    scans = re.findall(r"Scan parquet|FileScan parquet", plan)
    assert len(scans) == 1, plan


def test_assign_nearest_seed_fallback_partial_argmin_before_exchange(
        spark, monkeypatch):
    """Past the cap the join path is unchanged: a declarative min_by
    aggregation whose PARTIAL pass runs before the exchange — each
    vector's k scored rows collapse to one inside the map task, so the
    shuffle moves N rows, not k·N (round 6 used a row_number window,
    which shuffled the full cross product)."""
    from building_permissions_etl_spark.catalog import load_table
    from building_permissions_etl_spark.operators import similarity
    from pyspark.sql import functions as F

    monkeypatch.setattr(similarity, "SEED_LITERAL_CAP", 0)
    emb = load_table(spark, "embeddings", SF)
    seeds = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("seed_id"), F.col("embedding").alias("sv"))
    plan = _plan(similarity.assign_nearest_seed(
        emb, "embedding", "vec_id", seeds))
    assert "row_number" not in plan, plan
    i_partial = plan.find("partial_min_by")
    i_exchange = plan.find("Exchange hashpartitioning(vec_id")
    assert i_partial != -1 and i_exchange != -1, plan
    # explain prints top-down: the partial aggregate must sit BELOW
    # (later in the text than) the exchange that feeds the final agg
    assert i_partial > i_exchange, plan


def test_assign_nearest_seed_literal_path_matches_join_path(
        spark, monkeypatch):
    """Value identity of the two shapes on real data: literal-path rows
    (seed_id AND rounded dist2) equal the join path's bit-for-bit."""
    from building_permissions_etl_spark.catalog import load_table
    from building_permissions_etl_spark.operators import similarity
    from pyspark.sql import functions as F

    emb = load_table(spark, "embeddings", SF)
    seeds = emb.filter(F.col("vec_id") < 7).select(
        F.col("vec_id").alias("seed_id"), F.col("embedding").alias("sv"))
    fast = similarity.assign_nearest_seed(
        emb, "embedding", "vec_id", seeds).select(
        "vec_id", "seed_id", "dist2").orderBy("vec_id").collect()
    monkeypatch.setattr(similarity, "SEED_LITERAL_CAP", 0)
    slow = similarity.assign_nearest_seed(
        emb, "embedding", "vec_id", seeds).select(
        "vec_id", "seed_id", "dist2").orderBy("vec_id").collect()
    assert fast == slow and len(fast) > 0


def test_ivf_index_append_equals_rebuild(spark, tmp_path):
    """Incremental index maintenance: writing the base half then
    APPENDING the delta half must leave a table whose query results —
    and whose per-cell row sets — are byte-identical to a full
    rebuild, because cell assignment is per-vector against
    deterministic centroid literals (append-equals-rebuild bought
    structurally, no merge step)."""
    from building_permissions_etl_spark.catalog import load_table
    from building_permissions_etl_spark.operators.similarity import (
        append_ivf_index_portable,
        query_ivf_portable,
        write_ivf_index_portable,
    )

    emb = load_table(spark, "embeddings", SF)
    inc_path = str(tmp_path / "ivf_inc")
    full_path = str(tmp_path / "ivf_full")
    cents = write_ivf_index_portable(
        emb.filter("vec_id % 2 = 0"), "embedding", inc_path)
    cents2 = append_ivf_index_portable(
        emb.filter("vec_id % 2 = 1"), "embedding", inc_path)
    assert cents2 == cents
    write_ivf_index_portable(emb, "embedding", full_path)

    inc = spark.read.parquet(inc_path)
    full = spark.read.parquet(full_path)
    assert sorted((r["vec_id"], r["__cell"])
                  for r in inc.select("vec_id", "__cell").collect()) \
        == sorted((r["vec_id"], r["__cell"])
                  for r in full.select("vec_id", "__cell").collect())
    for qid in (3, 10):
        a = [tuple(r) for r in query_ivf_portable(
            inc, cents, "embedding", "vec_id", query_id=qid, k=5).collect()]
        b = [tuple(r) for r in query_ivf_portable(
            full, cents, "embedding", "vec_id", query_id=qid, k=5).collect()]
        assert a == b


def test_lsh_index_append_equals_rebuild(spark, tmp_path):
    """Same structural append-equals-rebuild contract for the LSH
    layout, including the planning-time partition pruning surviving
    the append (the probe IN-list must still land in
    PartitionFilters over the appended table)."""
    from building_permissions_etl_spark.catalog import load_table
    from building_permissions_etl_spark.operators.similarity import (
        append_lsh_index,
        query_lsh,
        write_lsh_index,
    )

    emb = load_table(spark, "embeddings", SF)
    inc_path = str(tmp_path / "lsh_inc")
    full_path = str(tmp_path / "lsh_full")
    write_lsh_index(emb.filter("vec_id % 2 = 0"), "embedding", inc_path)
    append_lsh_index(emb.filter("vec_id % 2 = 1"), "embedding", inc_path)
    write_lsh_index(emb, "embedding", full_path)

    inc, full = spark.read.parquet(inc_path), spark.read.parquet(full_path)
    assert sorted((r["vec_id"], r["__bucket"])
                  for r in inc.select("vec_id", "__bucket").collect()) \
        == sorted((r["vec_id"], r["__bucket"])
                  for r in full.select("vec_id", "__bucket").collect())
    q = query_lsh(inc, "embedding", "vec_id", query_id=3, k=5)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"PartitionFilters: \[[^\]]*__bucket[^\]]*IN", plan), plan
    assert [tuple(r) for r in q.collect()] == [
        tuple(r) for r in
        query_lsh(full, "embedding", "vec_id", query_id=3, k=5).collect()]
