"""Iterative graph analytics over edge DataFrames.

The reference pipeline has no graph surface (its only iterative
construct is the pandas groupby loop in dags/aggregates_python.py); this
module adds the canonical distributed-graph building block — a
fixed-iteration PageRank — in the shape it must take on a real cluster:
the edge list is a pre-aggregated DataFrame, every iteration is one
equi-join (rank → out-edges) plus one aggregation keyed on the
destination, and node state never leaves the executors.

All rank arithmetic is FIXED-POINT INTEGER (``scale`` units of mass,
integer division throughout), which buys two properties floats cannot
give:

  * determinism across engines AND across partitionings — integer sums
    are order-independent, so the same graph produces bit-identical
    ranks on Spark and on the DuckDB oracle, no tolerance needed;
  * stability at scale — re-running with different shuffle partition
    counts cannot perturb ranks, so downstream top-k cuts are stable.

The cost is truncation: each division floors, so total mass decays by
at most (n_edges + n_nodes) units per iteration — at scale=1e12 that is
a relative error < 1e-6 for any graph under a million edges per node,
far below ranking-relevant differences. Dangling-node mass (nodes with
no out-edges) is dropped, not redistributed — the simplest of the
standard variants (Page et al. 1999 §2.6 discusses the choices); the
oracle replicates the identical rule.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Small-graph short-circuit (round 14, guide §1.2 "fix the distributed
# algorithm first"): the iterative operators below run 1-2 shuffles per
# iteration, which over a dim-sized graph (the 25-node trade graph) is
# pure scheduling overhead — the same observation behind dedup.py's
# connected-components short-circuit. Each operator first probes its
# edge and node frames with limit(cap+1): if BOTH fit under the cap the
# recurrence is replayed on the driver in exact integer arithmetic
# (bit-identical to the distributed loop — every divide the loops do is
# on non-negative operands, where Spark's truncating `div` equals
# Python's floor `//`) and returned as a literal frame; otherwise the
# distributed loop runs unchanged. The edge probe runs against the
# loop's own CACHED edge frame, so its work is never wasted: an
# under-cap probe is the one materialization the loop would have paid
# (the cache is unpersisted after the replay), and an over-cap probe
# leaves the cache warm for the loop (review r14). 0 disables.
GRAPH_DRIVER_CAP = int(os.environ.get("SPARK_GRAFT_GRAPH_DRIVER_CAP",
                                      "100000"))


def _under_cap(df: DataFrame, cap: int) -> list | None:
    """``df``'s rows iff it has at most ``cap`` of them, else None."""
    rows = df.limit(cap + 1).collect()
    return None if len(rows) > cap else rows


def pagerank_fixed_point(
    edges: DataFrame,
    nodes: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    node_col: str = "id",
    n_iter: int = 6,
    scale: int = 10**12,
    damping: tuple[int, int] = (85, 100),
    n_nodes: int | None = None,
) -> DataFrame:
    """Weighted PageRank after ``n_iter`` synchronous iterations, in
    integer fixed-point: returns (id, pr_fixed) where pr_fixed is the
    rank mass in ``1/scale`` units.

    Per iteration each node sends ``(pr * w) div outw`` along every
    out-edge and collects ``base + (d_num * Σ incoming) div d_den``
    where ``base = ((d_den - d_num) * (scale div N)) div d_den`` — the
    uniform teleport share. All operands stay BIGINT; callers must keep
    ``max(pr) * max(edge weight) < 2^63`` (pr ≤ scale by construction,
    so any per-edge weight below ~9·10^6 at the default scale is safe;
    pre-normalize heavier weights).

    Scale shape: one shuffle per iteration on ``dst`` plus the
    rank-side equi-join on ``src``. The iteration-invariant frames —
    the normalized edge list (built in ONE pass over ``edges``: the
    per-source out-weight is a window sum, not a groupBy+self-join) and
    the node-id list — are ``.cache()``d, so the executed plan
    materializes each exactly once and every iteration reads the
    InMemoryRelation instead of replaying the caller's edge lineage
    n_iter times (round 6 shipped without this and re-ran a fact×fact
    join 12× per query; tests/test_graph.py pins one materialization
    with a pass-count accumulator and a zero-non-cached-fact-scan plan
    walk). The caches are CacheManager-visible — LRU-evictable under
    memory pressure with lineage recompute, never a leak class; callers
    running many graphs can ``spark.catalog.clearCache()`` between
    them. ``n_nodes`` avoids the dim-sized count() action when the
    caller already knows the node count.
    """
    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1, got {n_iter}")
    d_num, d_den = damping
    if not 0 < d_num < d_den:
        raise ValueError(f"damping must satisfy 0 < num < den, got {damping}")
    # Integral weights are a CONTRACT, not a convenience: __w is cast to
    # bigint per-row BEFORE the out-weight window sum, so a fractional
    # weight column would silently truncate per-edge (and diverge from
    # the SQL oracle twin, which sums raw then divides). Reject rather
    # than guess — callers with float weights pre-quantize explicitly.
    wtype = dict(edges.dtypes)[weight]
    if wtype not in ("tinyint", "smallint", "int", "bigint"):
        raise ValueError(
            f"weight column {weight!r} must be an integral type, got "
            f"{wtype}; pre-quantize float weights (e.g. floor(w * 10^k)) "
            f"so per-edge truncation is explicit and engine-portable")

    e = (
        edges.select(
            F.col(src).alias("__src"),
            F.col(dst).alias("__dst"),
            F.col(weight).cast("bigint").alias("__w"),
        )
        .withColumn(
            "__outw", F.sum("__w").over(Window.partitionBy("__src"))
        )
        .cache()
    )
    lit = _pagerank_driver(e, nodes, node_col, n_iter, scale,
                           d_num, d_den, n_nodes)
    if lit is not None:
        e.unpersist()
        return lit

    n = n_nodes if n_nodes is not None else nodes.count()
    if n <= 0:
        raise ValueError("nodes frame is empty")
    init = scale // n
    base = ((d_den - d_num) * init) // d_den

    ids = nodes.select(F.col(node_col).alias("__id")).cache()
    pr = ids.select("__id", F.lit(init).cast("bigint").alias("__pr"))
    for _ in range(n_iter):
        contrib = e.join(pr, e["__src"] == pr["__id"]).select(
            F.col("__dst"),
            F.expr("(__pr * __w) div __outw").alias("__c"),
        )
        s = contrib.groupBy("__dst").agg(F.sum("__c").alias("__s"))
        pr = ids.join(s, ids["__id"] == s["__dst"], "left").select(
            "__id",
            (
                F.lit(base)
                + F.expr(f"({d_num} * coalesce(__s, 0L)) div {d_den}")
            ).cast("bigint").alias("__pr"),
        )
    return pr.select(
        F.col("__id").alias(node_col), F.col("__pr").alias("pr_fixed")
    )


def _pagerank_driver(e, nodes, node_col, n_iter,
                     scale, d_num, d_den, n_nodes) -> DataFrame | None:
    """Driver replay of the PageRank recurrence iff the graph fits under
    ``GRAPH_DRIVER_CAP``, else None. Bit-identical to the loop: same
    per-edge ``(pr * w) div outw`` (non-negative weights are required for
    `div` == `//`; a negative weight falls back to the loop), same
    NULL-dropping join/aggregate semantics, same teleport fold. Node ids
    must be unique (duplicate id rows would double-join contributions in
    the loop; the replay falls back rather than reproduce that).

    ``e`` is the loop's own CACHED normalized edge frame (__src, __dst,
    __w, __outw) — probing it means a failed probe's work is retained in
    the cache the loop reads, so the over-cap fallback costs nothing
    extra (review r14); a successful probe unpersists it at the call
    site."""
    cap = GRAPH_DRIVER_CAP
    if cap <= 0:
        return None
    id_rows = _under_cap(nodes.select(F.col(node_col).alias("i")), cap)
    if id_rows is None:
        return None
    ids = [r["i"] for r in id_rows]
    if len(set(ids)) != len(ids):
        return None
    e_rows = _under_cap(e, cap)
    if e_rows is None or any(r["__w"] is not None and r["__w"] < 0
                             for r in e_rows):
        return None
    n = n_nodes if n_nodes is not None else len(ids)
    if n <= 0:
        raise ValueError("nodes frame is empty")
    init = scale // n
    base = ((d_den - d_num) * init) // d_den
    pr = {i: init for i in ids}
    for _ in range(n_iter):
        acc: dict = {}
        for r in e_rows:
            s, d, w, ow = r["__src"], r["__dst"], r["__w"], r["__outw"]
            if s is None or d is None or w is None:
                continue          # null keys match nothing in the joins
            p = pr.get(s)
            if p is None:
                continue          # source outside the node set
            if not ow:
                continue          # div-by-zero/NULL -> dropped by sum
            acc[d] = acc.get(d, 0) + (p * w) // ow
        pr = {i: base + (d_num * acc.get(i, 0)) // d_den for i in ids}
    schema = T.StructType([
        T.StructField(node_col, nodes.schema[node_col].dataType),
        T.StructField("pr_fixed", T.LongType()),
    ])
    return nodes.sparkSession.createDataFrame(
        [(i, pr[i]) for i in ids], schema=schema)


def pagerank_fixed_point_sql(
    edges_sql: str,
    nodes_sql: str,
    n_iter: int = 6,
    scale: int = 10**12,
    damping: tuple[int, int] = (85, 100),
) -> str:
    """DuckDB oracle twin: unrolled CTE chain replaying the identical
    integer recurrence. ``edges_sql`` must yield (src, dst, w) and
    ``nodes_sql`` (id,). Emitted as chained CTEs rather than a recursive
    CTE so the aggregation inside each step stays plain ANSI."""
    d_num, d_den = damping
    steps = [
        f"""ow AS (SELECT src, sum(w) AS outw FROM e GROUP BY 1),
        nd AS ({nodes_sql}),
        c AS (SELECT CAST({scale} AS BIGINT)
                     // (SELECT count(*) FROM nd) AS init),
        pr0 AS (SELECT id, (SELECT init FROM c) AS pr FROM nd)"""
    ]
    for i in range(1, n_iter + 1):
        steps.append(f"""pr{i} AS (
          SELECT nd.id,
                 CAST((({d_den - d_num} * (SELECT init FROM c)) // {d_den})
                      + ({d_num} * coalesce(s.s, 0)) // {d_den}
                      AS BIGINT) AS pr
          FROM nd LEFT JOIN (
            SELECT e.dst AS id,
                   CAST(sum((p.pr * e.w) // ow.outw) AS BIGINT) AS s
            FROM e JOIN ow USING (src) JOIN pr{i - 1} p ON p.id = e.src
            GROUP BY 1) s USING (id))""")
    body = ",\n        ".join(steps)
    return f"""
        WITH e AS ({edges_sql}),
        {body}
        SELECT id, pr AS pr_fixed FROM pr{n_iter}
    """


def triangle_counts_per_node(
    edges: DataFrame,
    nodes: DataFrame,
    node_col: str = "id",
    a: str = "a",
    b: str = "b",
) -> DataFrame:
    """Per-node triangle counts over an UNDIRECTED simple graph, via
    degree-ordered orientation (Suri & Vassilvitskii, WWW 2011 — public
    MapReduce triangle-counting recipe; no reference twin, helpers:*
    has no graph surface).

    ``edges`` must hold each undirected edge ONCE (a < b canonical, no
    self-loops); ``nodes`` provides the id universe for zero-fill.
    Orienting every edge from its lower-(degree, id) endpoint to the
    higher one makes each triangle the closure of exactly ONE wedge,
    and bounds wedge fan-out by the oriented out-degree (O(sqrt(m)))
    instead of the raw degree — the skew-proof property that keeps a
    star node from emitting O(d^2) wedge candidates.

    Scale shape: the edge list is ``.cache()``d so the caller's (often
    fact-join-heavy) lineage materializes ONCE — degrees, orientation,
    and the wedge join all read the InMemoryRelation (the round-6
    PageRank lesson, applied at authoring time). Corner attribution is
    one ``explode`` over the closed-triangle frame — NOT a 3-way union
    of the wedge join, which would replay it three times. Joins are on
    node ids; AQE broadcasts the degree side when it is small. The
    cache is CacheManager-visible: LRU-evictable under pressure,
    recomputed from lineage, never a leak class.
    """
    e = edges.select(F.col(a).alias("__a"), F.col(b).alias("__b")).cache()
    deg = (
        e.select(F.col("__a").alias("__n"))
        .unionAll(e.select(F.col("__b").alias("__n")))
        .groupBy("__n")
        .agg(F.count(F.lit(1)).alias("__d"))
    )
    da = deg.select(F.col("__n").alias("__a"), F.col("__d").alias("__da"))
    db = deg.select(F.col("__n").alias("__b"), F.col("__d").alias("__db"))
    a_first = (F.struct(F.col("__da"), F.col("__a"))
               < F.struct(F.col("__db"), F.col("__b")))
    oriented = (
        e.join(da, "__a")
        .join(db, "__b")
        .select(
            F.when(a_first, F.col("__a")).otherwise(F.col("__b")).alias("__u"),
            F.when(a_first, F.col("__b")).otherwise(F.col("__a")).alias("__v"),
        )
        .cache()
    )
    e1 = oriented.select(F.col("__u").alias("__x"), F.col("__v").alias("__y"))
    e2 = oriented.select(F.col("__u").alias("__y"), F.col("__v").alias("__z"))
    e3 = oriented.select(F.col("__u").alias("__x"), F.col("__v").alias("__z"))
    tri = e1.join(e2, "__y").join(e3, ["__x", "__z"])
    corners = tri.select(
        F.explode(F.array("__x", "__y", "__z")).alias("__node"))
    ids = nodes.select(F.col(node_col).alias("__id"))
    return (
        ids.join(corners, ids["__id"] == corners["__node"], "left")
        .groupBy("__id")
        .agg(F.count("__node").cast("bigint").alias("n_triangles"))
        .select(F.col("__id").alias(node_col), "n_triangles")
    )


def label_propagation(
    edges: DataFrame,
    nodes: DataFrame,
    node_col: str = "id",
    a: str = "a",
    b: str = "b",
    n_iter: int = 3,
) -> DataFrame:
    """Community detection by synchronous label propagation (Raghavan
    et al. 2007; no reference twin — helpers:* has no graph surface)
    after exactly ``n_iter`` iterations: every node starts labeled with
    its own id; each round it adopts the most frequent label among its
    neighbors, ties broken to the SMALLEST label, isolated nodes keep
    theirs. Fixed iteration count + full-order tiebreak makes the
    result deterministic and engine-portable (plain LPA's random
    tie/order dependence is what usually makes it irreproducible).

    Scale shape: the undirected edge list is doubled into directed
    form ONCE and ``.cache()``d — each iteration re-reads the
    InMemoryRelation, never the caller's lineage (the PageRank /
    triangle materialization rule). Per iteration: one shuffle keyed
    on the receiving node for the (node, label) count, one window over
    the same key for the argmax — Spark reuses the exchange. Label
    state is one row per node, joined to edges by key; nothing is
    collected to the driver. Each round's label frame is ``.cache()``d
    because the next round references it TWICE (the edge join and the
    keep-own-label fallback): uncached, the branch count doubles per
    round — 2^n plan blowup for a linear algorithm.

    Residue contract (round-8 advice): each round's label frame is
    eagerly materialized (one count job over the node-sized state —
    which would be computed by the caller's final action anyway, just
    in one piece) and its PREDECESSOR is unpersisted right after, so a
    call retains exactly TWO cached frames (directed edges + final
    labels) instead of n_iter+1 — long-lived sessions running many
    graphs no longer depend on ``spark.catalog.clearCache()``. The
    final frame stays cached because the returned DataFrame's action
    reads it; it is CacheManager-visible and LRU-evictable with
    lineage recompute, never a leak class.
    """
    e = edges.select(F.col(a).alias("__s"), F.col(b).alias("__d"))
    directed = e.unionAll(
        e.select(F.col("__d").alias("__s"), F.col("__s").alias("__d"))
    ).cache()
    lit = _lpa_driver(directed, nodes, node_col, n_iter)
    if lit is not None:
        directed.unpersist()
        return lit
    labels = nodes.select(F.col(node_col).alias("__id"),
                          F.col(node_col).cast("bigint").alias("__lbl"))
    pick = Window.partitionBy("__d").orderBy(F.desc("__cnt"), "__nlbl")
    prev = None
    for _ in range(n_iter):
        nbr = (
            directed.join(labels, directed["__s"] == labels["__id"])
            .groupBy(F.col("__d"), F.col("__lbl").alias("__nlbl"))
            .agg(F.count(F.lit(1)).alias("__cnt"))
        )
        best = (
            nbr.withColumn("__rn", F.row_number().over(pick))
            .filter(F.col("__rn") == 1)
            .select(F.col("__d").alias("__bid"), F.col("__nlbl"))
        )
        labels = (
            labels.join(best, labels["__id"] == best["__bid"], "left")
            .select(
                "__id",
                F.coalesce("__nlbl", "__lbl").cast("bigint").alias("__lbl"),
            )
            .cache()
        )
        labels.count()          # materialize this round's cache
        if prev is not None:
            prev.unpersist(blocking=True)  # predecessor superseded
        prev = labels
    return labels.select(F.col("__id").alias(node_col),
                         F.col("__lbl").alias("community"))


def _lpa_driver(directed_df, nodes, node_col, n_iter) -> DataFrame | None:
    """Driver replay of synchronous label propagation iff the graph fits
    under ``GRAPH_DRIVER_CAP``, else None. Same recurrence: every node
    adopts the most frequent neighbor label (ties to the smallest),
    isolated nodes keep theirs; null endpoints drop out exactly as null
    join keys do. Requires integer node ids that are unique (the loop's
    ``cast('bigint')`` on other types and duplicate-id join fan-out are
    not replicated — those fall back).

    ``directed_df`` is the loop's own CACHED doubled edge frame (__s,
    __d) — probing it retains a failed probe's work in the cache the
    loop reads (review r14); a successful probe unpersists it at the
    call site. The cap applies to undirected edges, so the probe limit
    is 2·cap on the doubled frame."""
    cap = GRAPH_DRIVER_CAP
    if cap <= 0:
        return None
    id_rows = _under_cap(nodes.select(F.col(node_col).alias("i")), cap)
    if id_rows is None:
        return None
    ids = [r["i"] for r in id_rows]
    if (len(set(ids)) != len(ids)
            or not all(isinstance(i, int) for i in ids)):
        return None
    e_rows = _under_cap(directed_df, 2 * cap)
    if e_rows is None:
        return None
    directed = [(r["__s"], r["__d"]) for r in e_rows]
    labels = {i: i for i in ids}
    for _ in range(n_iter):
        cnt: dict = {}
        for s, d in directed:
            if s is None or d is None:
                continue
            lbl = labels.get(s)
            if lbl is None:
                continue          # source outside the node set
            key = (d, lbl)
            cnt[key] = cnt.get(key, 0) + 1
        best: dict = {}
        for (d, lbl), c in cnt.items():
            cur = best.get(d)
            if cur is None or c > cur[0] or (c == cur[0] and lbl < cur[1]):
                best[d] = (c, lbl)
        labels = {i: best[i][1] if i in best else labels[i] for i in ids}
    schema = T.StructType([
        T.StructField(node_col, nodes.schema[node_col].dataType),
        T.StructField("community", T.LongType()),
    ])
    return nodes.sparkSession.createDataFrame(
        [(i, labels[i]) for i in ids], schema=schema)


def k_core_peel(
    edges: DataFrame,
    nodes: DataFrame,
    k: int,
    node_col: str = "id",
    a: str = "a",
    b: str = "b",
    n_rounds: int = 3,
) -> DataFrame:
    """``n_rounds`` of k-core peeling (Seidman 1983 degeneracy cores)
    over an undirected simple graph: each round removes every node
    whose degree in the SURVIVING subgraph is below ``k``, then the
    edges touching it. Fixed round count keeps the result
    deterministic and oracle-expressible (full peeling to fixpoint
    needs a data-dependent iteration count; callers wanting the true
    k-core loop until the round removes nothing — each round is the
    same two joins).

    Returns (node_col, in_core, degree): every input node with a flag
    for surviving all rounds and its degree in the surviving subgraph
    (0 for peeled nodes).

    ``edges`` must hold each undirected edge ONCE (canonical a < b, no
    self-loops — the triangle-operator contract), because the
    (a, b) pair is the edge's identity inside each round.

    Scale shape: a peel round is JOIN-FREE — explode each edge into
    its two endpoint rows, a window count over the endpoint key gives
    both degrees, and a group-back on the (a, b) pair keeps edges
    whose MIN endpoint degree reaches k. Two shuffles per round (the
    window and the group-back), zero broadcast builds; the
    join-per-side formulation measured ~9× slower on the tiny trade
    graph purely from per-round AQE broadcast jobs. Each round's
    surviving edge list is ``.cache()``d — the next round references
    its predecessor through both the explode and the group-back, and
    the final degree pass reads it again: uncached, the re-execution
    count grows geometrically for a linear algorithm.

    Residue contract (round-8 advice): each round's surviving edge
    list is eagerly materialized and its predecessor unpersisted, so a
    call retains ONE cached frame (the last round's survivors) rather
    than n_rounds+1 — same rationale as ``label_propagation``.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1 (k=0 peels nothing and a "
                         f"negative k is meaningless), got {k}")
    if n_rounds < 0:
        raise ValueError(f"n_rounds must be >= 0, got {n_rounds}")
    live = edges.select(F.col(a).alias("__a"), F.col(b).alias("__b")).cache()
    lit = _kcore_driver(live, nodes, k, node_col, n_rounds)
    if lit is not None:
        live.unpersist()
        return lit

    for _ in range(n_rounds):
        pts = live.select(
            "__a", "__b",
            F.explode(F.array("__a", "__b")).alias("__n"))
        per_endpoint = pts.withColumn(
            "__d", F.count(F.lit(1)).over(Window.partitionBy("__n")))
        prev = live
        live = (
            per_endpoint.groupBy("__a", "__b")
            .agg(F.min("__d").alias("__mind"))
            .filter(F.col("__mind") >= k)
            .select("__a", "__b")
            .cache()
        )
        live.count()        # materialize this round's cache
        prev.unpersist(blocking=True)  # predecessor superseded
    final_deg = (
        live.select(F.explode(F.array("__a", "__b")).alias("__n"))
        .groupBy("__n")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__d"))
    )
    ids = nodes.select(F.col(node_col).alias("__id"))
    return (
        ids.join(final_deg, ids["__id"] == final_deg["__n"], "left")
        .select(
            F.col("__id").alias(node_col),
            F.col("__n").isNotNull().alias("in_core"),
            F.coalesce("__d", F.lit(0)).cast("bigint").alias("degree"),
        )
    )


def _kcore_driver(live_df, nodes, k, node_col,
                  n_rounds) -> DataFrame | None:
    """Driver replay of the peel rounds iff the graph fits under
    ``GRAPH_DRIVER_CAP``, else None. Exact under the operator's own
    contract (each undirected edge once, canonical a < b): duplicate
    edge rows or null endpoints — which the window/group-back pipeline
    treats in its own way — fall back to the loop.

    ``live_df`` is the loop's own CACHED round-0 edge frame (__a, __b),
    so a failed probe's work is retained in the cache the loop reads
    (review r14); a successful probe unpersists it at the call site."""
    cap = GRAPH_DRIVER_CAP
    if cap <= 0:
        return None
    id_rows = _under_cap(nodes.select(F.col(node_col).alias("i")), cap)
    if id_rows is None:
        return None
    ids = [r["i"] for r in id_rows]
    e_rows = _under_cap(live_df, cap)
    if e_rows is None:
        return None
    live = [(r["__a"], r["__b"]) for r in e_rows]
    if (any(s is None or d is None for s, d in live)
            or len(set(live)) != len(live)):
        return None
    for _ in range(n_rounds):
        deg: dict = {}
        for s, d in live:
            deg[s] = deg.get(s, 0) + 1
            deg[d] = deg.get(d, 0) + 1
        live = [(s, d) for s, d in live if min(deg[s], deg[d]) >= k]
    final_deg: dict = {}
    for s, d in live:
        final_deg[s] = final_deg.get(s, 0) + 1
        final_deg[d] = final_deg.get(d, 0) + 1
    schema = T.StructType([
        T.StructField(node_col, nodes.schema[node_col].dataType),
        T.StructField("in_core", T.BooleanType(), nullable=False),
        T.StructField("degree", T.LongType()),
    ])
    return nodes.sparkSession.createDataFrame(
        [(i, i in final_deg, final_deg.get(i, 0)) for i in ids],
        schema=schema)
