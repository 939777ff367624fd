"""Round-11 batch: drift monitoring in its PERSISTED-artifact shape.

``psi_drift_monitor`` (round 10) proved the PSI algebra against a
DuckDB oracle, but built both histogram snapshots from base-table
scans inside the query — so its driver evidence never demonstrated
the claim that makes the monitor affordable at 100 TB: once the
snapshot artifacts EXIST as tables, monitoring cost is independent of
base-table size. ``psi_drift_persisted`` closes that gap with the
same build/probe split the ANN index family uses
(``operators/similarity.py``: build once, probe many):

* a session-scoped PREP step builds the pre-/post-1998 histogram
  snapshots of orders.o_totalprice (one partial-agg scan each,
  ≤ n_bins + 3 rows) and WRITES them as parquet artifact tables —
  the "publish a snapshot per ingest day" step of a real deployment;
* the registered query reads ONLY the two artifact tables and runs
  ``psi_drift`` on them. Its plan contains exactly two FileScans,
  both over the artifact directory and neither over the fixture
  tables — pinned by ``tests/test_round11_plan_shape.py``, so the
  zero-base-scan property is mechanical, not narrative.

The DuckDB oracle recomputes the same PSI from the base table (DuckDB
has no artifact store), which is exactly the merge-equals-rebuild
discipline the round-9/10 maintained tables follow: any divergence
between the artifact path and a from-scratch rebuild is a value
mismatch.

``histogram_persisted_delta_update`` is the same split applied to
histogram MAINTENANCE — the per-ingest shape: the base partition's
histogram is a persisted artifact, the query scans only the delta
rows and folds with ``merge_histograms``, and the full-rebuild oracle
plus a one-fixture-scan plan pin prove the base rows are never
re-read.

Scale shape: at 100 TB the prep cost is one column scan per snapshot
(amortized over every monitor run and shared with the ingest
pipeline's own stats pass), and the monitor itself touches ≤ 2·19
artifact rows — constant regardless of table growth.

Reference scope: beyond the reference surface (helpers:* has no
drift-monitoring tooling); PSI per Siddiqi (2006), snapshot artifacts
per the mergeable-summary maintenance shape (Cormode et al.,
"Synopses for Massive Data", 2012).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from building_permissions_etl_spark.catalog import load_table
from building_permissions_etl_spark.plans.artifact_store import (
    publish_artifacts,
)
from building_permissions_etl_spark.operators.maintenance import (
    merge_histograms,
)
from building_permissions_etl_spark.operators.validation import (
    histogram_snapshot,
    psi_drift,
)
from building_permissions_etl_spark.plans.round10_queries import (
    _BINS,
    _HI,
    _LO,
    _SPLIT,
    _W,
    _hist_sql,
)

def _snapshot_artifacts(spark, sf: str) -> tuple[str, str]:
    """Build-and-publish step: write the two snapshot artifacts for
    ``sf`` (if this session hasn't yet) and return their paths. The
    session-scoped cache, the base-mtime invalidation (an in-session
    rewrite of orders must not serve snapshots of the OLD data — a
    stale artifact is exactly the monitoring failure this query exists
    to rule out), superseded-dir eviction, and exit cleanup all live
    in ``plans/artifact_store.py``, shared with the Bloom-register
    family (round 12)."""
    def _write(root: str) -> dict:
        od = load_table(spark, "orders", sf)
        split_ts = F.lit(_SPLIT).cast("timestamp")
        paths = {}
        for name, side in (
            ("hist_base", od.filter(F.col("o_orderdate") < split_ts)),
            ("hist_cur", od.filter(F.col("o_orderdate") >= split_ts)),
        ):
            p = os.path.join(root, f"{name}.parquet")
            # ≤ n_bins + 3 rows: one output file per artifact
            (histogram_snapshot(side, "o_totalprice", _LO, _HI, _BINS)
             .coalesce(1).write.mode("overwrite").parquet(p))
            paths[name] = p
        return paths

    paths = publish_artifacts(spark, sf, "orders.parquet",
                              "drift_artifacts", _write)
    return paths["hist_base"], paths["hist_cur"]


def contribute(register) -> None:
    # ---- maintained histogram: persisted artifact + delta fold ------------
    # The INGEST shape of histogram maintenance, complementing
    # `histogram_shard_merge` (which proved merge == rebuild with all
    # shards built inline): here the base partition's histogram is a
    # PERSISTED artifact (written once by the prep step) and the query
    # scans ONLY the delta rows — one pushed-date fixture scan + one
    # ≤ n_bins+3-row artifact read + a fixed-size merge_histograms
    # fold. The full-rebuild oracle proves artifact + delta fold ==
    # re-scanning everything; the plan pin proves the base rows were
    # never touched. At 100 TB this is the per-ingest maintenance
    # cost: a scan of the day's batch plus a constant-size merge.
    def hist_delta_update(spark, sf):
        base_path, _ = _snapshot_artifacts(spark, sf)
        od = load_table(spark, "orders", sf)
        delta = od.filter(
            F.col("o_orderdate") >= F.lit(_SPLIT).cast("timestamp"))
        delta_hist = histogram_snapshot(delta, "o_totalprice",
                                        _LO, _HI, _BINS)
        return merge_histograms(
            spark.read.parquet(base_path), delta_hist).orderBy("bin")

    register(
        "histogram_persisted_delta_update",
        hist_delta_update,
        f"""
        SELECT CAST(bin AS INT) AS bin, CAST(count(*) AS BIGINT) AS cnt
        FROM ({_hist_sql(_LO, _W, _BINS)})
        GROUP BY 1 ORDER BY 1
        """,
    )

    # ---- PSI drift over PERSISTED snapshot artifacts -----------------------
    def drift_persisted(spark, sf):
        base_path, cur_path = _snapshot_artifacts(spark, sf)
        return psi_drift(spark.read.parquet(base_path),
                         spark.read.parquet(cur_path))

    register(
        "psi_drift_persisted",
        drift_persisted,
        f"""
        WITH hb AS (
          SELECT bin, CAST(count(*) AS BIGINT) AS cb
          FROM ({_hist_sql(_LO, _W, _BINS,
                           f"WHERE o_orderdate < TIMESTAMP '{_SPLIT}'")})
          GROUP BY 1
        ),
        hc AS (
          SELECT bin, CAST(count(*) AS BIGINT) AS cc
          FROM ({_hist_sql(_LO, _W, _BINS,
                           f"WHERE o_orderdate >= TIMESTAMP '{_SPLIT}'")})
          GROUP BY 1
        ),
        j AS (
          SELECT coalesce(hb.cb, 0) AS cb, coalesce(hc.cc, 0) AS cc
          FROM hb FULL OUTER JOIN hc ON hb.bin = hc.bin
        ),
        terms AS (
          SELECT cb, cc,
                 sum(cb) OVER () AS nb, sum(cc) OVER () AS nc
          FROM j
        )
        SELECT round(sum((greatest(cb / nb, 1e-6) - greatest(cc / nc, 1e-6))
                         * ln(greatest(cb / nb, 1e-6)
                              / greatest(cc / nc, 1e-6))), 9) AS psi,
               CAST(max(nb) AS BIGINT) AS n_base,
               CAST(max(nc) AS BIGINT) AS n_cur
        FROM terms
        """,
    )
