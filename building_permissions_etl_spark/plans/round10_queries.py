"""Round-10 batch: the drift-monitor histogram as a first-class,
oracle-checked maintained table.

Three queries promoting the round-8 monitoring operators
(``operators/validation.py::histogram_snapshot`` / ``psi_drift``) and
the round-10 ``operators/maintenance.py::merge_histograms`` from
pytest-only surfaces to driver-verified queries:

* ``histogram_snapshot_price`` — the fixed-domain equi-width
  histogram artifact itself, over orders.o_totalprice. The domain
  [lo, hi) is a LITERAL contract (not data-derived), which is what
  makes two snapshots comparable; the DuckDB oracle rebuilds the
  same floor-quotient binning, so the round-10 ANSI clamp fix
  (bigint until after the clamp) gets driver evidence.
* ``histogram_shard_merge`` — the histogram as a MAINTAINED table:
  per-shard snapshots built independently and folded with
  ``merge_histograms`` (counts sum by bin), checked against the
  full-rebuild oracle — the merge-equals-rebuild proof, same shape
  as ``bloom_incremental_union`` / ``zorder_extent_merge``. The
  domain is chosen so BOTH clamp bins (-1 underflow, n_bins
  overflow) are occupied by real fixture rows, not just unit-test
  literals.
* ``psi_drift_monitor`` — population-stability-index drift between
  the pre-/post-1998 halves of orders, computed entirely on the two
  ≤ n_bins+3-row artifacts; the oracle replicates the probability
  floor and (p−q)·ln(p/q) sum, so the one-row DOUBLE result is
  value-checked, not just row-counted.

Scale shape: each snapshot is one partial-agg scan emitting ≤ 19
rows; the merge and the PSI join never touch the base table — at
100 TB the monitor folds per-ingest partials and compares artifacts,
cost independent of table size.

Reference scope: beyond the reference surface (helpers:* has no
drift-monitoring tooling); PSI is Siddiqi (2006) credit-scoring
folklore, equi-width histogram maintenance is the classic mergeable-
summary shape (Cormode et al., "Synopses for Massive Data", 2012).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from building_permissions_etl_spark.catalog import load_table
from building_permissions_etl_spark.operators.maintenance import (
    merge_histograms,
)
from building_permissions_etl_spark.operators.validation import (
    histogram_snapshot,
    psi_drift,
)

# Domain contracts (LITERALS — see histogram_snapshot's docstring).
# Snapshot/PSI domain: covers the fixture's full price range.
_LO, _HI, _BINS = 0.0, 600_000.0, 16
_W = (_HI - _LO) / _BINS  # 37500.0
# Merge-query domain: deliberately NARROWER than the data so the -1
# underflow and 16 overflow bins hold real rows at every SF.
_MLO, _MHI = 2_000.0, 480_000.0
_MW = (_MHI - _MLO) / _BINS  # 29875.0
# PSI split point: pre- vs post-1998 orders (fixture spans 1995-2001).
_SPLIT = "1998-01-01"


def _hist_sql(lo: float, width: float, n_bins: int,
              where: str = "") -> str:
    """The DuckDB twin of ``histogram_snapshot``'s binning: same
    double floor-quotient, same clamp order (NULL → -2, raw < 0 → -1,
    raw >= n_bins → overflow). r IS NULL ⇔ value IS NULL on this
    fixture (no NaNs in o_totalprice)."""
    return f"""
      SELECT CASE WHEN r IS NULL THEN -2
                  WHEN r < 0 THEN -1
                  WHEN r >= {n_bins} THEN {n_bins}
                  ELSE r END AS bin
      FROM (SELECT CAST(floor((CAST(o_totalprice AS DOUBLE) - {lo!r})
                              / {width!r}) AS BIGINT) AS r
            FROM orders {where})
    """


def contribute(register) -> None:
    # ---- the snapshot artifact itself -------------------------------------
    def snapshot(spark, sf):
        od = load_table(spark, "orders", sf)
        return (histogram_snapshot(od, "o_totalprice", _LO, _HI, _BINS)
                .orderBy("bin"))

    register(
        "histogram_snapshot_price",
        snapshot,
        f"""
        SELECT CAST(bin AS INT) AS bin, CAST(count(*) AS BIGINT) AS cnt
        FROM ({_hist_sql(_LO, _W, _BINS)})
        GROUP BY 1 ORDER BY 1
        """,
    )

    # ---- maintained histogram: shard merge == rebuild ---------------------
    # Three shards built independently (at 100 TB: one per ingest
    # batch, persisted), folded by merge_histograms; the oracle is
    # the FULL REBUILD, so any merge-algebra error is a value
    # mismatch. Shard key o_orderkey % 3 is arbitrary — the merge
    # must not care how rows were sharded.
    def shard_merge(spark, sf):
        od = load_table(spark, "orders", sf)
        shards = [
            histogram_snapshot(od.filter(F.col("o_orderkey") % 3 == i),
                               "o_totalprice", _MLO, _MHI, _BINS)
            for i in range(3)
        ]
        return merge_histograms(*shards).orderBy("bin")

    register(
        "histogram_shard_merge",
        shard_merge,
        f"""
        SELECT CAST(bin AS INT) AS bin, CAST(count(*) AS BIGINT) AS cnt
        FROM ({_hist_sql(_MLO, _MW, _BINS)})
        GROUP BY 1 ORDER BY 1
        """,
    )

    # ---- PSI drift between two snapshot artifacts --------------------------
    def drift(spark, sf):
        od = load_table(spark, "orders", sf)
        base = od.filter(F.col("o_orderdate") < F.lit(_SPLIT).cast("timestamp"))
        cur = od.filter(F.col("o_orderdate") >= F.lit(_SPLIT).cast("timestamp"))
        hb = histogram_snapshot(base, "o_totalprice", _LO, _HI, _BINS)
        hc = histogram_snapshot(cur, "o_totalprice", _LO, _HI, _BINS)
        return psi_drift(hb, hc)

    register(
        "psi_drift_monitor",
        drift,
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
