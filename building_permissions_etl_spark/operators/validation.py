"""Data-quality expectations (SURVEY.md §2.9, V1-V5).

The reference runs Great Expectations 0.15 over an eager pandas frame
(helpers:33-68). Here each expectation compiles to a conditional-aggregate
Column and the whole suite evaluates in ONE ``agg()`` pass over the data —
one job, one scan, no per-expectation traversal. That is the property that
makes the suite viable at 100 TB.

Supported expectation kinds (reference parity):
  * ``regex``             — V1: every non-null value matches (helpers:49)
  * ``in_set``            — V2: every non-null value ∈ set (helpers:51)
  * ``regex_mostly``      — V3: ≥ ``mostly`` fraction of non-null values
                            match (helpers:52-53, mostly=0.85)
  * ``distinct_in_set``   — V4: distinct values ⊆ set (helpers:54-55)
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Expectation:
    name: str
    kind: str                     # regex | in_set | regex_mostly | distinct_in_set
    column: str
    regex: str | None = None
    value_set: tuple[str, ...] = ()
    mostly: float = 1.0

    def to_agg(self) -> Column:
        col = F.col(self.column)
        nonnull = col.isNotNull()
        if self.kind == "regex":
            bad = F.count(F.when(nonnull & ~col.rlike(self.regex), 1))
            return (bad == 0).alias(self.name)
        if self.kind == "in_set":
            bad = F.count(F.when(nonnull & ~col.isin(list(self.value_set)), 1))
            return (bad == 0).alias(self.name)
        if self.kind == "regex_mostly":
            rate = F.avg(
                F.when(~nonnull, None)
                .when(col.rlike(self.regex), 1.0)
                .otherwise(0.0)
            )
            # vacuous success on zero non-null elements (avg → NULL):
            # Great Expectations treats a mostly-expectation with nothing
            # to check as passing; NULL here would read as FAIL and block
            # the pipeline on an empty/all-null batch
            return F.coalesce(rate >= self.mostly, F.lit(True)).alias(self.name)
        if self.kind == "distinct_in_set":
            # distinct-set containment == no non-null value outside the set
            # (V4 is a distinct-level check; row-level containment implies
            # it and evaluates in the same single pass).
            bad = F.count_distinct(
                F.when(nonnull & ~col.isin(list(self.value_set)), col)
            )
            return (bad == 0).alias(self.name)
        raise ValueError(f"unknown expectation kind {self.kind!r}")


@dataclass(frozen=True)
class ExpectationSuite:
    expectations: tuple[Expectation, ...]
    extra_metrics: tuple[Column, ...] = field(default_factory=tuple)

    def evaluate(self, df: DataFrame) -> DataFrame:
        """One-row metrics DataFrame: one boolean per expectation."""
        aggs = [e.to_agg() for e in self.expectations]
        aggs.append(F.count(F.lit(1)).alias("element_count"))
        return df.agg(*aggs)

    def report(self, df: DataFrame) -> dict:
        """Driver-side dict for JSON/HTML rendering (S11 analog)."""
        row = self.evaluate(df).first().asDict()
        return {
            "success": all(bool(row[e.name]) for e in self.expectations),
            "results": {e.name: bool(row[e.name]) for e in self.expectations},
            "element_count": row["element_count"],
        }

    def render_html(self, df: DataFrame, out_path: str) -> dict:
        """S11 (helpers:57-68): validation page written to ``out_path``.
        The reference renders Great Expectations' jinja page; here it is a
        minimal static table — the metrics themselves come from the same
        single ``agg()`` pass."""
        rep = self.report(df)
        rows = "\n".join(
            f"<tr><td>{name}</td><td class={'ok' if ok else 'fail'}>"
            f"{'PASS' if ok else 'FAIL'}</td></tr>"
            for name, ok in rep["results"].items()
        )
        html = (
            "<html><head><style>.ok{color:green}.fail{color:red}"
            "table{border-collapse:collapse}td{border:1px solid #999;"
            "padding:4px 8px}</style></head><body>"
            f"<h1>Validation {'succeeded' if rep['success'] else 'FAILED'}</h1>"
            f"<p>{rep['element_count']} elements checked</p>"
            f"<table>{rows}</table></body></html>"
        )
        with open(out_path, "w", encoding="utf-8") as f:
            f.write(html)
        return rep


# Fixture-table instantiation used by the registry/oracle pair: mirrors the
# reference suite's shapes (V1 regex, V2 set, V3 mostly, V4 distinct-subset)
# on the `orders` table.
ORDERS_SUITE = ExpectationSuite(
    expectations=(
        Expectation("priority_regex_pass", "regex", "o_orderpriority",
                    regex=r"^[1-5]-[A-Z ]+$"),
        Expectation("status_in_set_pass", "in_set", "o_orderstatus",
                    value_set=("F", "O", "P")),
        Expectation("priority_mostly_pass", "regex_mostly", "o_orderpriority",
                    regex=r"^[12]-", mostly=0.2),
        Expectation("status_distinct_subset_pass", "distinct_in_set",
                    "o_orderstatus", value_set=("F", "O", "P")),
    ),
)


def expectation_suite_df(orders: DataFrame) -> DataFrame:
    return ORDERS_SUITE.evaluate(orders)


def profile_columns(
    df: DataFrame,
    numeric_cols: list[str],
    string_cols: list[str],
) -> DataFrame:
    """One-pass column profiling — the post-load audit a warehouse runs
    before publishing a table: per column, row count, null count, exact
    distinct count, and min/max (numerics as rounded doubles, strings
    lexically). Output is LONG form, one row per column, so a single
    report schema covers any table.

    Every measure compiles into ONE ``agg()`` — a single scan regardless
    of column count (the same property as the expectation suite above);
    the multi-column exact ``count(DISTINCT)`` lands as one
    expand-based aggregate, not one job per column. At 100 TB swap
    ``approx_count_distinct`` in for the distinct measure and accept the
    sketch; every other measure is already a trivial partial aggregate.
    """
    if not numeric_cols and not string_cols:
        raise ValueError(
            "profile_columns: no columns requested (numeric_cols and "
            "string_cols are both empty)"
        )
    dupes = set(numeric_cols) & set(string_cols)
    if dupes:
        raise ValueError(
            f"profile_columns: columns in both numeric and string lists: "
            f"{sorted(dupes)}"
        )
    aggs: list = [F.count(F.lit(1)).alias("__n")]
    for c in numeric_cols:
        aggs += [
            F.count(c).alias(f"__nn_{c}"),
            F.countDistinct(c).alias(f"__nd_{c}"),
            F.round(F.min(F.col(c).cast("double")), 6).alias(f"__mn_{c}"),
            F.round(F.max(F.col(c).cast("double")), 6).alias(f"__mx_{c}"),
        ]
    for c in string_cols:
        aggs += [
            F.count(c).alias(f"__nn_{c}"),
            F.countDistinct(c).alias(f"__nd_{c}"),
            F.min(F.col(c).cast("string")).alias(f"__mn_{c}"),
            F.max(F.col(c).cast("string")).alias(f"__mx_{c}"),
        ]
    row = df.agg(*aggs)
    parts = []
    for c in numeric_cols:
        parts.append(row.select(
            F.lit(c).alias("column_name"),
            F.col("__n").cast("bigint").alias("n_rows"),
            (F.col("__n") - F.col(f"__nn_{c}")).cast("bigint").alias("n_null"),
            F.col(f"__nd_{c}").cast("bigint").alias("n_distinct"),
            F.col(f"__mn_{c}").alias("min_num"),
            F.col(f"__mx_{c}").alias("max_num"),
            F.lit(None).cast("string").alias("min_str"),
            F.lit(None).cast("string").alias("max_str"),
        ))
    for c in string_cols:
        parts.append(row.select(
            F.lit(c).alias("column_name"),
            F.col("__n").cast("bigint").alias("n_rows"),
            (F.col("__n") - F.col(f"__nn_{c}")).cast("bigint").alias("n_null"),
            F.col(f"__nd_{c}").cast("bigint").alias("n_distinct"),
            F.lit(None).cast("double").alias("min_num"),
            F.lit(None).cast("double").alias("max_num"),
            F.col(f"__mn_{c}").alias("min_str"),
            F.col(f"__mx_{c}").alias("max_str"),
        ))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("column_name")


def histogram_snapshot(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int = 16,
) -> DataFrame:
    """(bin, cnt): the fixed-domain equi-width histogram a snapshot
    publishes for drift monitoring. The domain [lo, hi) is a LITERAL
    contract, not data-derived — two snapshots' bins align by
    construction, which is what makes the artifact mergeable across
    partitions and comparable across days (a data-derived domain would
    re-bin every snapshot and fabricate drift). Bin -2 holds NULLs
    (null-rate drift is drift), -1 underflow, ``n_bins`` overflow; one
    partial-agg scan, output ≤ n_bins + 3 rows."""
    if not hi > lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi})")
    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1, got {n_bins}")
    v = F.col(value_col).cast("double")
    width = (hi - lo) / n_bins
    # raw stays BIGINT until after the clamp: under ANSI (Spark 4
    # default) a long->int cast of an extreme out-of-domain quotient
    # (|raw| >= 2^31, or ±Infinity which floor saturates to
    # Long.Min/MaxValue) would throw CAST_OVERFLOW instead of landing
    # in the -1/overflow bins this contract guarantees. Only the
    # final, provably-bounded branch (0 <= raw < n_bins) casts to int.
    raw = F.floor((v - F.lit(lo)) / F.lit(width))
    bin_ = (
        # NaN joins NULL in the missing bin: floor(NaN) yields a NULL
        # bigint, which would otherwise fall through every comparison
        # and group as a silent NULL bin id
        F.when(v.isNull() | F.isnan(v), F.lit(-2))
        .when(raw < 0, F.lit(-1))
        .when(raw >= n_bins, F.lit(n_bins))
        .otherwise(raw.cast("int"))
    )
    return (
        df.select(bin_.alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def psi_drift(
    base_hist: DataFrame,
    cur_hist: DataFrame,
    min_prob: float = 1e-6,
) -> DataFrame:
    """Population-stability-index drift between two
    ``histogram_snapshot`` tables over the SAME domain contract:
    PSI = Σ_bins (p - q)·ln(p / q), probabilities floored at
    ``min_prob`` so bins empty on one side contribute a large-but-
    finite term instead of ±inf. A snapshot side whose counts sum to
    ZERO raises at execution (RAISE_ERROR) rather than emitting a
    silent NaN psi. Returns one row: (psi, n_base, n_cur). Industry reading: < 0.1 stable, 0.1–0.25
    moderate shift, > 0.25 major shift (Siddiqi 2006, credit-scoring
    folklore — public knowledge).

    Scale shape: both inputs are ≤ n_bins + 3 rows — the full-outer
    bin join, the probability arithmetic, and the final sum all run
    on snapshot ARTIFACTS, never the underlying table; monitoring
    cost is independent of table size once snapshots exist. The bin
    totals come from an UN-partitioned window over the joined
    artifact (≤ n_bins + 3 rows in one task — bounded by the domain
    contract, so the single-partition window is free), not a separate
    aggregate + crossJoin: the agg form re-derived the join's
    lineage TWICE, which doubles the base-table scans whenever the
    inputs are built inline rather than read from persisted
    artifacts."""
    from pyspark.sql import Window

    b = base_hist.select("bin", F.col("cnt").alias("cb"))
    c = cur_hist.select("bin", F.col("cnt").alias("cc"))
    j = (
        b.join(c, "bin", "full")
        .select(
            F.coalesce("cb", F.lit(0)).alias("cb"),
            F.coalesce("cc", F.lit(0)).alias("cc"),
        )
    )
    w = Window.partitionBy()

    # Guard: a snapshot side that sums to zero (empty current period,
    # wrong artifact joined) makes cb/nb 0/0 — NaN under non-ANSI
    # double division, which propagates SILENTLY into psi and defeats
    # threshold-based monitoring (ADVICE r10). Raise instead: an empty
    # snapshot is an upstream pipeline fault, not "no drift".
    def _prob(cnt: str, tot: str, side: str):
        return F.when(
            F.col(tot) > 0,
            F.greatest(F.col(cnt) / F.col(tot), F.lit(min_prob)),
        ).otherwise(
            F.raise_error(F.lit(
                f"psi_drift: {side} snapshot sums to zero — "
                "PSI is undefined against an empty side")).cast("double")
        )

    scored = (
        j.select(
            "cb", "cc",
            F.sum("cb").over(w).alias("nb"),
            F.sum("cc").over(w).alias("nc"),
        )
        .select(
            "nb", "nc",
            _prob("cb", "nb", "base").alias("p"),
            _prob("cc", "nc", "current").alias("q"),
        )
        .select("nb", "nc",
                ((F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q")))
                .alias("term"))
    )
    agg = scored.groupBy().agg(
        F.round(F.sum("term"), 9).alias("psi"),
        F.max("nb").cast("bigint").alias("n_base"),
        F.max("nc").cast("bigint").alias("n_cur"),
    )
    # Zero-ROW inputs escape the per-row guard (no row ever evaluates
    # it): two empty histogram tables join to an empty frame and the
    # global agg still emits one all-NULL row — a NULL psi a threshold
    # monitor would silently read as "no drift". Same contract as the
    # zero-SUM case: raise.
    return agg.select(
        F.when(F.col("n_base").isNotNull() & F.col("n_cur").isNotNull(),
               F.col("psi"))
        .otherwise(F.raise_error(F.lit(
            "psi_drift: empty snapshot inputs — PSI is undefined"))
            .cast("double"))
        .alias("psi"),
        "n_base", "n_cur",
    )
