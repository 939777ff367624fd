"""Z-order (Morton) curve expressions for multidimensional data skipping.

Interleaving the bits of two quantized dimensions gives a single sort
key whose contiguous ranges are small rectangles in (x, y) space — the
layout trick behind Delta/Iceberg `OPTIMIZE ZORDER BY`: sort (or
range-partition) the table by the z-value before writing, and a file's
(min, max) footer stats become tight 2-D extents, so a scan with
predicates on EITHER dimension prunes most files. A 1-D sort on x alone
only ever prunes on x.

The interleave is generated as an unrolled bit expression from ONE
Python loop with engine-specific shift syntax (Spark lacks the `<<`
operator, DuckDB lacks `shiftleft()`), keeping the Spark plan and the
DuckDB oracle mechanically identical. Everything is integer bit math
inside whole-stage codegen — no UDF.

Sibling: `sources/sinks.py::zorder_value` is the Column-API variant
(min-max normalization built in, sign-bit-safe width capping) used on
the WRITE path; this module is the shared-SQL-text variant whose whole
point is byte-identical arithmetic on Spark AND DuckDB for the
oracle-checked extent-pruning query. Callers pre-quantize here.

Reference scope: beyond the reference surface (helpers:* has no layout
tooling); Morton (1966), and the public Delta OPTIMIZE ZORDER design.
"""

from __future__ import annotations


# Canonical 8-bit quantizers of the (order day, whole-dollar price)
# plane used by the z-order demo family (round-8d inline extents +
# box-pruning candidacy, round-9 extent merge, round-12 persisted
# prune). Values are CLAMPED to the 8-bit domain the interleave's
# nonnegative bits-wide contract requires: without the clamp a
# pre-1995 date or a >512k price would silently alias into an
# unrelated bucket. `plans/round8d_queries.py` predated this hoist
# with byte-identical inline copies; they folded onto these names in
# round 13, when zorder_extent_pruning re-entered the driver window
# (the dead-evidence rule this note set), and `plans/round9_queries.py`
# followed in round 14 when zorder_extent_merge re-entered — both
# folds pinned sha256-identical on the emitted oracle SQL. No inline
# copies remain.
ZQ_DAY_SPARK = ("greatest(0L, least(255L, "
                "datediff(o_orderdate, DATE '1995-01-01') div 10))")
ZQ_PRICE_SPARK = ("greatest(0L, least(255L, "
                  "CAST(floor(o_totalprice) AS BIGINT) div 2000))")
ZQ_DAY_DUCK = ("greatest(0, least(255, "
               "date_diff('day', DATE '1995-01-01', o_orderdate) // 10))")
ZQ_PRICE_DUCK = ("greatest(0, least(255, "
                 "CAST(floor(o_totalprice) AS BIGINT) // 2000))")


def z_interleave_sql(x_expr: str, y_expr: str, bits: int = 8,
                     engine: str = "spark") -> str:
    """SQL text computing the Morton interleave of two `bits`-wide
    nonnegative integer expressions (x in even positions, y in odd).

    The per-bit terms occupy disjoint bit positions, so `+` is exact
    (equivalent to OR) and the result fits in 2*bits bits.
    """
    if bits <= 0 or bits > 31:
        raise ValueError(f"bits must be in 1..31, got {bits}")
    terms = []
    for i in range(bits):
        if engine == "spark":
            terms.append(f"shiftleft(shiftright({x_expr}, {i}) & 1, {2 * i})")
            terms.append(f"shiftleft(shiftright({y_expr}, {i}) & 1, {2 * i + 1})")
        elif engine == "duckdb":
            # full-term parens are load-bearing: DuckDB's << binds
            # LOOSER than +, so an unparenthesized term chain
            # `a << 2 + b << 3` parses as `(a << (2 + b)) << 3`
            terms.append(f"(((({x_expr}) >> {i}) & 1) << {2 * i})")
            terms.append(f"(((({y_expr}) >> {i}) & 1) << {2 * i + 1})")
        else:
            raise ValueError(f"unknown engine {engine!r}")
    return "(" + " + ".join(terms) + ")"
