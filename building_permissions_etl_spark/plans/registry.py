"""Query registry: name → (spark callable, duckdb oracle SQL).

This is the single source of truth behind ``__spark_entry__.queries()`` /
``oracle_sql()``, the local parity tests, and ``bench.py``. Each entry maps
an operator (or operator composition) from SURVEY.md §2 onto the driver
fixture tables; ``ORACLELESS`` lists queries whose semantics are not
ANSI-SQL-expressible (hash-based sketches, streaming) — the driver records
a rows-only check for those.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Each module contributes {name: (callable, sql_or_None)}.
_REGISTRY: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {}


def register(name: str, fn: Callable[[SparkSession, str], DataFrame],
             sql: str | None) -> None:
    if name in _REGISTRY:
        raise ValueError(f"duplicate query name {name!r}")
    _REGISTRY[name] = (fn, sql)


def _populate() -> None:
    if _REGISTRY:
        return
    from building_permissions_etl_spark.plans import (  # noqa: F401
        analytics,
        extensions,
        flagship_queries,
        scale_queries,
        streaming_queries,
    )

    flagship_queries.contribute(register)
    analytics.contribute(register)
    extensions.contribute(register)
    streaming_queries.contribute(register)
    scale_queries.contribute(register)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _populate()
    return {k: v[0] for k, v in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _populate()
    return {k: v[1] for k, v in _REGISTRY.items() if v[1] is not None}
