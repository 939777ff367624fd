"""Streaming maintenance of mergeable tables (foreachBatch fold).

The batch side of this story is `operators/maintenance.py` (Bloom
registers, extent tables) with merge-equals-rebuild proven by the
round-9 oracle queries; this module is the DEPLOYMENT shape: a file/
kafka stream of ingest batches folds each micro-batch's partial table
into the maintained state with `foreachBatch` — the same
streaming-MERGE pattern `plans/scd_queries.py::stream_scd1_upsert`
uses for dimensions, applied to fixed-size sketch/statistics tables.

Because every supported merge is ASSOCIATIVE and COMMUTATIVE over
batches (bit-OR for registers; sum/min/max for extents), the final
state is independent of how the engine splits the feed into
micro-batches — which is what makes the result testable against a
one-shot batch rebuild (`tests/test_round9_queries.py`).

State discipline: the fold keeps the maintained table as a
``localCheckpoint`` per batch — the table is FIXED-size (≤1024
register words / ≤#buckets extent rows), so per-batch checkpoint cost
is constant, and cutting lineage per batch prevents the plan-on-plan
chain Catalyst would otherwise re-analyze superlinearly across
batches (the stream_scd1_upsert lesson). On a real deployment the
state lands in a table format (Delta/Iceberg MERGE) instead;
``state_sink`` hooks that in.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame


def fold_mergeable_stream(
    feed: DataFrame,
    to_partial: Callable[[DataFrame], DataFrame],
    merge: Callable[[DataFrame, DataFrame], DataFrame],
    initial_state: DataFrame | None = None,
    state_sink: Callable[[DataFrame, int], None] | None = None,
) -> DataFrame:
    """Run the streaming feed to completion (availableNow) and return
    the final maintained table.

    ``to_partial`` builds a batch's partial table (one partial-agg
    scan of the micro-batch); ``merge`` folds two tables into one —
    it MUST be associative+commutative over batches or the result
    becomes micro-batch-split-dependent. ``initial_state`` seeds the
    fold (the persisted table from the previous run); ``state_sink``
    is called with (state, batch_id) after each fold for persistence.
    """
    state = {"df": initial_state}

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        partial = to_partial(batch_df)
        merged = partial if state["df"] is None \
            else merge(state["df"], partial)
        # fixed-size state: constant per-batch checkpoint cost, and the
        # lineage cut stops cross-batch plan-on-plan growth
        state["df"] = merged.localCheckpoint()
        if state_sink is not None:
            state_sink(state["df"], batch_id)

    from building_permissions_etl_spark.streaming.events import (
        scoped_stream_shuffle,
    )

    with scoped_stream_shuffle(feed.sparkSession):
        q = (feed.writeStream.foreachBatch(fold)
             .trigger(availableNow=True).start())
        q.awaitTermination()
    if state["df"] is None:
        raise ValueError("stream produced no micro-batches and no "
                         "initial_state was given — nothing to return")
    return state["df"]
