"""Structured Streaming surface over the ``events`` fixture table.

The reference is batch-only (SURVEY.md §2.11): its "incremental" semantics
are logical-date batch windows. This module is the engine's stretch surface
for genuinely streaming workloads, built the idiomatic Spark way:

  * ``read_events_stream`` — file-source ``readStream`` with an explicit
    schema (streams never infer).
  * ``windowed_event_counts`` — tumbling/sliding event-time windows with a
    watermark for late data. The SAME transformation works on a batch
    DataFrame (``withWatermark`` is a no-op under batch), which is how the
    oracle checks it: stream(complete mode) ≡ batch ≡ ANSI SQL.
  * ``sessionize_batch`` / ``sessionize_stream`` — gap-based user
    sessionization. Batch uses window functions (lag → gap flag → running
    sum); streaming is a custom stateful operator via
    ``applyInPandasWithState`` with event-time timeout.

Scale notes (100 TB): windowed counts shuffle once on (window, type) with
map-side partial aggregation; sessionization shuffles once on user_id —
state per key is O(1) (open-session bounds only), so state store size is
bounded by live keys, not history. Watermarks bound both state and
late-data reprocessing.

API note: Spark 4's ``transformWithStateInPandas`` would be the modern
home for the stateful operator (typed value state, timers, TTL), but its
Python driver worker needs a working ``google.protobuf``, which this
container lacks (probed: StateMessage_pb2 import fails) —
``applyInPandasWithState`` is the deliberate, GA-stable choice here and
the operator's logic ports to a StatefulProcessor unchanged.
"""

from __future__ import annotations

import os
from contextlib import contextmanager

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

def stream_shuffle_partitions(spark: SparkSession) -> int:
    """Shuffle-partition count for the micro-batch runs this module
    drives — which for a streaming query is also the STATE STORE
    partition count, the dominant fixed cost of every stateful
    micro-batch: each partition is a store instance paying
    init + snapshot + delta-commit per batch (~5-20 ms each), and a
    stream-stream join keeps FOUR stores per partition. Measured on the
    fixture stream-stream join (guide §2.2 "fewer, larger partitions",
    applied to state): 32 partitions → 9.9 s, 4 partitions → 2.2 s,
    identical output — the fixture's single-file source saturates a
    handful of partitions, and 128 store instances per batch are pure
    overhead.

    Unlike batch shuffles, AQE cannot coalesce streaming state (the
    partition count is pinned by the checkpoint from batch 0), so this
    must be chosen up front. Derivation: bounded by the session's
    defaultParallelism so the driver's lower-core bench runs stay
    proportionate, capped at 8 for fixture-sized feeds. A production
    deployment sizes this to sustained input rate (partitions ≈
    throughput / per-core processing rate) and sets
    ``SPARK_GRAFT_STREAM_SHUFFLE_PARTITIONS`` explicitly — the value is
    load-bearing there because the checkpoint pins it for the stream's
    lifetime."""
    env = os.environ.get("SPARK_GRAFT_STREAM_SHUFFLE_PARTITIONS")
    if env:
        return int(env)
    return max(1, min(8, spark.sparkContext.defaultParallelism))


@contextmanager
def scoped_stream_shuffle(spark: SparkSession):
    """Run a micro-batch drain (start → awaitTermination) with the
    streaming shuffle/state partition count, restoring the session's
    batch setting afterwards. The conf is read at each micro-batch's
    planning, so the scope must cover the whole drain — all callers
    here run availableNow and block inside the scope."""
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions",
                   str(stream_shuffle_partitions(spark)))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet (one file per micro-batch
    under availableNow; at scale: a directory the producer appends to).

    Streams never infer schema, so the PHYSICAL schema comes from a batch
    footer read (``catalog._read_events_raw`` — tolerant of both the µs
    TIMESTAMP_NTZ and legacy ns-as-bigint fixture eras), then the same
    ``normalize_events_ts`` as the batch path rebuilds TIMESTAMP (ltz) —
    the only event-time type ``withWatermark`` accepts."""
    import os

    from building_permissions_etl_spark.catalog import (
        _read_events_raw,
        normalize_events_ts,
    )

    raw_schema = _read_events_raw(
        spark, os.path.join(sf_dir, "events.parquet")
    ).schema
    # The file source needs a directory; glob-filter selects just the
    # events table out of the fixture dir.
    raw = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return normalize_events_ts(raw)


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    slide: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Tumbling (or sliding, if ``slide``) event-time window counts per
    event_type. Works identically on batch and stream inputs."""
    df = events.withWatermark("ts", watermark)
    win = (
        F.window("ts", window_duration, slide)
        if slide
        else F.window("ts", window_duration)
    )
    return (
        df.groupBy(win.alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


# --- sessionization ------------------------------------------------------

SESSION_GAP_MINUTES = 30

SESSION_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("session_id", LongType()),
    StructField("session_start", TimestampType()),
    StructField("session_end", TimestampType()),
    StructField("n_events", LongType()),
    StructField("total_value", DoubleType()),
])


def sessionize_batch(events: DataFrame, gap_minutes: int = SESSION_GAP_MINUTES) -> DataFrame:
    """Gap-based sessions, batch shape: lag → new-session flag → running
    sum inside the same user partition (ONE shuffle on user_id; both window
    specs share it), then one more partial-agg shuffle on (user, session)."""
    from pyspark.sql.window import Window

    by_user = Window.partitionBy("user_id").orderBy("ts")
    # exact integer MICROSECONDS (cast("timestamp") is a no-op on ltz and
    # the legal route for a raw-NTZ caller): a whole-second cast("long")
    # truncates the fraction, so a gap of 1800.5 s would compare as 1800
    # and merge sessions the µs-exact oracle and streaming twin split.
    ts_epoch = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = ts_epoch - F.lag(ts_epoch).over(by_user)
    flagged = events.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > gap_minutes * 60 * 1_000_000), 1)
        .otherwise(0),
    ).withColumn(
        "session_id",
        F.sum("new_session").over(by_user.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return flagged.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 6).alias("total_value"),
    )


def _make_sessionize_fn(gap_minutes: int = SESSION_GAP_MINUTES,
                        tz_name: str = "UTC"):
    """Build the stateful per-user session accumulator
    (applyInPandasWithState) for a given gap and session timezone.

    State = (start_us, end_us, n, total, next_sid) — the OPEN session plus
    a MONOTONIC per-user session counter. Sessions close in event-time
    order per user, so the emitted ids reproduce ``sessionize_batch``'s
    1-based running numbering across micro-batches (round-1 form emitted
    a per-batch enumerate that repeated ids between batches). A session
    is emitted when a gap closes it or the event-time timeout fires; the
    timeout emission carries the stored counter, then the state keeps
    only the advanced counter (a 5-number stub, no timeout re-armed) so a
    user who returns later continues the numbering — bounded by live
    users; pipelines that prefer strict state reclamation over numbering
    continuity can drop the stub and accept a per-user restart.

    ``tz_name`` must be the session's ``spark.sql.session.timeZone``:
    pandas receives event times as NAIVE wall clocks rendered in that
    zone, and ``setTimeoutTimestamp`` needs TRUE epoch millis — stamping
    the walls as UTC on a non-UTC session would arm every timeout hours
    off the real watermark. Outputs are emitted as walls in the same
    zone so Spark reads back the correct instants.

    A late-but-admitted event that precedes the open session's stored
    start extends the session BACKWARD (start is min'd, not assumed
    sorted): within one micro-batch rows are sorted here, but an event
    arriving in a later micro-batch can still be earlier than the open
    session's start while inside the watermark.

    The returned closure is SELF-CONTAINED: executor workers may not
    have this package on sys.path (driver-side module refs would break
    cloudpickle)."""
    gap_us_const = gap_minutes * 60 * 1_000_000
    zone = tz_name

    def fn(key, pdfs, state: GroupState):
        import datetime as _dt
        from zoneinfo import ZoneInfo

        GAP_US = gap_us_const
        tz = _dt.timezone.utc if zone == "UTC" else ZoneInfo(zone)

        def us(t):
            return int(t.replace(tzinfo=tz).timestamp() * 1_000_000)

        def ts(u):
            return _dt.datetime.fromtimestamp(
                u / 1_000_000, tz
            ).replace(tzinfo=None)

        (user_id,) = key
        cols = ["user_id", "session_id", "session_start", "session_end",
                "n_events", "total_value"]
        if state.hasTimedOut:
            start, end, n, total, sid = state.get
            if start is None:          # counter stub: nothing open to emit
                state.remove()
                return
            state.update((None, None, 0, 0.0, sid + 1))
            yield pd.DataFrame(
                [[user_id, sid, ts(start), ts(end), n, round(total, 6)]],
                columns=cols,
            )
            return

        if state.exists:
            start, end, n, total, sid = state.get
            cur = None if start is None else [start, end, n, total]
        else:
            cur, sid = None, 1
        rows = pd.concat(list(pdfs)).sort_values("ts")
        out = []
        for t, v in zip(rows["ts"], rows["value"]):
            t_us = us(t.to_pydatetime())
            if cur is None:
                cur = [t_us, t_us, 0, 0.0]
            elif t_us - cur[1] > GAP_US:
                out.append((sid, cur))
                sid += 1
                cur = [t_us, t_us, 0, 0.0]
            cur[0] = min(cur[0], t_us)
            cur[1] = max(cur[1], t_us)
            cur[2] += 1
            cur[3] += float(v)
        state.update((cur[0], cur[1], cur[2], cur[3], sid))
        state.setTimeoutTimestamp(cur[1] // 1000 + GAP_US // 1000)
        if out:
            yield pd.DataFrame(
                [[user_id, s, ts(c[0]), ts(c[1]), c[2], round(c[3], 6)]
                 for s, c in out],
                columns=cols,
            )

    return fn


# default instance (UTC session, 30-min gap) — also the unit-test target
_sessionize_fn = _make_sessionize_fn()


_SESSION_STATE_SCHEMA = StructType([
    StructField("start_us", LongType()),
    StructField("end_us", LongType()),
    StructField("n", LongType()),
    StructField("total", DoubleType()),
    StructField("next_sid", LongType()),
])


def sessionize_stream(
    events: DataFrame,
    watermark: str = "30 minutes",
    gap_minutes: int = SESSION_GAP_MINUTES,
) -> DataFrame:
    """Streaming sessionization: custom stateful operator, one state entry
    per live user, closed sessions emitted as watermark passes the gap.
    ``gap_minutes`` threads through to the stateful closure so the stream
    structurally matches ``sessionize_batch(events, gap_minutes)`` — the
    round-3 form hardcoded 30 minutes regardless of the batch twin. The
    session timezone is read off the OWNING SparkSession so the closure
    stamps pandas' naive walls with the zone they were rendered in."""
    tz_name = events.sparkSession.conf.get(
        "spark.sql.session.timeZone", "UTC"
    ) or "UTC"
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_sessionize_fn(gap_minutes, tz_name),
            outputStructType=SESSION_SCHEMA,
            stateStructType=_SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def dedup_events_stream(
    events: DataFrame,
    keys: list[str],
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming deduplication on ``keys`` with bounded state:
    ``dropDuplicatesWithinWatermark`` keeps a key in the state store only
    until the watermark passes its event time, so state is O(live keys
    within the watermark horizon), not O(all keys ever seen) — the only
    dedup form that survives an unbounded stream. Emits the FIRST row
    seen per key (append mode); downstream aggregation happens on the
    sink table, keeping this the single stateful operator in the stream.
    """
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)


def stream_to_parquet(
    sdf: DataFrame,
    out_path: str,
    checkpoint_path: str,
) -> None:
    """Checkpointed parquet sink, availableNow trigger: the incremental
    ingestion shape. The checkpoint's source offsets + file-sink manifest
    give exactly-once across restarts — re-running with the same
    checkpoint processes only files not yet committed, and a re-run with
    nothing new writes nothing (asserted in tests). At scale this is the
    continuous version of the reference's monthly batch ingest."""
    with scoped_stream_shuffle(sdf.sparkSession):
        q = (
            sdf.writeStream.format("parquet")
            .option("path", out_path)
            .option("checkpointLocation", checkpoint_path)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()


def run_stream_to_table(sdf: DataFrame, table_name: str, output_mode: str = "complete") -> None:
    """Drain a stream into an in-memory sink with availableNow (test/dev
    harness; production would be a kafka/delta sink with a real trigger)."""
    with scoped_stream_shuffle(sdf.sparkSession):
        q = (
            sdf.writeStream.format("memory")
            .queryName(table_name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
