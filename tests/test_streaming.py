"""Structured Streaming surface: stream ≡ batch parity for windowed
aggregation, and the stateful sessionization operator
(applyInPandasWithState) driven through real micro-batches."""

import datetime as dt
import shutil

import pytest
from pyspark.sql import functions as F

from building_permissions_etl_spark.catalog import load_table
from building_permissions_etl_spark.streaming.events import (
    dedup_events_stream,
    read_events_stream,
    run_stream_to_table,
    sessionize_batch,
    sessionize_stream,
    windowed_event_counts,
)

SF = "/root/testdata/sf0.001"


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_stream_window_counts_match_batch(spark):
    batch = windowed_event_counts(load_table(spark, "events", SF))
    run_stream_to_table(
        windowed_event_counts(read_events_stream(spark, SF)), "t_stream_win"
    )
    stream = spark.table("t_stream_win")
    cols = ["window_start", "event_type", "n_events", "total_value"]
    assert _rows(stream, cols) == _rows(batch, cols)


def test_sliding_windows_cover_each_event_twice(spark):
    ev = load_table(spark, "events", SF)
    slid = windowed_event_counts(ev, "1 hour", slide="30 minutes")
    assert (
        slid.agg(F.sum("n_events")).first()[0] == 2 * ev.count()
    )


def test_batch_sessionization_invariants(spark):
    ev = load_table(spark, "events", SF)
    s = sessionize_batch(ev).cache()
    # every event lands in exactly one session
    assert s.agg(F.sum("n_events")).first()[0] == ev.count()
    # sessions never exceed the gap between consecutive events
    bad = s.filter(
        F.col("session_end").cast("long") - F.col("session_start").cast("long")
        < 0
    ).count()
    assert bad == 0
    # session ids dense per user starting at 1
    firsts = s.groupBy("user_id").agg(
        F.min("session_id").alias("lo"),
        F.max("session_id").alias("hi"),
        F.count(F.lit(1)).alias("n"),
    )
    assert firsts.filter((F.col("lo") != 1) | (F.col("hi") != F.col("n"))).count() == 0


@pytest.fixture()
def micro_batches(spark, tmp_path):
    """Split one user's events into 3 chronological parquet files so the
    file source replays them as ordered micro-batches."""
    ev = (
        load_table(spark, "events", SF)
        .orderBy("ts")
        .limit(300)
        .toPandas()
        .sort_values("ts")
        .reset_index(drop=True)
    )
    d = tmp_path / "stream_src"
    d.mkdir()
    for i, chunk in enumerate([ev.iloc[:100], ev.iloc[100:200], ev.iloc[200:]]):
        spark.createDataFrame(chunk).coalesce(1).write.parquet(str(d / f"b{i}"))
    yield str(d)
    shutil.rmtree(str(d), ignore_errors=True)


def test_stateful_sessionization_emits_closed_sessions(spark, micro_batches):
    src = (
        spark.readStream.schema(
            load_table(spark, "events", SF).schema
        ).option("maxFilesPerTrigger", 1).parquet(f"{micro_batches}/b*")
    )
    run_stream_to_table(
        sessionize_stream(src, watermark="0 seconds"),
        "t_sessions",
        output_mode="append",
    )
    got = spark.table("t_sessions")
    # emitted sessions must agree with the batch shape on (start, end, n)
    batch = sessionize_batch(
        load_table(spark, "events", SF).orderBy("ts").limit(300)
    )
    got_keys = _rows(got, ["user_id", "session_start", "session_end", "n_events"])
    batch_keys = _rows(batch, ["user_id", "session_start", "session_end", "n_events"])
    assert len(got_keys) > 0
    assert set(got_keys) <= set(batch_keys)
    # ids must reproduce the batch 1-based numbering, not restart per batch
    cols = ["user_id", "session_id", "session_start", "session_end", "n_events"]
    assert set(_rows(got, cols)) <= set(_rows(batch, cols))


def test_stream_dedup_watermark_eviction_and_reemission(spark, tmp_path):
    """dropDuplicatesWithinWatermark's bounded-state contract, driven
    through real micro-batches: a duplicate key arriving while the first
    sighting is inside the watermark horizon is dropped; once the
    watermark passes (event time + delay) the key's state is EVICTED and
    a later reappearance is re-emitted — state is O(keys within the
    horizon), which is exactly the property that survives an unbounded
    stream."""
    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    # Watermark lags one batch (computed from data seen through batch
    # N-1) and state eviction runs at the END of a batch, after its input
    # is processed — so the watermark-advancing batch (b2) needs a filler
    # batch (b3) behind it before the evicted key can re-emit in b4.
    batches = [
        [(0, 1), (0, 2)],    # b0: first sightings of u1, u2
        [(5, 1), (5, 3)],    # b1: u1 dup inside 10-min horizon → dropped
        [(100, 9)],          # b2: pushes max event time to +100min
        [(101, 8)],          # b3: watermark now +90min; eviction runs
        [(95, 2)],           # b4: u2 state gone → re-emitted
    ]
    d = tmp_path / "dedup_src"
    d.mkdir()
    schema = ("event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    for i, batch in enumerate(batches):
        rows = [
            (100 * i + j, base + dt.timedelta(minutes=m), u, "click", 1.0, "{}")
            for j, (m, u) in enumerate(batch)
        ]
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(d / f"b{i}")
        )
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{d}/b*")
    )
    run_stream_to_table(
        dedup_events_stream(src, ["user_id"], watermark="10 minutes"),
        "t_stream_dedup",
        output_mode="append",
    )
    users = sorted(
        r["user_id"] for r in spark.table("t_stream_dedup").collect()
    )
    assert users == [1, 2, 2, 3, 8, 9]
    shutil.rmtree(str(d), ignore_errors=True)


def test_sessionize_counter_is_monotonic_across_batches():
    """Drive _sessionize_fn directly through two micro-batches and a
    timeout: session ids continue 1, 2, 3, ... instead of re-enumerating
    from 0 each batch (the round-1 defect)."""
    import pandas as pd

    from building_permissions_etl_spark.streaming.events import _sessionize_fn

    class FakeState:
        def __init__(self):
            self._v, self.hasTimedOut = None, False

        @property
        def exists(self):
            return self._v is not None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = tuple(v)

        def remove(self):
            self._v = None

        def setTimeoutTimestamp(self, ts):
            pass

    def batch(times):
        return [pd.DataFrame({
            "ts": [pd.Timestamp(t) for t in times],
            "value": [1.0] * len(times),
        })]

    st = FakeState()
    h = dt.datetime(2024, 1, 1, 0, 0, 0)
    gap = dt.timedelta(hours=2)
    # batch 1: two closed sessions + one open
    out1 = pd.concat(list(_sessionize_fn(
        (7,), batch([h, h + gap, h + 2 * gap]), st)))
    assert list(out1["session_id"]) == [1, 2]
    # batch 2: closes the open session, opens another
    out2 = pd.concat(list(_sessionize_fn(
        (7,), batch([h + 4 * gap, h + 6 * gap]), st)))
    assert list(out2["session_id"]) == [3, 4]
    # timeout: emits the open session with the NEXT id, keeps the counter
    st.hasTimedOut = True
    out3 = pd.concat(list(_sessionize_fn((7,), iter(()), st)))
    assert list(out3["session_id"]) == [5]
    st.hasTimedOut = False
    out4 = pd.concat(list(_sessionize_fn(
        (7,), batch([h + 20 * gap, h + 22 * gap]), st)))
    assert list(out4["session_id"]) == [6]


def test_stream_rejects_missing_path(spark):
    with pytest.raises(Exception):
        run_stream_to_table(
            windowed_event_counts(read_events_stream(spark, "/root/testdata/nope")),
            "t_nope",
        )


def test_stream_to_parquet_exactly_once(spark, tmp_path):
    """Checkpointed file sink: re-runs are exactly-once — an unchanged
    source adds nothing; a new source file adds only its own rows."""
    from building_permissions_etl_spark.streaming.events import stream_to_parquet

    ev = load_table(spark, "events", SF).orderBy("ts").limit(120).cache()
    src = tmp_path / "src"
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    ev.limit(100).coalesce(1).write.parquet(str(src / "b0"))

    def run():
        sdf = spark.readStream.schema(ev.schema).parquet(f"{src}/b*")
        stream_to_parquet(sdf, out, ckpt)

    run()
    assert spark.read.parquet(out).count() == 100
    run()   # same checkpoint, nothing new → no duplicates
    assert spark.read.parquet(out).count() == 100

    ev.subtract(ev.limit(100)).coalesce(1).write.parquet(str(src / "b1"))
    run()   # only the new file's rows land
    assert spark.read.parquet(out).count() == 120


def test_watermark_drops_late_rows_in_append_mode(spark, tmp_path):
    """Append-mode windowed agg: once the watermark passes a window, a
    late row for it is dropped, not double-counted. Two checkpointed
    runs guarantee batch separation (the watermark persists in the
    checkpoint between runs)."""
    import datetime as dt

    from building_permissions_etl_spark.streaming.events import stream_to_parquet

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    schema = ("event_id long, ts timestamp, user_id long, event_type string, "
              "value double, props string")
    src = tmp_path / "late_src"
    out, ckpt = str(tmp_path / "late_out"), str(tmp_path / "late_ckpt")
    b0 = [(1, base, 1, "click", 1.0, "{}"),
          (2, base + dt.timedelta(minutes=30), 1, "click", 1.0, "{}"),
          # advances the watermark far past the first hour window
          (3, base + dt.timedelta(hours=5), 1, "click", 1.0, "{}")]
    b1 = [(4, base + dt.timedelta(minutes=40), 1, "click", 1.0, "{}")]  # LATE

    def run():
        sdf = spark.readStream.schema(
            spark.createDataFrame([], schema).schema
        ).parquet(f"{src}/b*")
        stream_to_parquet(windowed_event_counts(sdf, watermark="10 minutes"),
                          out, ckpt)

    spark.createDataFrame(b0, schema).coalesce(1).write.parquet(str(src / "b0"))
    run()    # watermark ends at 04:50, first window not yet emitted
    spark.createDataFrame(b1, schema).coalesce(1).write.parquet(str(src / "b1"))
    run()    # late row < watermark: dropped; first window finalizes

    got = {r["window_start"]: r["n_events"]
           for r in spark.read.parquet(out).collect()}
    assert got.get(base) == 2    # late 40-minute row NOT double-counted


def test_sessionize_fn_merges_late_event_backward():
    """A late-but-admitted event EARLIER than the open session's stored
    start must extend the session backward (start min'd), matching what
    sessionize_batch computes over the same rows."""
    import datetime as dt

    import pandas as pd

    from building_permissions_etl_spark.streaming.events import _sessionize_fn

    class FakeState:
        def __init__(self):
            self._v, self.hasTimedOut = None, False
        @property
        def exists(self):
            return self._v is not None
        @property
        def get(self):
            return self._v
        def update(self, v):
            self._v = v
        def remove(self):
            self._v = None
        def setTimeoutTimestamp(self, ts):
            self.timeout = ts

    st = FakeState()
    t0 = dt.datetime(2023, 5, 1, 12, 0, 0)
    b1 = pd.DataFrame({"ts": [t0], "value": [1.0]})
    list(_sessionize_fn((7,), iter([b1]), st))
    # batch 2: an event 5 minutes EARLIER arrives (inside the gap)
    b2 = pd.DataFrame({"ts": [t0 - dt.timedelta(minutes=5)], "value": [2.0]})
    list(_sessionize_fn((7,), iter([b2]), st))
    start_us, end_us, n, total, sid = st.get
    assert n == 2 and sid == 1
    # session_start moved BACK to 11:55, end stays 12:00
    assert end_us - start_us == 5 * 60 * 1_000_000


def test_sessionize_stream_gap_minutes_threads_through(spark, tmp_path):
    """A 10-minute gap stream must split what the 30-minute default
    merges — parity with sessionize_batch(gap_minutes=10)."""
    import datetime as dt

    from building_permissions_etl_spark.streaming.events import (
        sessionize_batch,
        sessionize_stream,
    )

    base = dt.datetime(2023, 5, 1, 12, 0, 0)
    rows = [(1, base), (1, base + dt.timedelta(minutes=15)),
            (2, base)]
    src_dir = str(tmp_path / "src")
    spark.createDataFrame(
        rows, "user_id long, ts timestamp"
    ).withColumn("value", F.lit(1.0)).write.parquet(src_dir)
    stream = spark.readStream.schema(
        "user_id long, ts timestamp, value double").parquet(src_dir)
    out = sessionize_stream(stream, watermark="0 seconds", gap_minutes=10)
    q = (out.writeStream.format("memory").queryName("gap10")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    got = spark.sql("SELECT user_id, session_id, n_events FROM gap10")
    # user 1's two events are > 10 min apart: the FIRST session closes and
    # is emitted; the second stays open (no later watermark to flush it)
    emitted = {(r.user_id, r.session_id): r.n_events for r in got.collect()}
    assert emitted.get((1, 1)) == 1
    batch = sessionize_batch(
        spark.read.parquet(src_dir), gap_minutes=10)
    assert batch.filter("user_id = 1").count() == 2  # split in batch too
