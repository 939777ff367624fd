"""Streaming-surface queries over the ``events`` table (SURVEY.md §2.11
stretch surface + window-function coverage).

Each batch query is oracle-checked against DuckDB. ``stream_window_counts``
runs the REAL Structured Streaming engine (file source → watermark →
windowed agg → complete-mode memory sink, availableNow trigger) and shares
the tumbling-window oracle: stream ≡ batch ≡ ANSI SQL is the parity claim.
"""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from building_permissions_etl_spark.catalog import load_table
from building_permissions_etl_spark.streaming.events import (
    dedup_events_stream,
    read_events_stream,
    run_stream_to_table,
    sessionize_batch,
    windowed_event_counts,
)

_TUMBLING_ORACLE = """
    SELECT to_timestamp(floor(epoch(ts) / 3600) * 3600)::TIMESTAMP AS window_start,
           event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 6) AS total_value
    FROM events
    GROUP BY 1, 2
"""

_mem_ids = itertools.count()


def contribute(register) -> None:
    # A4-over-events, streaming shape: tumbling 1h window per event_type.
    def tumbling(spark, sf):
        return windowed_event_counts(load_table(spark, "events", sf))

    register("event_window_counts", tumbling, _TUMBLING_ORACLE)

    # Sliding windows: 1h length, 30m slide. Oracle expands each event into
    # its two containing windows (epoch-aligned, like Spark's window()).
    def sliding(spark, sf):
        return windowed_event_counts(
            load_table(spark, "events", sf), "1 hour", slide="30 minutes"
        )

    register(
        "event_sliding_window",
        sliding,
        """
        WITH g AS (
          SELECT e.ts, e.event_type, e.value,
                 to_timestamp(floor(epoch(e.ts) / 1800) * 1800
                              - k.k * 1800)::TIMESTAMP AS window_start
          FROM events e CROSS JOIN (SELECT unnest([0, 1]) AS k) k
        )
        SELECT window_start, event_type,
               CAST(count(*) AS BIGINT) AS n_events,
               round(sum(value), 6) AS total_value
        FROM g
        WHERE ts < window_start + INTERVAL 1 HOUR
        GROUP BY 1, 2
        """,
    )

    # Gap-based sessionization, batch shape (lag → flag → running sum).
    # The streaming twin (applyInPandasWithState) is exercised in
    # tests/test_streaming.py where its append-mode emission semantics
    # (sessions close as the watermark passes) can be driven batch-by-batch.
    def sessions(spark, sf):
        return sessionize_batch(load_table(spark, "events", sf))

    register(
        "event_sessionization",
        sessions,
        """
        WITH lagged AS (
          SELECT user_id, ts, value,
                 CASE WHEN lag(ts) OVER w IS NULL
                        OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                      THEN 1 ELSE 0 END AS new_session
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ),
        tagged AS (
          SELECT *, CAST(sum(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
          FROM lagged
        )
        SELECT user_id, session_id,
               min(ts) AS session_start, max(ts) AS session_end,
               CAST(count(*) AS BIGINT) AS n_events,
               round(sum(value), 6) AS total_value
        FROM tagged GROUP BY 1, 2
        """,
    )

    # JSON property extraction (events.props is a JSON string).
    def json_props(spark, sf):
        ev = load_table(spark, "events", sf)
        k = F.get_json_object("props", "$.k").cast("long")
        return (
            ev.select("event_type", k.alias("k"))
            .groupBy("event_type")
            .agg(
                F.count("k").alias("n_with_k"),
                F.sum("k").alias("sum_k"),
                F.min("k").alias("min_k"),
                F.max("k").alias("max_k"),
            )
        )

    register(
        "event_json_props",
        json_props,
        """
        SELECT event_type,
               CAST(count(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS n_with_k,
               CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
               CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
               CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
        FROM events GROUP BY 1
        """,
    )

    # Map-typed nested data: props parsed as map<string,string> (not
    # per-path extraction like event_json_props) — map_keys exploded into
    # a key histogram. Covers the from_json → MapType → explode path.
    def props_keys(spark, sf):
        ev = load_table(spark, "events", sf)
        m = F.from_json("props", "map<string,string>")
        return (
            ev.select(F.explode(F.map_keys(m)).alias("key"))
            .groupBy("key")
            .agg(F.count(F.lit(1)).alias("n_events"))
            .orderBy("key")
        )

    register(
        "props_key_histogram",
        props_keys,
        """
        WITH k AS (SELECT unnest(json_keys(props)) AS key FROM events)
        SELECT key, CAST(count(*) AS BIGINT) AS n_events
        FROM k GROUP BY 1 ORDER BY 1
        """,
    )

    # As-of join (backward): each click picks up the most recent error at
    # or before it for the same user. Oracle is DuckDB's native ASOF JOIN.
    def asof_last_error(spark, sf):
        from building_permissions_etl_spark.operators.asof import asof_join_backward

        ev = load_table(spark, "events", sf)
        clicks = ev.filter(F.col("event_type") == "click").select(
            "event_id", "user_id", "ts"
        )
        errors = ev.filter(F.col("event_type") == "error").select(
            "user_id", "ts", F.col("value").alias("err_value")
        )
        return (
            asof_join_backward(
                clicks, errors, key="user_id", left_ts="ts", right_ts="ts",
                value_cols=["err_value"],
            )
            .withColumnRenamed("__matched_ts", "err_ts")
            .orderBy("event_id")
        )

    register(
        "asof_join_last_error",
        asof_last_error,
        """
        WITH clicks AS (
          SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
        ),
        errors AS (
          SELECT user_id, ts, value AS err_value FROM events
          WHERE event_type = 'error'
        )
        SELECT c.event_id, c.user_id, c.ts,
               e.err_value, e.ts AS err_ts
        FROM clicks c ASOF LEFT JOIN errors e
          ON c.user_id = e.user_id AND c.ts >= e.ts
        ORDER BY c.event_id
        """,
    )

    # Event-gap stats (§2.5 lead): per event_type, the mean/max seconds
    # until the same user's next event. ONE shuffle on user_id for the
    # lead window; the per-type aggregate reuses nothing wider than the
    # gap column.
    def event_gaps(spark, sf):
        from pyspark.sql.window import Window

        ev = load_table(spark, "events", sf)
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        # exact integer µs (unix_micros ↔ DuckDB epoch_us): fractional-
        # second epochs as doubles round differently across engines
        us = F.unix_micros(F.col("ts"))
        gap = F.lead(us).over(w) - us
        return (
            ev.select("event_type", gap.alias("gap_us"))
            .groupBy("event_type")
            .agg(
                F.count("gap_us").alias("n_gaps"),
                F.round(
                    F.sum("gap_us")
                    / (F.count("gap_us") * F.lit(1000000.0)), 6
                ).alias("avg_gap_s"),
                F.max("gap_us").alias("max_gap_us"),
            )
            .orderBy("event_type")
        )

    register(
        "event_gap_stats",
        event_gaps,
        """
        WITH g AS (
          SELECT event_type,
                 epoch_us(lead(ts) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id))
                   - epoch_us(ts) AS gap_us
          FROM events)
        SELECT event_type, CAST(count(gap_us) AS BIGINT) AS n_gaps,
               round(sum(gap_us) / (count(gap_us) * 1000000.0), 6)
                 AS avg_gap_s,
               CAST(max(gap_us) AS BIGINT) AS max_gap_us
        FROM g GROUP BY 1 ORDER BY 1
        """,
    )

    # As-of join (forward): each click picks up the NEXT error at or
    # after it for the same user. Same union-sort-carry machinery, window
    # ordered descending; oracle is DuckDB's ASOF with the flipped
    # inequality.
    def asof_next_error(spark, sf):
        from building_permissions_etl_spark.operators.asof import (
            asof_join_forward,
        )

        ev = load_table(spark, "events", sf)
        clicks = ev.filter(F.col("event_type") == "click").select(
            "event_id", "user_id", "ts"
        )
        errors = ev.filter(F.col("event_type") == "error").select(
            "user_id", "ts", F.col("value").alias("err_value")
        )
        return (
            asof_join_forward(
                clicks, errors, key="user_id", left_ts="ts", right_ts="ts",
                value_cols=["err_value"],
            )
            .withColumnRenamed("__matched_ts", "err_ts")
            .orderBy("event_id")
        )

    register(
        "asof_join_next_error",
        asof_next_error,
        """
        WITH clicks AS (
          SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
        ),
        errors AS (
          SELECT user_id, ts, value AS err_value FROM events
          WHERE event_type = 'error'
        )
        SELECT c.event_id, c.user_id, c.ts,
               e.err_value, e.ts AS err_ts
        FROM clicks c ASOF LEFT JOIN errors e
          ON c.user_id = e.user_id AND c.ts <= e.ts
        ORDER BY c.event_id
        """,
    )

    # Range join: (click, error) pairs for the same user within ±120 s,
    # bucketed equi-join instead of the quadratic theta join. The oracle
    # is the naive inequality join — same distinct triples.
    def clicks_near_errors(spark, sf):
        from building_permissions_etl_spark.operators.asof import range_join_binned

        ev = load_table(spark, "events", sf)
        clicks = ev.filter(F.col("event_type") == "click")
        errors = ev.filter(F.col("event_type") == "error").select(
            "user_id", F.col("ts").alias("err_ts")
        )
        return (
            range_join_binned(
                clicks, errors, key="user_id", left_ts="ts",
                right_ts="err_ts", tolerance_seconds=120,
            ).orderBy("user_id", "ts", "err_ts")
        )

    register(
        "range_join_clicks_errors",
        clicks_near_errors,
        """
        SELECT DISTINCT c.user_id, c.ts, e.ts AS err_ts
        FROM events c JOIN events e
          ON c.user_id = e.user_id
         AND c.event_type = 'click' AND e.event_type = 'error'
         AND abs(epoch(c.ts) - epoch(e.ts)) <= 120
        ORDER BY c.user_id, c.ts, err_ts
        """,
    )

    # The real streaming engine, end to end. Complete-mode memory sink ⇒
    # every window is emitted regardless of watermark, so the batch oracle
    # applies verbatim.
    def stream_tumbling(spark, sf):
        name = f"stream_window_counts_{next(_mem_ids)}"
        run_stream_to_table(
            windowed_event_counts(read_events_stream(spark, sf)), name
        )
        return spark.table(name)

    register("stream_window_counts", stream_tumbling, _TUMBLING_ORACLE)

    # Streaming dedup: dropDuplicatesWithinWatermark on (user_id,
    # event_type), append-mode sink, then a batch count over the deduped
    # sink table. One stateful operator in the stream; state bounded by
    # the watermark horizon. The whole fixture arrives in one availableNow
    # micro-batch, so exactly one row per key is emitted and the batch
    # DISTINCT oracle applies verbatim.
    def stream_dedup(spark, sf):
        name = f"stream_dedup_keys_{next(_mem_ids)}"
        run_stream_to_table(
            dedup_events_stream(
                read_events_stream(spark, sf), ["user_id", "event_type"]
            ),
            name,
            output_mode="append",
        )
        return (
            spark.table(name)
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_keys"))
            .orderBy("event_type")
        )

    register(
        "stream_dedup_keys",
        stream_dedup,
        """
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_keys
        FROM (SELECT DISTINCT user_id, event_type FROM events)
        GROUP BY 1 ORDER BY 1
        """,
    )

    # Stream-stream interval join: clicks ⋈ errors for the same user
    # within ±120 s, BOTH sides watermarked (the time-range predicate +
    # watermarks bound each side's join state — without them the state
    # store grows forever). Append mode; the fixture arrives in one
    # availableNow batch so every qualifying pair is emitted exactly
    # once and the batch inequality-join oracle applies verbatim.
    def stream_join(spark, sf):
        name = f"stream_join_{next(_mem_ids)}"
        clicks = (
            read_events_stream(spark, sf)
            .filter(F.col("event_type") == "click")
            .select("user_id", F.col("ts").alias("click_ts"))
            .withWatermark("click_ts", "10 minutes")
        )
        errors = (
            read_events_stream(spark, sf)
            .filter(F.col("event_type") == "error")
            .select(
                F.col("user_id").alias("err_user"),
                F.col("ts").alias("err_ts"),
            )
            .withWatermark("err_ts", "10 minutes")
        )
        joined = clicks.join(
            errors,
            F.expr(
                "user_id = err_user AND err_ts BETWEEN "
                "click_ts - INTERVAL 120 SECONDS AND "
                "click_ts + INTERVAL 120 SECONDS"
            ),
        ).select("user_id", "click_ts", "err_ts")
        run_stream_to_table(joined, name, output_mode="append")
        return spark.table(name).orderBy("user_id", "click_ts", "err_ts")

    register(
        "stream_stream_join",
        stream_join,
        """
        SELECT c.user_id, c.ts AS click_ts, e.ts AS err_ts
        FROM events c JOIN events e
          ON c.user_id = e.user_id
         AND c.event_type = 'click' AND e.event_type = 'error'
         AND e.ts BETWEEN c.ts - INTERVAL 120 SECOND
                      AND c.ts + INTERVAL 120 SECOND
        ORDER BY 1, 2, 3
        """,
    )

    # Native session_window aggregation (the engine-level sibling of the
    # gaps-and-islands sessionization above): Spark fuses session
    # assignment INTO the aggregation — one shuffle on (user_id), no
    # double window pass. Boundary semantics: window.start = first event,
    # window.end = last event + gap; the oracle replays that with the
    # islands construction. Same 30-minute gap as sessionize_batch.
    def native_session_window(spark, sf):
        ev = load_table(spark, "events", sf)
        sw = F.session_window("ts", "30 minutes")
        return (
            ev.groupBy("user_id", sw)
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum("value"), 6).alias("total_value"))
            .select(
                "user_id",
                F.col("session_window.start").alias("session_start"),
                F.col("session_window.end").alias("session_end"),
                "n_events", "total_value",
            )
            .orderBy("user_id", "session_start")
        )

    register(
        "native_session_window",
        native_session_window,
        """
        WITH lagged AS (
          SELECT user_id, ts, value,
                 CASE WHEN lag(ts) OVER w IS NULL
                        OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                      THEN 1 ELSE 0 END AS new_session
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ),
        tagged AS (
          SELECT *, sum(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts
                   ROWS UNBOUNDED PRECEDING) AS session_id
          FROM lagged
        )
        SELECT user_id, min(ts) AS session_start,
               max(ts) + INTERVAL 30 MINUTE AS session_end,
               CAST(count(*) AS BIGINT) AS n_events,
               round(sum(value), 6) AS total_value
        FROM tagged GROUP BY user_id, session_id
        ORDER BY user_id, session_start
        """,
    )

    # The SAME session aggregation through the REAL streaming engine:
    # file source → session_window groupBy → complete-mode memory sink
    # (availableNow). Stream ≡ batch ≡ ANSI SQL is the parity claim, as
    # with stream_window_counts. Complete mode keeps the final state
    # comparable without modeling watermark holdback; a production
    # deployment uses watermark + append against a kafka/table sink.
    def stream_sessions(spark, sf):
        name = f"stream_session_window_{next(_mem_ids)}"
        ev = read_events_stream(spark, sf)
        agg = (
            ev.groupBy("user_id", F.session_window("ts", "30 minutes"))
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum("value"), 6).alias("total_value"))
            .select(
                "user_id",
                F.col("session_window.start").alias("session_start"),
                F.col("session_window.end").alias("session_end"),
                "n_events", "total_value",
            )
        )
        run_stream_to_table(agg, name, output_mode="complete")
        return spark.table(name).orderBy("user_id", "session_start")

    register(
        "stream_session_window",
        stream_sessions,
        """
        WITH lagged AS (
          SELECT user_id, ts, value,
                 CASE WHEN lag(ts) OVER w IS NULL
                        OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                      THEN 1 ELSE 0 END AS new_session
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ),
        tagged AS (
          SELECT *, sum(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts
                   ROWS UNBOUNDED PRECEDING) AS session_id
          FROM lagged
        )
        SELECT user_id, min(ts) AS session_start,
               max(ts) + INTERVAL 30 MINUTE AS session_end,
               CAST(count(*) AS BIGINT) AS n_events,
               round(sum(value), 6) AS total_value
        FROM tagged GROUP BY user_id, session_id
        ORDER BY user_id, session_start
        """,
    )
