"""Streaming operator semantics, verified in batch mode (SURVEY.md §2.9).

``F.window`` and ``F.session_window`` are the same expressions
Structured Streaming uses; running them in batch lets the DuckDB oracle
verify the window semantics exactly. The true readStream/writeStream
path (file source, watermark, foreachBatch) lives in
hocr_de_noising_spark/streaming and is pytest-verified.

Window starts are emitted as epoch seconds (BIGINT) on both sides to
sidestep timezone-representation differences between engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hocr_de_noising_spark.queries.util import load, register


@register(
    "stream_tumbling",
    """SELECT CAST(floor(epoch(ts) / 300) * 300 AS BIGINT) AS w_start,
              event_type, count(*) AS n_events,
              round(sum(value), 4) AS total_value
       FROM events GROUP BY 1, 2""",
)
def stream_tumbling(spark, sf):
    """ST2: 5-minute tumbling window aggregation (epoch-aligned, same
    origin as Spark's streaming window operator)."""
    return (
        load(spark, sf, "events")
        .groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("w_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@register(
    "stream_session",
    """WITH e AS (
           SELECT user_id, event_id, ts,
                  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pts
           FROM events
       ),
       m AS (
           SELECT user_id, event_id, ts,
                  CASE WHEN pts IS NULL OR epoch(ts) - epoch(pts) >= 1800
                       THEN 1 ELSE 0 END AS brk
           FROM e
       ),
       s AS (
           SELECT user_id, ts,
                  sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
           FROM m
       )
       SELECT user_id, CAST(floor(epoch(min(ts))) AS BIGINT) AS session_start,
              count(*) AS n_events
       FROM s GROUP BY user_id, sid""",
)
def stream_session(spark, sf):
    """ST3: 30-minute-gap session windows; oracle = gaps-and-islands SQL
    (break when gap >= 30 min, matching Spark's exclusive session end)."""
    return (
        load(spark, sf, "events")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_timestamp(F.col("w.start")).alias("session_start"),
            "n_events",
        )
    )
