"""Time-window analytics over the events table (batch form).

The reference is batch-only (SURVEY.md §1.3); the events table is
handled as time-windowed batch SQL per SURVEY.md §7. The Structured
Streaming variant of the same aggregation lives in
``sparksql_server_spark.streaming`` and is exercised in tests (no
DuckDB oracle for stream semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from sparksql_server_spark.catalog import table
from sparksql_server_spark.operators.registry import query


@query(
    "events_tumbling_hour",
    oracle="""
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
           event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY window_start, event_type
    ORDER BY window_start, event_type
    """,
)
def events_tumbling_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly tumbling window via date_trunc (plain groupBy at scale)."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("hour", "ts").cast("timestamp").alias("window_start"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
        )
        .orderBy("window_start", "event_type")
    )


@query(
    "events_window_fn",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start,
           CAST(count(*) AS BIGINT)  AS n_events,
           (CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / count(value))
             AS avg_value
    FROM events
    GROUP BY window_start
    ORDER BY window_start
    """,
)
def events_window_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's native window() operator (1-day tumbling). For aligned
    tumbling windows window.start ≡ date_trunc — which is the oracle."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 day").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            (
                F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
                / F.count("value")
            ).alias("avg_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "avg_value")
        .orderBy("window_start")
    )


@query(
    "events_sessionize",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS brk
      FROM events)
    SELECT user_id,
           CAST(sum(brk) + 1 AS BIGINT) AS n_sessions,
           CAST(count(*) AS BIGINT)     AS n_events
    FROM marked
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (30-min inactivity gap): lag + gap-marking + count.

    The batch analogue of streaming session_window; one shuffle on
    user_id serves both the window and the final aggregation.
    """
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    marked = ev.select(
        "user_id",
        F.when(
            F.col("ts") - F.lag("ts").over(w) > F.expr("INTERVAL 30 MINUTE"), 1
        )
        .otherwise(0)
        .alias("brk"),
    )
    return (
        marked.groupBy("user_id")
        .agg(
            (F.sum("brk") + 1).cast("long").alias("n_sessions"),
            F.count("*").alias("n_events"),
        )
        .orderBy("user_id")
    )
