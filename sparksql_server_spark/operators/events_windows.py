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

from sparksql_server_spark.catalog import register_tables, table
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


_RESAMPLE_SPARK = """
WITH bounds AS (
  SELECT date_trunc('hour', min(ts)) AS lo, date_trunc('hour', max(ts)) AS hi
  FROM events),
grid AS (
  SELECT explode(sequence(lo, hi, INTERVAL 1 HOUR)) AS hour FROM bounds),
hourly AS (
  SELECT date_trunc('hour', ts) AS hour,
         count(*) AS n_events,
         CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
  FROM events GROUP BY date_trunc('hour', ts))
SELECT g.hour,
       CAST(coalesce(h.n_events, 0) AS BIGINT) AS n_events,
       coalesce(h.total_value, CAST(0.0 AS DOUBLE)) AS total_value
FROM grid g LEFT JOIN hourly h ON g.hour = h.hour
ORDER BY g.hour
"""

_RESAMPLE_DUCK = """
WITH bounds AS (
  SELECT date_trunc('hour', min(ts)) AS lo, date_trunc('hour', max(ts)) AS hi
  FROM events),
grid AS (
  SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS TIMESTAMP)
           AS hour
  FROM bounds),
hourly AS (
  SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
         count(*) AS n_events,
         CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
  FROM events GROUP BY 1)
SELECT g.hour,
       CAST(coalesce(h.n_events, 0) AS BIGINT) AS n_events,
       coalesce(h.total_value, 0.0) AS total_value
FROM grid g LEFT JOIN hourly h ON g.hour = h.hour
ORDER BY g.hour
"""


@query("events_resample_gapfill", oracle=_RESAMPLE_DUCK)
def events_resample_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly resample with gap fill — the continuous-aggregate
    ("hypertable rollup") shape: a generated time grid left-joined to
    the hourly aggregate, zeros for silent hours.

    Scale: the grid is hours-between-bounds (tiny — broadcast side);
    the aggregate is one map-side-combinable pass over events. The
    join never touches raw events, only the hourly rollup.
    """
    register_tables(spark, sf_dir, ("events",))
    return spark.sql(_RESAMPLE_SPARK)


_SCD2_SQL = """
SELECT user_id,
       CAST(value AS DOUBLE) AS bal,
       CAST(date_trunc('second', ts) AS TIMESTAMP) AS valid_from,
       CAST(date_trunc('second',
            lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
            AS TIMESTAMP) AS valid_to,
       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
         IS NULL AS is_current
FROM events
WHERE event_type = 'purchase'
"""


@query("scd2_intervals", oracle=_SCD2_SQL)
def scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 interval building: each change
    event opens a version valid until the user's next change
    (half-open [valid_from, valid_to)), latest row flagged current —
    one window pass, one shuffle on user_id. Second-truncated output:
    the raw column is nanosecond parquet surfaced at different
    precisions by the two engines."""
    register_tables(spark, sf_dir, ("events",))
    return spark.sql(_SCD2_SQL)


def _funnel_sql(sec_expr: str) -> str:
    """Staged conversion funnel, shared shape: per user, the first
    view, the first click strictly after it, the first purchase
    strictly after that. Stage ordering compares epoch SECONDS on both
    sides — the raw column is nanosecond parquet that Spark reads
    micros-truncated, so sub-second orderings would be engine-relative;
    at second granularity both engines see identical relations. NB the
    oracle must FLOOR DuckDB's epoch() (a DOUBLE whose ::BIGINT cast
    rounds half-up) to match Spark's flooring unix_timestamp — ~half
    of all events land on a different second otherwise."""
    return f"""
WITH e AS (SELECT user_id, event_type, {sec_expr} AS s FROM events),
v AS (SELECT user_id, min(s) AS t0 FROM e WHERE event_type = 'view'
      GROUP BY user_id),
c AS (SELECT e.user_id, min(e.s) AS t1
      FROM e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.s > v.t0 GROUP BY e.user_id),
p AS (SELECT e.user_id, min(e.s) AS t2
      FROM e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.s > c.t1 GROUP BY e.user_id)
SELECT CAST((SELECT count(*) FROM v) AS BIGINT) AS n_viewed,
       CAST((SELECT count(*) FROM c) AS BIGINT) AS n_clicked,
       CAST((SELECT count(*) FROM p) AS BIGINT) AS n_purchased,
       round(CAST((SELECT count(*) FROM c) AS DOUBLE)
             / (SELECT count(*) FROM v), 4)     AS view_to_click,
       round(CAST((SELECT count(*) FROM p) AS DOUBLE)
             / (SELECT count(*) FROM c), 4)     AS click_to_purchase
"""


@query("events_funnel", oracle=_funnel_sql("CAST(floor(epoch(ts)) AS BIGINT)"))
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion funnel over the event stream: users who viewed, then
    clicked strictly after their first view, then purchased strictly
    after that first click — stage counts plus conversion rates.

    Scale: each stage is one aggregation plus one equi-join on
    user_id, so the whole funnel shuffles on a single key; an N-stage
    funnel chains N-1 such joins with no blowup (each stage's output
    is <= distinct users).

    Round 12 (guide §2.4/§5): the oracle-shape readout takes the three
    counts as FIVE scalar subqueries, and each one re-inlines its whole
    stage chain (n_purchased alone re-runs view+click+purchase) — 15
    events scans in the physical plan for a 3-pass algorithm. Spark
    pins the per-user view/click stage tables (≤ |users| rows — the
    user-stage table a production funnel materializes anyway) and reads
    the counts off ONE left-join aggregate: count(*) over v ≡ |v|, and
    count(c.user_id)/count(p.user_id) ≡ |c|/|p| because each stage is
    GROUP BY user_id (unique keys, no fan-out) and c ⊆ v, p ⊆ c by
    construction. A global aggregate emits exactly one row even on an
    empty v, like the scalar-subquery form; the ratio expressions are
    the same functions of the same counts. 3 events scans, one readout.
    """
    from sparksql_server_spark.operators.scratch import pin_view

    register_tables(spark, sf_dir, ("events",))
    e_body = "SELECT user_id, event_type, unix_timestamp(ts) AS s FROM events"
    v = spark.sql(
        f"SELECT user_id, min(s) AS t0 FROM ({e_body}) e"
        " WHERE event_type = 'view' GROUP BY user_id"
    )
    pin_view(spark, v, "funnel_v")
    c = spark.sql(
        f"""SELECT e.user_id, min(e.s) AS t1
FROM ({e_body}) e JOIN funnel_v v ON e.user_id = v.user_id
WHERE e.event_type = 'click' AND e.s > v.t0 GROUP BY e.user_id"""
    )
    pin_view(spark, c, "funnel_c")
    return spark.sql(
        f"""
WITH p AS (
  SELECT e.user_id, min(e.s) AS t2
  FROM ({e_body}) e JOIN funnel_c c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.s > c.t1 GROUP BY e.user_id)
SELECT CAST(count(*) AS BIGINT) AS n_viewed,
       CAST(count(c.user_id) AS BIGINT) AS n_clicked,
       CAST(count(p.user_id) AS BIGINT) AS n_purchased,
       round(CAST(count(c.user_id) AS DOUBLE) / count(*), 4) AS view_to_click,
       round(CAST(count(p.user_id) AS DOUBLE) / count(c.user_id), 4)
         AS click_to_purchase
FROM funnel_v v
LEFT JOIN funnel_c c ON v.user_id = c.user_id
LEFT JOIN p ON v.user_id = p.user_id"""
    )
