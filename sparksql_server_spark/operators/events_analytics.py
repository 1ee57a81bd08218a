"""Market/ops-style analytics over the events table: OHLC bars, decayed
activity scores, per-window heavy hitters, anomaly flags.

Beyond the reference's literal surface (clients could submit any SQL —
SURVEY.md Layer-A note); these are the standard event-analytics shapes a
user of a time-windowed SQL engine runs daily. All pure codegen SQL —
no UDFs, no driver collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from sparksql_server_spark.catalog import table
from sparksql_server_spark.operators.registry import query


@query(
    "events_ohlc_bars",
    oracle="""
WITH b AS (
  SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bar_start, event_type, value,
         row_number() OVER (PARTITION BY date_trunc('hour', ts), event_type
                            ORDER BY ts, event_id) AS rn_open,
         row_number() OVER (PARTITION BY date_trunc('hour', ts), event_type
                            ORDER BY ts DESC, event_id DESC) AS rn_close
  FROM events)
SELECT bar_start, event_type,
       CAST(max(CASE WHEN rn_open = 1 THEN value END) AS DOUBLE)  AS open,
       CAST(max(value) AS DOUBLE)                                 AS high,
       CAST(min(value) AS DOUBLE)                                 AS low,
       CAST(max(CASE WHEN rn_close = 1 THEN value END) AS DOUBLE) AS close,
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)          AS volume,
       CAST(count(*) AS BIGINT)                                   AS n_events
FROM b GROUP BY bar_start, event_type
""",
)
def events_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC bars per event_type: open/close via row_number from
    either end of the bar (deterministic (ts, event_id) tiebreak), then
    one hash aggregation.

    Scale: the two window passes and the aggregate share one shuffle on
    (hour-bucket, event_type) — the natural time-series partitioning; a
    1000-executor run keys state by bucket so bars build map-side per
    partition. Same shape as a hypertable continuous-aggregate rollup.
    """
    ev = table(spark, sf_dir, "events").withColumn(
        "bar_start", F.date_trunc("hour", "ts").cast("timestamp")
    )
    asc = W.partitionBy("bar_start", "event_type").orderBy("ts", "event_id")
    desc = W.partitionBy("bar_start", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn_open", F.row_number().over(asc))
        .withColumn("rn_close", F.row_number().over(desc))
        .groupBy("bar_start", "event_type")
        .agg(
            F.max(F.when(F.col("rn_open") == 1, F.col("value"))).cast("double").alias("open"),
            F.max("value").cast("double").alias("high"),
            F.min("value").cast("double").alias("low"),
            F.max(F.when(F.col("rn_close") == 1, F.col("value"))).cast("double").alias("close"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("volume"),
            F.count("*").alias("n_events"),
        )

    )


@query(
    "events_decayed_score",
    oracle="""
WITH lagged AS (
  SELECT user_id, ts, event_id, value,
         lag(value, 1) OVER w AS v1,
         lag(value, 2) OVER w AS v2,
         lag(value, 3) OVER w AS v3,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT user_id, ts AS last_ts,
       CAST(
         (8 * CAST(value AS DECIMAL(18,6))
          + 4 * CAST(coalesce(v1, 0) AS DECIMAL(18,6))
          + 2 * CAST(coalesce(v2, 0) AS DECIMAL(18,6))
          + 1 * CAST(coalesce(v3, 0) AS DECIMAL(18,6))) AS DOUBLE)
       / (8 + CASE WHEN v1 IS NULL THEN 0 ELSE 4 END
            + CASE WHEN v2 IS NULL THEN 0 ELSE 2 END
            + CASE WHEN v3 IS NULL THEN 0 ELSE 1 END) AS score
FROM lagged WHERE rn = 1 ORDER BY user_id
""",
)
def events_decayed_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially-decayed activity score (bounded-horizon
    EWMA: weights 8/4/2/1 over the 4 most recent events), reported at
    each user's latest event.

    Integer weights on exact DECIMAL values keep the arithmetic
    engine-portable (a true infinite-horizon EWMA needs sequential
    recursion — the bounded FIR form is the standard distributed
    approximation and is one window pass).  Scale: single shuffle on
    user_id; state per row is 3 lags, independent of history length.
    """
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    wd = W.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    dec = lambda c: F.coalesce(c, F.lit(0)).cast("decimal(18,6)")  # noqa: E731
    lagged = (
        ev.withColumn("v1", F.lag("value", 1).over(w))
        .withColumn("v2", F.lag("value", 2).over(w))
        .withColumn("v3", F.lag("value", 3).over(w))
        .withColumn("rn", F.row_number().over(wd))
        .filter(F.col("rn") == 1)
    )
    wsum = (
        F.lit(8)
        + F.when(F.col("v1").isNull(), 0).otherwise(4)
        + F.when(F.col("v2").isNull(), 0).otherwise(2)
        + F.when(F.col("v3").isNull(), 0).otherwise(1)
    )
    num = (
        8 * F.col("value").cast("decimal(18,6)")
        + 4 * dec(F.col("v1"))
        + 2 * dec(F.col("v2"))
        + 1 * dec(F.col("v3"))
    ).cast("double")
    return lagged.select(
        "user_id",
        F.col("ts").alias("last_ts"),
        (num / wsum).alias("score"),
    ).orderBy("user_id")


@query(
    "events_heavy_hitters_daily",
    oracle="""
WITH counts AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day, user_id,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY day, user_id),
ranked AS (
  SELECT day, user_id, n_events,
         CAST(row_number() OVER (PARTITION BY day
                ORDER BY n_events DESC, user_id) AS BIGINT) AS pos
  FROM counts)
SELECT day, pos, user_id, n_events FROM ranked
WHERE pos <= 3 ORDER BY day, pos
""",
)
def events_heavy_hitters_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily heavy hitters: top-3 users by event count per day
    (deterministic user_id tiebreak).

    Scale: aggregate then per-day top-k — the rank filter compiles to
    WindowGroupLimit, so each shuffle partition keeps only 3 rows per
    day before the final exchange; never a global sort. At 100 TB the
    exact count feeding it is one combinable aggregation; swap in a
    count-min sketch only if per-day user cardinality itself explodes.
    """
    ev = table(spark, sf_dir, "events")
    counts = ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("day"), "user_id"
    ).agg(F.count("*").alias("n_events"))
    w = W.partitionBy("day").orderBy(F.col("n_events").desc(), "user_id")
    return (
        counts.withColumn("pos", F.row_number().over(w).cast("bigint"))
        .filter(F.col("pos") <= 3)
        .select("day", "pos", "user_id", "n_events")
        .orderBy("day", "pos")
    )


@query(
    "events_anomaly_zscore",
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY event_type, day),
stats AS (
  SELECT event_type,
         avg(CAST(n_events AS DOUBLE))    AS mean_n,
         stddev_samp(CAST(n_events AS DOUBLE)) AS sd_n
  FROM daily GROUP BY event_type)
SELECT d.event_type, d.day, d.n_events,
       (d.n_events - s.mean_n) / nullif(s.sd_n, 0) AS z,
       CASE WHEN abs((d.n_events - s.mean_n) / nullif(s.sd_n, 0)) > 2
            THEN TRUE ELSE FALSE END AS is_anomaly
FROM daily d JOIN stats s ON d.event_type = s.event_type
ORDER BY d.event_type, d.day
""",
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-anomaly detection: each (event_type, day) count scored as
    a z-score against that type's daily mean/stddev; |z| > 2 flagged.

    Scale: the daily rollup is the only data-sized shuffle; the
    per-type stats table is tiny (|event_types| rows), so Spark
    broadcasts it back — an aggregate-then-broadcast-join pattern that
    costs one pass regardless of input size. Integer daily counts make
    avg/stddev cross-engine stable at the comparator's precision.
    """
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.count("*").alias("n_events"))
    stats = daily.groupBy("event_type").agg(
        F.avg(F.col("n_events").cast("double")).alias("mean_n"),
        F.stddev_samp(F.col("n_events").cast("double")).alias("sd_n"),
    )
    z = (F.col("n_events") - F.col("mean_n")) / F.nullif(F.col("sd_n"), F.lit(0))
    return (
        daily.join(F.broadcast(stats), "event_type")
        .select(
            "event_type",
            "day",
            "n_events",
            z.alias("z"),
            (F.abs(z) > 2).alias("is_anomaly"),
        )
        .orderBy("event_type", "day")
    )


@query(
    "events_incremental_rollup",
    oracle="""
SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value,
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS avg_value
FROM events
GROUP BY event_type, day
ORDER BY event_type, day
""",
)
def events_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view refresh: the daily rollup is
    maintained as MERGEABLE PARTIAL STATES (count + exact-decimal sum),
    here demonstrated by computing two disjoint partials (event_id
    parity stands in for base-table vs newly-arrived delta) and merging
    them by re-aggregation; avg derives from the merged states at read
    time. The oracle is the full recompute — merge(partials) must equal
    it exactly.

    Scale: this is the hypertable continuous-aggregate / streaming-
    state pattern: a 100 TB refresh touches only the delta partition,
    and the merge is a keyed sum over |dimension| rows, never a rescan
    of the base. Every aggregate here is algebraic (count, sum) so the
    merge is exact; avg/stddev-style metrics stay derived columns.
    """
    ev = table(spark, sf_dir, "events").withColumn(
        "day", F.date_trunc("day", "ts").cast("date")
    )

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("event_type", "day").agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("sum_value"),
        )

    base = partial(ev.filter(F.col("event_id") % 2 == 0))
    delta = partial(ev.filter(F.col("event_id") % 2 == 1))
    merged = (
        base.unionByName(delta)
        .groupBy("event_type", "day")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_value").alias("sum_value"),
        )
    )
    return merged.select(
        "event_type",
        "day",
        "n_events",
        F.col("sum_value").cast("double").alias("total_value"),
        (F.col("sum_value").cast("double") / F.col("n_events")).alias("avg_value"),
    ).orderBy("event_type", "day")


@query(
    "events_active_streaks",
    oracle="""
WITH days AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
  FROM events),
grouped AS (
  SELECT user_id, day,
         day - CAST(row_number() OVER (PARTITION BY user_id ORDER BY day) AS INTEGER)
           AS grp
  FROM days)
SELECT user_id, min(day) AS streak_start, max(day) AS streak_end,
       CAST(count(*) AS BIGINT) AS streak_days
FROM grouped GROUP BY user_id, grp
""",
)
def events_active_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: each user's maximal runs of CONSECUTIVE active
    days (the classic id-minus-row_number grouping — a calendar-gap
    twin of the time-gap sessionization operator).

    Scale: distinct day set per user is tiny next to the event volume
    (the DISTINCT is the only data-sized shuffle, map-side combinable);
    the window and final aggregation both run inside the user_id
    partitioning, so the islands build without another exchange.
    """
    ev = table(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("day")
    ).distinct()
    w = W.partitionBy("user_id").orderBy("day")
    grouped = days.withColumn(
        "grp", F.date_sub("day", F.row_number().over(w).cast("int"))
    )
    return (
        grouped.groupBy("user_id", "grp")
        .agg(
            F.min("day").alias("streak_start"),
            F.max("day").alias("streak_end"),
            F.count("*").alias("streak_days"),
        )
        .drop("grp")
        .select("user_id", "streak_start", "streak_end", "streak_days")

    )


@query(
    "events_rfm_segments",
    oracle="""
WITH per_user AS (
  SELECT user_id,
         max(ts)                                           AS last_seen,
         CAST(count(*) AS BIGINT)                          AS frequency,
         CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS monetary
  FROM events GROUP BY user_id),
scored AS (
  SELECT user_id, last_seen, frequency, monetary,
         CAST(ntile(4) OVER (ORDER BY last_seen, user_id)  AS INT) AS r_score,
         CAST(ntile(4) OVER (ORDER BY frequency, user_id)  AS INT) AS f_score,
         CAST(ntile(4) OVER (ORDER BY monetary, user_id)   AS INT) AS m_score
  FROM per_user)
SELECT user_id, frequency, monetary, r_score, f_score, m_score,
       CAST(r_score * 100 + f_score * 10 + m_score AS INT) AS rfm
FROM scored ORDER BY user_id
""",
)
def events_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency/frequency/monetary) user segmentation: per-user
    aggregates quartile-scored with ntile — the standard marketing
    segmentation rollup. Ties are broken by user_id in every ntile
    ordering so bucket membership is deterministic cross-engine.

    Scale: one keyed aggregation over events, then three window passes
    over the |users| rollup (small relation). A 100 TB deployment with
    billions of users replaces exact ntile with approx-quantile cutoffs
    broadcast as literals — one pass, same output schema.
    """
    ev = table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.max("ts").alias("last_seen"),
        F.count("*").alias("frequency"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("monetary"),
    )
    r = W.orderBy("last_seen", "user_id")
    f = W.orderBy("frequency", "user_id")
    m = W.orderBy("monetary", "user_id")
    scored = (
        per_user.withColumn("r_score", F.ntile(4).over(r).cast("int"))
        .withColumn("f_score", F.ntile(4).over(f).cast("int"))
        .withColumn("m_score", F.ntile(4).over(m).cast("int"))
    )
    return scored.select(
        "user_id",
        "frequency",
        "monetary",
        "r_score",
        "f_score",
        "m_score",
        (F.col("r_score") * 100 + F.col("f_score") * 10 + F.col("m_score"))
        .cast("int")
        .alias("rfm"),
    ).orderBy("user_id")


_WINDOW_DEDUP_SQL = """
WITH ranked AS (
  SELECT event_id, user_id, event_type,
         row_number() OVER (
           PARTITION BY user_id, event_type, date_trunc('hour', ts)
           ORDER BY ts, event_id) AS rn
  FROM events)
SELECT event_id, user_id, event_type
FROM ranked WHERE rn = 1
"""


@query("events_window_dedup_first", oracle=_WINDOW_DEDUP_SQL)
def events_window_dedup_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed dedup: keep the FIRST event per (user, type, hour) —
    the batch twin of streaming `dropDuplicatesWithinWatermark`
    (tests/test_streaming_sources.py covers the stream form): repeated
    signals inside a window collapse to one, late replays drop out.

    Scale: one shuffle on the composite (user_id, event_type, hour)
    key; the window frame is row_number-only (no running aggregates),
    so it streams within each partition. Ties on ts break by event_id
    — the survivor is deterministic under concurrent duplicates.
    """
    table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_WINDOW_DEDUP_SQL)
