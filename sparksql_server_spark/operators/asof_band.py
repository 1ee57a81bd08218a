"""As-of and band (interval) joins — the two classic time-join shapes
Spark has no native operator for, each expressed as a scalable
composition (SURVEY.md §2 note: custom operators as compositions
before UDFs).

- **As-of join** (two tables): for every purchase event, the most
  recent click of the same user at-or-before it. Implemented with the
  union-window technique: interleave both sides into one keyed
  stream, sort within the key, and carry the last click timestamp
  forward — ONE shuffle on the key, no range join, no per-row probe.
  (DuckDB's native ASOF LEFT JOIN is the oracle.)

- **Band join** (no equi key): all event pairs within a ±2-minute
  band, across different users. A naive formulation is a cartesian
  inequality join (O(N²) — unrunnable at scale); here each left row
  joins only its own and adjacent 2-minute buckets (explode to 3
  bucket keys), making the pairwise work Σ bucket² on an equi-join.
  The band predicate filters exactly afterward.

Timestamps are compared in integer microseconds on both engines
(epoch micros) — exact arithmetic, no float time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sparksql_server_spark.catalog import table
from sparksql_server_spark.operators.registry import query

_BAND_US = 120_000_000  # ±2 minutes, in microseconds


@query(
    "asof_join_purchase_click",
    oracle="""
    SELECT p.event_id,
           p.user_id,
           CAST(date_trunc('second', c.ts) AS TIMESTAMP) AS last_click_at
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND c.ts <= p.ts
    """,
)
def asof_join_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-table as-of join via union-window (backward, inclusive).

    Clicks sort before purchases at equal timestamps (side key 0 < 1),
    so a running max over the preceding frame yields the last click
    at-or-before each purchase — exactly ASOF LEFT JOIN semantics.
    Output truncated to seconds (the parquet carries nanos; engines
    surface different sub-second precisions).
    """
    ev = table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", F.lit(0).alias("side")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.lit(1).alias("side")
    )
    both = clicks.unionByName(purchases)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = both.withColumn(
        "last_click_ts",
        F.max(F.when(F.col("side") == 0, F.col("ts"))).over(w),
    )
    return (
        carried.filter(F.col("side") == 1)
        .select(
            "event_id",
            "user_id",
            F.date_trunc("second", "last_click_ts").alias("last_click_at"),
        )
    )


@query(
    "band_join_nearby_events",
    oracle=f"""
    SELECT a.event_id AS a_id, b.event_id AS b_id,
           CAST(abs(epoch_us(b.ts) - epoch_us(a.ts)) AS BIGINT) AS gap_us
    FROM events a JOIN events b
      ON a.event_id < b.event_id
     AND a.user_id <> b.user_id
     AND abs(epoch_us(b.ts) - epoch_us(a.ts)) <= {_BAND_US}
    WHERE a.event_type = 'error' AND b.event_type = 'error'
    ORDER BY a_id, b_id
    """,
)
def band_join_nearby_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error events of different users within ±2 minutes of each other.

    No equi key exists, so the scalable plan manufactures one: bucket
    timestamps at the band width, explode each left row to its
    adjacent buckets {b-1, b, b+1}, equi-join on the bucket, then
    apply the exact band predicate. Every qualifying pair shares a
    bucket with exactly ONE of the three copies (the right row has a
    single bucket; the left copies are distinct), so no dedup pass is
    needed — and a.event_id < b.event_id emits each pair once.
    """
    ev = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "error")
        .select("event_id", "user_id", F.unix_micros("ts").alias("us"))
    )
    a = ev.select(
        F.col("event_id").alias("a_id"),
        F.col("user_id").alias("a_user"),
        F.col("us").alias("a_us"),
        F.explode(
            F.array(
                (F.col("us") / _BAND_US).cast("long") - 1,
                (F.col("us") / _BAND_US).cast("long"),
                (F.col("us") / _BAND_US).cast("long") + 1,
            )
        ).alias("bucket"),
    )
    b = ev.select(
        F.col("event_id").alias("b_id"),
        F.col("user_id").alias("b_user"),
        F.col("us").alias("b_us"),
        (F.col("us") / _BAND_US).cast("long").alias("bucket"),
    )
    return (
        a.join(b, "bucket")
        .filter(
            (F.col("a_id") < F.col("b_id"))
            & (F.col("a_user") != F.col("b_user"))
            & (F.abs(F.col("b_us") - F.col("a_us")) <= _BAND_US)
        )
        .select(
            "a_id", "b_id", F.abs(F.col("b_us") - F.col("a_us")).alias("gap_us")
        )
        .orderBy("a_id", "b_id")
    )
