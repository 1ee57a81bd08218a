"""Window-function operators — ranking, running aggregates, lag/lead, top-k.

Spark-first: one shuffle per distinct (partitionBy, orderBy) pair; all
four queries below partition by customer so Catalyst reuses a single
sort+shuffle where windows share the spec.

Determinism: ROW_NUMBER always gets a total tiebreak (orderkey);
RANK/DENSE_RANK are value-deterministic under ties by construction.
Spark's ranking fns return INT, DuckDB's BIGINT → cast Spark side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from sparksql_server_spark.catalog import table
from sparksql_server_spark.operators.registry import query


@query(
    "win_rank_orders",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(row_number() OVER (PARTITION BY o_custkey
                 ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn,
           CAST(rank() OVER (PARTITION BY o_custkey
                 ORDER BY o_orderstatus) AS BIGINT) AS status_rank,
           CAST(dense_rank() OVER (PARTITION BY o_custkey
                 ORDER BY o_orderpriority) AS BIGINT) AS prio_dense_rank
    FROM orders
    """,
)
def win_rank_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """No final ORDER BY: the correctness compare is order-insensitive,
    and a presentational global sort over a full-table window output
    is a range shuffle a 100 TB plan must not pay (the window's own
    per-partition sorts are the semantic part and stay)."""
    o = table(spark, sf_dir, "orders")
    by_cust = W.partitionBy("o_custkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.row_number()
        .over(by_cust.orderBy(F.desc("o_totalprice"), "o_orderkey"))
        .cast("long")
        .alias("rn"),
        F.rank().over(by_cust.orderBy("o_orderstatus")).cast("long").alias("status_rank"),
        F.dense_rank()
        .over(by_cust.orderBy("o_orderpriority"))
        .cast("long")
        .alias("prio_dense_rank"),
    )


@query(
    "win_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,6)))
                 OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_spend
    FROM orders
    """,
)
def win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running per-customer spend (ROWS frame, total orderkey tiebreak).
    No final global sort — see win_rank_orders."""
    o = table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        # exact decimal accumulation (float window sums are order-exact
        # but engine round() diverges -- see functions/portable.dsum)
        F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
        .over(w)
        .cast("double")
        .alias("running_spend"),
    )


@query(
    "win_lag_lead",
    oracle="""
    SELECT o_custkey, o_orderkey,
           o_totalprice - lag(o_totalprice) OVER w  AS delta_prev,
           lead(o_totalprice) OVER w - o_totalprice AS delta_next
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """No final global sort — see win_rank_orders."""
    o = table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    price = F.col("o_totalprice")
    return o.select(
        "o_custkey",
        "o_orderkey",
        # raw double subtraction is bit-identical across engines
        (price - F.lag(price).over(w)).alias("delta_prev"),
        (F.lead(price).over(w) - price).alias("delta_next"),
    )


@query(
    "topk_global",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark plans TakeOrderedAndProject — per-partition
    heaps + driver merge, never a full sort at scale."""
    o = table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(10)
    )


@query(
    "topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(row_number() OVER (PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
      FROM orders)
    WHERE rn <= 3
""",
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer: window rank + filter. Spark pushes the
    rn<=3 predicate into the sort as a group-limit (WindowGroupLimit)."""
    o = table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        o.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )
