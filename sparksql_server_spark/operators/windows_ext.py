"""Extended window functions — ntile/percent_rank/cume_dist,
first/last/nth value, ROWS moving frames, and numeric RANGE frames.

Widens the window coverage of operators/windows.py (rank/row_number/
lag/lead/running sums). The reference's ambient surface is any Spark
SQL (SURVEY.md §2 Layer A note); these are the remaining canonical
window shapes an analytics user expects.

Determinism notes: every OVER (... ORDER BY ...) carries a unique
tiebreak key so rank-based functions agree across engines;
percent_rank/cume_dist are rank ratios (exact integer ratios in
double), identical in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sparksql_server_spark.catalog import register_tables, table
from sparksql_server_spark.operators.registry import query


@query(
    "win_ntile_pct",
    oracle="""
    SELECT c_custkey,
           CAST(ntile(4) OVER w AS INT)       AS quartile,
           percent_rank() OVER w              AS pct_rank,
           cume_dist() OVER w                 AS cdist
    FROM customer
    WINDOW w AS (ORDER BY c_acctbal, c_custkey)
    """,
)
def win_ntile_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quartile bucketing + distribution ranks over account balance
    (unique tiebreak on custkey keeps bucket edges engine-identical).

    Scale: a single global ORDER BY window — the one shape that cannot
    parallelize as-is. At 100 TB use the per-group form below or
    approx percentiles; kept here because the semantics are part of
    the surface.
    """
    c = table(spark, sf_dir, "customer")
    w = Window.orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        F.ntile(4).over(w).cast("int").alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cdist"),
    )


@query(
    "win_first_last_nth",
    oracle="""
    SELECT o_orderkey, o_custkey,
           first_value(o_totalprice) OVER w AS first_price,
           last_value(o_totalprice)  OVER w AS last_price,
           nth_value(o_totalprice, 3) OVER w AS third_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def win_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth order price per customer — with the explicit
    full-partition frame (the default frame stops at CURRENT ROW, where
    last_value degenerates; both engines agree once the frame is
    spelled out). One shuffle on o_custkey."""
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w).alias("last_price"),
        F.nth_value("o_totalprice", 3).over(w).alias("third_price"),
    )


@query(
    "win_moving_avg",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) OVER w AS DOUBLE)
             / count(*) OVER w AS moving_avg_4
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
    """,
)
def win_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 4-order moving average per customer (ROWS frame;
    exact-decimal sum / count so the double is engine-identical)."""
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-3, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        (
            F.sum(F.col("o_totalprice").cast("decimal(18,6)")).over(w).cast("double")
            / F.count("*").over(w)
        ).alias("moving_avg_4"),
    )


@query(
    "win_range_trailing_30d",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(count(*) OVER w AS BIGINT) AS n_orders_30d,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) OVER w AS DOUBLE)
             AS spend_30d
    FROM (SELECT *, epoch(o_orderdate)::BIGINT AS ts_s FROM orders)
    WINDOW w AS (PARTITION BY o_custkey ORDER BY ts_s
                 RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW)
    """,
)
def win_range_trailing_30d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-based RANGE frame: per customer, orders and spend in the
    trailing 30 days (inclusive). ORDER BY epoch seconds so the frame
    bound is a plain numeric offset — portable across engines, and on
    Spark a RangeFrame over a long never needs interval arithmetic.

    Note RANGE frames are peer-inclusive: same-timestamp orders all
    join the frame, so no unique tiebreak is needed (or allowed) in
    the frame's ORDER BY.
    """
    register_tables(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey,
               CAST(count(*) OVER w AS BIGINT) AS n_orders_30d,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) OVER w AS DOUBLE)
                 AS spend_30d
        FROM (SELECT *, unix_timestamp(o_orderdate) AS ts_s FROM orders)
        WINDOW w AS (PARTITION BY o_custkey ORDER BY ts_s
                     RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW)
        """
    )


def _ignore_nulls_sql(dialect: str) -> str:
    """IGNORE NULLS placement differs: Spark puts the modifier after
    the call (``last_value(x) IGNORE NULLS OVER``), DuckDB inside the
    parens (``last_value(x IGNORE NULLS) OVER``)."""
    finished = "CASE WHEN o_orderstatus = 'F' THEN o_totalprice END"
    if dialect == "spark":
        last = f"last_value({finished}) IGNORE NULLS OVER w"
        prev = f"lag({finished}) IGNORE NULLS OVER w"
    else:
        last = f"last_value({finished} IGNORE NULLS) OVER w"
        prev = f"lag({finished} IGNORE NULLS) OVER w"
    return f"""
SELECT o_orderkey, o_custkey,
       {last} AS last_finished_price,
       {prev} AS prev_finished_price
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


@query("win_ignore_nulls", oracle=_ignore_nulls_sql("duck"))
def win_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IGNORE NULLS window semantics: per customer, the most recent
    finished-order price at (last_value) and strictly before (lag)
    each order — the gap-carrying idiom every event/CDC pipeline
    needs. No final global sort (presentational only; compare is
    order-insensitive)."""
    register_tables(spark, sf_dir, ("orders",))
    return spark.sql(_ignore_nulls_sql("spark"))
