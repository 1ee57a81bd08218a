"""Aggregation operators — TPC-H Q1 shape, distinct aggs, grouping sets.

Spark-first: groupBy+agg compiles to partial+final HashAggregate with
map-side combine (the modern ``reduceByKey``, SURVEY.md §2 A6 —
reference: SimpleAppClient.scala:57, DAGListener.scala:120-132).
ROLLUP/CUBE/GROUPING SETS expand in the optimizer; no extra scan.

Oracle parity: money aggregates use exact DECIMAL accumulation
(functions/portable.dsum — see its docstring for why engine round()
can't be used); the aggregation SQL is dialect-portable, so the same
text runs on Spark and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparksql_server_spark.catalog import register_tables, table
from sparksql_server_spark.functions.portable import davg, dsum
from sparksql_server_spark.operators.registry import query

# (1 - l_discount) and (1 - l_discount) * (1 + l_tax) are per-row double
# products — bit-identical across engines — cast to DECIMAL exactly
# (discount/tax carry 2 decimals, so the products carry ≤4). Widths are
# kept narrow: DuckDB's decimal multiply only widens to p1+p2 internally,
# so DECIMAL(12,2) × DECIMAL(10,8) → DECIMAL(18,10) (no overflow),
# while Spark gives DECIMAL(23,10); both are exact, both sum exactly.
_DISC = "CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(10,8))"
_CHARGE = (
    "CAST(l_extendedprice AS DECIMAL(12,2))"
    " * CAST((1 - l_discount) * (1 + l_tax) AS DECIMAL(10,8))"
)

_Q1_SQL = f"""
SELECT l_returnflag, l_linestatus,
       {dsum('l_quantity')}                      AS sum_qty,
       {dsum('l_extendedprice')}                 AS sum_base_price,
       CAST(sum({_DISC}) AS DOUBLE)              AS sum_disc_price,
       CAST(sum({_CHARGE}) AS DOUBLE)            AS sum_charge,
       {davg('l_quantity')}                      AS avg_qty,
       {davg('l_extendedprice')}                 AS avg_price,
       {davg('l_discount')}                      AS avg_disc,
       CAST(count(*) AS BIGINT)                  AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@query("agg_q1_pricing_summary", oracle=_Q1_SQL)
def agg_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 — the engine's flagship aggregation (also ``entry()``).

    One parquet scan (only the 7 referenced columns read), filter pushed
    to the scan, two-phase hash aggregation, tiny result. The SQL is
    dialect-portable, so the oracle is the same text.
    """
    register_tables(spark, sf_dir, ("lineitem",))
    return spark.sql(_Q1_SQL)


_CD_SQL = f"""
SELECT o_orderpriority,
       CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
       CAST(count(*) AS BIGINT)                  AS n_orders,
       {davg('o_totalprice')}                    AS avg_price
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@query("agg_count_distinct", oracle=_CD_SQL)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) alongside plain aggregates (planned as expand +
    two-phase agg by Catalyst)."""
    register_tables(spark, sf_dir, ("orders",))
    return spark.sql(_CD_SQL)


_GS_SELECT = f"""
    SELECT l_returnflag, l_linestatus,
           CAST(grouping(l_returnflag) AS INT)  AS g_flag,
           CAST(grouping(l_linestatus) AS INT)  AS g_status,
           {dsum('l_quantity')}                 AS sum_qty,
           CAST(count(*) AS BIGINT)             AS cnt
    FROM lineitem
"""
_GS_ORDER = "ORDER BY g_flag, g_status, l_returnflag, l_linestatus"


@query(
    "agg_grouping_sets",
    oracle=f"""
    {_GS_SELECT}
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    {_GS_ORDER}
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir, ("lineitem",))
    return spark.sql(
        f"{_GS_SELECT} GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),"
        f" (l_returnflag), ()) {_GS_ORDER}"
    )


@query(
    "agg_rollup",
    oracle=f"{_GS_SELECT} GROUP BY ROLLUP (l_returnflag, l_linestatus) {_GS_ORDER}",
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir, ("lineitem",))
    return spark.sql(f"{_GS_SELECT} GROUP BY ROLLUP (l_returnflag, l_linestatus) {_GS_ORDER}")


@query(
    "agg_cube",
    oracle=f"{_GS_SELECT} GROUP BY CUBE (l_returnflag, l_linestatus) {_GS_ORDER}",
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir, ("lineitem",))
    return spark.sql(f"{_GS_SELECT} GROUP BY CUBE (l_returnflag, l_linestatus) {_GS_ORDER}")


@query(
    "agg_approx_vs_exact",
    oracle="""
    SELECT l_returnflag,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS exact_supps
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def agg_approx_vs_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct counts (the oracle-checkable half; approx_count_distinct
    is exercised in tests where engine-specific sketches can't hash-match)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("exact_parts"),
            F.countDistinct("l_suppkey").alias("exact_supps"),
        )
        .orderBy("l_returnflag")
    )
