"""A/B round 13 (VERDICT r12 #5): SPEC_TARGET=
  q15 — revenue CTE consumed twice (max subquery re-runs the lineitem
        aggregation, arm a) vs pinned revenue (arm b).
  q17 — Spark's decorrelated aggregate join (2 lineitem scans, arm a)
        vs ONE lineitem scan with the per-part threshold as a window
        over the brand-part join (arm b). Threshold arithmetic written
        exactly as the oracle text (0.2 * (CAST(sum(DECIMAL) AS
        DOUBLE) / count)).
SPEC_SWAP=1 swaps arms.
"""

import os

from sparksql_server_spark.catalog import register_tables
from sparksql_server_spark.operators import QUERIES
from sparksql_server_spark.operators.scratch import pin_view

TARGET = os.environ.get("SPEC_TARGET", "q15")
NAME = f"r13_{TARGET}"

_QNAME = {
    "q15": "tpch_q15_top_supplier",
    "q17": "tpch_q17_small_quantity",
}[TARGET]

_REV = (
    "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))"
    " * (1 - CAST(l_discount AS DECIMAL(18,6)))) AS DOUBLE)"
)

_Q15_REV_BODY = """
  SELECT l_suppkey AS supplier_no, CAST(sum({rev}) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey"""

_Q17_WINDOW_SQL = """
WITH j AS (
  SELECT l_quantity, l_extendedprice,
         0.2 * (CAST(sum(CAST(l_quantity AS DECIMAL(18,6)))
                       OVER (PARTITION BY l_partkey) AS DOUBLE)
                / count(l_quantity) OVER (PARTITION BY l_partkey)) AS thr
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_brand = 'Brand#11')
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / 7.0
         AS avg_yearly
FROM j WHERE l_quantity < thr
"""


def build_a(spark, sf_dir):  # current
    return QUERIES[_QNAME](spark, sf_dir)


def build_b(spark, sf_dir):
    if TARGET == "q15":
        from sparksql_server_spark.operators.tpch import _REV as rev

        register_tables(spark, sf_dir, ("supplier", "lineitem"))
        pin_view(spark, spark.sql(_Q15_REV_BODY.format(rev=rev)), "q15_revenue")
        return spark.sql(
            """
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN q15_revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM q15_revenue)
ORDER BY s_suppkey"""
        )
    register_tables(spark, sf_dir, ("lineitem", "part"))
    return spark.sql(_Q17_WINDOW_SQL)


if os.environ.get("SPEC_SWAP") == "1":
    build_a, build_b = build_b, build_a
