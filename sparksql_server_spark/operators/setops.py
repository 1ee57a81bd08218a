"""Set operations — UNION / UNION ALL / INTERSECT / EXCEPT.

Over the nation keys of customer vs supplier (FIXTURES.md §2).
Spark-first: INTERSECT/EXCEPT plan as left-semi/left-anti joins over
distinct inputs; UNION is a no-shuffle concat (dedup adds one agg).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparksql_server_spark.catalog import table
from sparksql_server_spark.operators.registry import query


def _cust_nations(spark, sf_dir):
    return table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))


def _supp_nations(spark, sf_dir):
    return table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))


@query(
    "setop_union_distinct",
    oracle="""
    SELECT nationkey FROM (
      SELECT c_nationkey AS nationkey FROM customer
      UNION
      SELECT s_nationkey AS nationkey FROM supplier)
    ORDER BY nationkey
    """,
)
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _cust_nations(spark, sf_dir)
        .union(_supp_nations(spark, sf_dir))
        .distinct()
        .orderBy("nationkey")
    )


@query(
    "setop_union_all",
    oracle="""
    SELECT nationkey, CAST(count(*) AS BIGINT) AS n FROM (
      SELECT c_nationkey AS nationkey FROM customer
      UNION ALL
      SELECT s_nationkey AS nationkey FROM supplier)
    GROUP BY nationkey
    ORDER BY nationkey
    """,
)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL keeps duplicates; aggregated so the result is small and
    the check is order-insensitive-stable."""
    return (
        _cust_nations(spark, sf_dir)
        .union(_supp_nations(spark, sf_dir))
        .groupBy("nationkey")
        .agg(F.count("*").alias("n"))
        .orderBy("nationkey")
    )


@query(
    "setop_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    ORDER BY nationkey
    """,
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _cust_nations(spark, sf_dir)
        .intersect(_supp_nations(spark, sf_dir))
        .orderBy("nationkey")
    )


@query(
    "setop_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier
    ORDER BY nationkey
    """,
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    # subtract == EXCEPT DISTINCT (SQL standard semantics)
    return (
        _cust_nations(spark, sf_dir)
        .subtract(_supp_nations(spark, sf_dir))
        .orderBy("nationkey")
    )


@query(
    "setop_except_all",
    oracle="""
    SELECT nationkey FROM (
      SELECT c_nationkey AS nationkey FROM customer
      EXCEPT ALL
      SELECT s_nationkey AS nationkey FROM supplier)
""",
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset difference: keeps surplus duplicates (a nation with 40
    customers and 3 suppliers survives 37 times)."""
    return (
        _cust_nations(spark, sf_dir)
        .exceptAll(_supp_nations(spark, sf_dir))

    )


@query(
    "setop_intersect_all",
    oracle="""
    SELECT nationkey FROM (
      SELECT c_nationkey AS nationkey FROM customer
      INTERSECT ALL
      SELECT s_nationkey AS nationkey FROM supplier)
    ORDER BY nationkey
    """,
)
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset intersection: min(multiplicity) per value."""
    return (
        _cust_nations(spark, sf_dir)
        .intersectAll(_supp_nations(spark, sf_dir))
        .orderBy("nationkey")
    )
