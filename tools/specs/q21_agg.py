"""A/B spec: tpch_q21 canonical EXISTS/NOT-EXISTS form (a) vs
single-lineitem-scan aggregate decorrelation (b)."""

from pyspark.sql import functions as F
from pyspark.sql.window import Window

NAME = "tpch_q21_suppliers_kept_waiting"

_Q21_SQL = """
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders   ON o_orderkey = l1.l_orderkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE o_orderstatus = 'F'
  AND r_name = 'ASIA'
  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""


def build_a(spark, sf_dir):
    return spark.sql(_Q21_SQL)


def build_b(spark, sf_dir):
    li = spark.table("lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    ords = spark.table("orders").where(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    lat = (
        li.join(ords, li.l_orderkey == ords.o_orderkey)
        .select(
            "l_orderkey",
            "l_suppkey",
            (F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 60)).alias("late"),
        )
    )
    per_os = lat.groupBy("l_orderkey", "l_suppkey").agg(
        F.sum(F.col("late").cast("long")).alias("n_late_lines")
    )
    w = Window.partitionBy("l_orderkey")
    q = (
        per_os.withColumn("n_supp", F.count("*").over(w))
        .withColumn(
            "n_late_supp",
            F.sum((F.col("n_late_lines") > 0).cast("int")).over(w),
        )
        .where(
            (F.col("n_late_lines") > 0)
            & (F.col("n_supp") >= 2)
            & (F.col("n_late_supp") == 1)
        )
        .select("l_suppkey", "n_late_lines")
    )
    supp = (
        spark.table("supplier")
        .join(
            F.broadcast(spark.table("nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(
                spark.table("region").where(F.col("r_name") == "ASIA")
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name")
    )
    return (
        q.join(F.broadcast(supp), q.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.sum("n_late_lines").cast("bigint").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )
