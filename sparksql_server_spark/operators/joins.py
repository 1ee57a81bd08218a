"""Join operators — inner/left/right/full/semi/anti/theta equi-joins.

The reference's own workloads contain no joins (SURVEY.md §2: clients
could submit any Spark 1.3.1 job, so the surface is ambient); FIXTURES.md
§2 declares the coverage. Spark-first notes:

- Dimension tables (region, nation) are explicitly ``broadcast()``-hinted:
  at 100 TB the fact side never shuffles for a dim join.
- customer/orders joins shuffle on the key; AQE handles skew at scale.
- Semi/anti joins are planned as LeftSemi/LeftAnti (no row duplication,
  no payload columns shuffled from the right side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparksql_server_spark.catalog import register_tables, table
from sparksql_server_spark.operators.registry import query


@query(
    "join_inner_4way",
    oracle="""
    SELECT r_name,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total_revenue,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name
    ORDER BY r_name
    """,
)
def join_inner_4way(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders ⋈ customer ⋈ nation ⋈ region — revenue per region.

    nation/region broadcast (tiny dims); orders⋈customer shuffles on the
    customer key. At scale, AQE converts to broadcast when the post-filter
    side fits under the threshold.
    """
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            # exact decimal sum -> double: engine round() on float sums
            # can't hash-match (see functions/portable.dsum)
            F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
            .cast("double")
            .alias("total_revenue"),
            F.count("*").alias("n_orders"),
        )
        .orderBy("r_name")
    )


@query(
    "join_left_outer",
    oracle="""
    SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS n_orders
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
""",
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with their order count, keeping zero-order customers."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))

    )


@query(
    "join_right_outer",
    oracle="""
    SELECT c_custkey,
           CAST(coalesce(sum(CAST(o_totalprice AS DECIMAL(18,6))), 0) AS DOUBLE)
             AS total_spend
    FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
    GROUP BY c_custkey
""",
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "right")
        .groupBy("c_custkey")
        .agg(
            F.coalesce(F.sum(F.col("o_totalprice").cast("decimal(18,6)")), F.lit(0))
            .cast("double")
            .alias("total_spend")
        )

    )


@query(
    "join_full_outer",
    oracle="""
    SELECT coalesce(cn, sn) AS nationkey,
           CAST(coalesce(nc, 0) AS BIGINT) AS n_customers,
           CAST(coalesce(ns, 0) AS BIGINT) AS n_suppliers
    FROM (SELECT c_nationkey AS cn, count(*) AS nc FROM customer GROUP BY c_nationkey) a
    FULL JOIN (SELECT s_nationkey AS sn, count(*) AS ns FROM supplier GROUP BY s_nationkey) b
      ON cn = sn
    ORDER BY nationkey
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation customer vs supplier counts, keeping nations present on
    only one side (full outer join of two pre-aggregations)."""
    c = (
        table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("cn"))
        .agg(F.count("*").alias("nc"))
    )
    s = (
        table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("sn"))
        .agg(F.count("*").alias("ns"))
    )
    return (
        c.join(s, c.cn == s.sn, "full")
        .select(
            F.coalesce("cn", "sn").alias("nationkey"),
            F.coalesce("nc", F.lit(0)).cast("long").alias("n_customers"),
            F.coalesce("ns", F.lit(0)).cast("long").alias("n_suppliers"),
        )
        .orderBy("nationkey")
    )


@query(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_totalprice > 100000)
""",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS → left-semi join: no duplication, right side reduced to keys."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_name")

    )


@query(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    ORDER BY c_custkey
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS → left-anti join (against recent orders: every
    customer in this data has at least one historic order, so the
    unfiltered form is vacuous)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@query(
    "join_theta_range",
    oracle="""
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_late_lines
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-join + range theta predicate (ship > order date + 60 days).

    The range predicate is applied post-join as a filter — Catalyst keeps
    the equi-part as the join key so the plan stays a hash/sort-merge
    join, not a cartesian.
    """
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY"))
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_late_lines"))
        .orderBy("o_orderpriority")
    )


_MERGE_SQL = """
WITH updates AS (
  SELECT CASE WHEN o_custkey % 7 = 0 THEN o_custkey + 200000
              ELSE o_custkey END                         AS c_custkey,
         CAST(max(o_totalprice) AS DOUBLE)               AS new_bal
  FROM orders
  WHERE o_orderdate >= TIMESTAMP '2000-06-01 00:00:00'
  GROUP BY 1),
merged AS (
  SELECT c.c_custkey, c.c_name, c.c_nationkey, c.c_acctbal, c.c_mktsegment,
         'kept' AS merge_action
  FROM customer c
  WHERE NOT EXISTS (SELECT 1 FROM updates u WHERE u.c_custkey = c.c_custkey)
  UNION ALL
  SELECT u.c_custkey,
         coalesce(c.c_name, 'NEW')            AS c_name,
         coalesce(c.c_nationkey, -1)          AS c_nationkey,
         u.new_bal                            AS c_acctbal,
         coalesce(c.c_mktsegment, 'UNKNOWN')  AS c_mktsegment,
         CASE WHEN c.c_custkey IS NULL THEN 'inserted'
              ELSE 'updated' END              AS merge_action
  FROM updates u LEFT JOIN customer c ON u.c_custkey = c.c_custkey)
SELECT * FROM merged
"""


@query("merge_upsert", oracle=_MERGE_SQL)
def merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC apply / MERGE INTO emulation on plain parquet relations
    (Spark's MERGE statement needs a v2 table — Delta/Iceberg): base
    rows not touched by the change set survive via anti-join, matched
    keys take updated values, unknown keys insert with defaults — the
    classic anti-join + outer-join + union rewrite. The change set
    here is derived deterministically from orders (latest 2000H2+
    total per customer; every 7th key shifted to an unseen id to
    exercise the INSERT branch).

    Scale: both branches join on c_custkey only; the anti and outer
    joins share the updates build side (broadcast when small), and no
    branch rescans more than one pass of either input.
    """
    register_tables(spark, sf_dir, ("customer", "orders"))
    return spark.sql(_MERGE_SQL)


@query(
    "join_salted_skew",
    oracle="""
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted fact⋈dim join: events (hot user_ids — the driver's
    events table concentrates all traffic on 150 users) joined to
    customer through ``plans.scale.salted_join``, then aggregated per
    market segment.

    The salt splits each hot key into ``n_salts`` shuffle sub-keys
    derived from a deterministic row attribute (event_id), and
    replicates dim rows to every salt — same result set as the plain
    equi-join (which is exactly what the oracle pins), with the
    largest shuffle partition bounded by |hot key| / n_salts. At
    100 TB this is the manual fallback when AQE's skew handling can't
    see the skew (e.g. a first-stage join straight off the scan).
    """
    from sparksql_server_spark.plans.scale import salted_join

    e = table(spark, sf_dir, "events").withColumnRenamed("user_id", "custkey")
    c = table(spark, sf_dir, "customer").withColumnRenamed("c_custkey", "custkey")
    j = salted_join(e, c, "custkey", n_salts=8, salt_source="event_id")
    return (
        j.groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("total_value"),
        )
        .orderBy("c_mktsegment")
    )


_NULL_SAFE_SQL = """
WITH a AS (
  SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN NULL
              ELSE o_orderstatus END AS k,
         CAST(count(*) AS BIGINT) AS na
  FROM orders
  GROUP BY CASE WHEN o_orderpriority = '1-URGENT' THEN NULL
                ELSE o_orderstatus END),
b AS (
  SELECT CASE WHEN o_totalprice < 50000 THEN NULL
              ELSE o_orderstatus END AS k,
         CAST(count(*) AS BIGINT) AS nb
  FROM orders
  GROUP BY CASE WHEN o_totalprice < 50000 THEN NULL
                ELSE o_orderstatus END)
SELECT a.k AS key, a.na, b.nb
FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
ORDER BY key NULLS FIRST, na
"""


@query("join_null_safe_eq", oracle=_NULL_SAFE_SQL)
def join_null_safe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (``IS NOT DISTINCT FROM`` — ANSI, same
    text both engines): NULL keys MATCH each other, where a plain
    equi-join would silently drop every NULL-keyed row — the classic
    bug when joining on derived keys with gaps.

    Scale: Catalyst plans null-safe equality as a hash join on the
    coalesced key (no fallback to nested-loop), so the cost is the
    ordinary shuffle-or-broadcast of the two aggregated sides; the
    explicit NULLS FIRST pins the presentation order across engines
    (Spark defaults NULLS FIRST ASC, DuckDB NULLS LAST).
    """
    register_tables(spark, sf_dir, ("orders",))
    return spark.sql(_NULL_SAFE_SQL)


_LATERAL_SQL = """
SELECT n.n_name, t.c_name,
       CAST(round(t.c_acctbal, 2) AS DOUBLE) AS c_acctbal
FROM nation n,
LATERAL (
  SELECT c_name, c_acctbal FROM customer c
  WHERE c.c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_name LIMIT 2
) t
ORDER BY n.n_name, c_acctbal DESC, t.c_name
"""


@query("join_lateral_topk", _LATERAL_SQL)
def join_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery join — per outer row, an inner
    query that references it (here: each nation's top-2 customers by
    balance). Dialect-neutral SQL: Spark 4 and DuckDB both plan the
    `FROM outer, LATERAL (...)` form directly. The per-group-top-k-
    via-join surface complements topk_per_group's window form.

    Determinism: ranking keys are (c_acctbal DESC, c_name) — total;
    the rounded output column only normalizes decimal width.

    Scale: Catalyst decorrelates the LATERAL into a ranked window
    join (DecorrelateInnerQuery), so execution is ONE shuffle keyed
    by nationkey with a WindowGroupLimit-pruned sort — identical cost
    to the window formulation, not an N-iterations nested loop; the
    25-row outer side never drives per-row subquery execution.
    """
    register_tables(spark, sf_dir, ("nation", "customer"))
    return spark.sql(_LATERAL_SQL)
