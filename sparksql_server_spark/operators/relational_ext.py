"""Extended relational coverage — pivot/unpivot, percentiles,
subqueries, conditional logic, extra string/date families, union-by-
name, and the point-in-time (as-of) window pattern.

These widen the FIXTURES.md §2 "standard categories" beyond the
first pass; everything stays JVM-side and oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparksql_server_spark.catalog import register_tables, table
from sparksql_server_spark.functions.portable import dsum
from sparksql_server_spark.operators.registry import query


@query(
    "pivot_status_by_flag",
    oracle=f"""
    SELECT l_returnflag,
           {dsum("CASE WHEN l_linestatus = 'O' THEN l_quantity END")} AS qty_O,
           {dsum("CASE WHEN l_linestatus = 'F' THEN l_quantity END")} AS qty_F
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def pivot_status_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native pivot operator; the oracle is the equivalent conditional
    aggregation (pivot compiles to exactly that)."""
    li = table(spark, sf_dir, "lineitem")
    qty = F.sum(F.col("l_quantity").cast("decimal(18,6)")).cast("double")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(qty)
        .select(
            "l_returnflag",
            F.col("O").alias("qty_O"),
            F.col("F").alias("qty_F"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "unpivot_acctbal",
    oracle="""
    SELECT nationkey, kind, n FROM (
      SELECT c_nationkey AS nationkey, 'customers' AS kind,
             CAST(count(*) AS BIGINT) AS n
      FROM customer GROUP BY c_nationkey
      UNION ALL
      SELECT s_nationkey, 'suppliers', CAST(count(*) AS BIGINT)
      FROM supplier GROUP BY s_nationkey)
    ORDER BY nationkey, kind
    """,
)
def unpivot_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long unpivot of a two-metric table (Spark's unpivot/melt);
    oracle is the UNION ALL form it desugars to."""
    c = (
        table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("customers"))
    )
    s = (
        table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("suppliers"))
    )
    wide = c.join(s, "nationkey", "full").select(
        "nationkey",
        F.coalesce("customers", F.lit(0)).alias("customers"),
        F.coalesce("suppliers", F.lit(0)).alias("suppliers"),
    )
    long = wide.unpivot("nationkey", ["customers", "suppliers"], "kind", "n")
    # UNION-ALL oracle has no zero rows for absent sides; drop them here too
    return long.filter(F.col("n") > 0).orderBy("nationkey", "kind")


@query(
    "percentiles_exact",
    oracle="""
    SELECT o_orderpriority,
           quantile_cont(o_custkey, 0.25) AS p25,
           quantile_cont(o_custkey, 0.50) AS p50,
           quantile_cont(o_custkey, 0.75) AS p75
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def percentiles_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles. Quartiles over integer keys keep
    the interpolation arithmetic exact in binary (a + f·(b−a), f ∈
    {.25,.5,.75}), so both engines produce identical doubles.
    (approx_percentile / engine sketches can't cross-check; they're
    exercised in tests instead.)

    Round 11 Spark plan: ``percentile()`` is a typed-imperative
    aggregate that COLLECTS each group's values into memory — at the
    ×100 sweep it measured exponent 0.783 (26 s; 12M buffered values
    per group) and at 100 TB it simply OOMs. The plan is now the
    distribution form: a combinable count per (group, value) — 10×
    smaller than the input here, bounded by the value domain — a
    cumulative window over the compact distribution, and an order-stat
    join picking the two straddling values for each target rank with
    the interpolation computed inline. Integer values make
    ``v1 + frac·(v2−v1)`` exact in doubles for EVERY evaluation order,
    so the result is bit-equal to ``percentile()`` and the oracle's
    ``quantile_cont`` (the property the docstring always relied on).
    NULL values are excluded exactly as the aggregate does — but the
    GROUP SET comes from ALL rows (round 12, ADVICE r11 low): a group
    whose every value is NULL still surfaces, with NULL quartiles,
    exactly as ``percentile()``/``quantile_cont`` emit it (the
    distribution CTE's NOT NULL filter alone would drop the group —
    latent only, since TPC-H o_custkey is never NULL). The two group
    joins use ``<=>`` (round-12 review wave): GROUP BY treats NULL as
    one ordinary group, so a NULL group KEY with non-NULL values must
    still find its distribution rows — a null-blind ``=`` would emit
    NULL quartiles for it.

    Round 12 (guide §2.4/§5): the cumulative distribution ``cum`` has
    two consumers (the target-rank table and the order-stat join), so
    the inline form ran the distribution aggregation + windows twice;
    it is pinned once (compact: bounded by the value domain, 10×
    smaller than the input here). Values bit-identical — the pin is a
    barrier only, and the interpolation was already evaluation-order-
    exact on integer values."""
    from sparksql_server_spark.operators.scratch import pin_view

    register_tables(spark, sf_dir, ("orders",))
    pin_view(
        spark,
        spark.sql(
            """
        WITH d AS (
          SELECT o_orderpriority AS g, o_custkey AS v,
                 CAST(count(*) AS BIGINT) AS c
          FROM orders WHERE o_custkey IS NOT NULL
          GROUP BY o_orderpriority, o_custkey)
        SELECT g, v,
               sum(c) OVER (PARTITION BY g ORDER BY v) AS hi,
               sum(c) OVER (PARTITION BY g) AS n
        FROM d"""
        ),
        "pct_cum",
    )
    return spark.sql(
        """
        WITH grp AS (
          SELECT DISTINCT o_orderpriority AS g FROM orders),
        cum AS (SELECT g, v, hi, n FROM pct_cum),
        t AS (
          SELECT g, p,
                 CAST(floor(p * (n - 1)) AS BIGINT) AS k1,
                 p * (n - 1) - floor(p * (n - 1)) AS frac,
                 CAST(floor(p * (n - 1)) AS BIGINT)
                   + CASE WHEN p * (n - 1) > floor(p * (n - 1))
                          THEN 1 ELSE 0 END AS k2
          FROM (SELECT DISTINCT g, n FROM cum)
          LATERAL VIEW explode(array(0.25D, 0.50D, 0.75D)) pv AS p),
        stat AS (
          SELECT t.g, t.p, t.frac,
                 CAST(min(c.v) AS DOUBLE) AS v1,
                 CAST(min(CASE WHEN c.hi > t.k2 THEN c.v END) AS DOUBLE)
                   AS v2
          FROM t JOIN cum c ON c.g <=> t.g AND c.hi > t.k1
          GROUP BY t.g, t.p, t.frac),
        q AS (
          SELECT g,
                 max(CASE WHEN p = 0.25D THEN v1 + frac * (v2 - v1) END) AS p25,
                 max(CASE WHEN p = 0.50D THEN v1 + frac * (v2 - v1) END) AS p50,
                 max(CASE WHEN p = 0.75D THEN v1 + frac * (v2 - v1) END) AS p75
          FROM stat
          GROUP BY g)
        SELECT grp.g AS o_orderpriority, q.p25, q.p50, q.p75
        FROM grp LEFT JOIN q ON q.g <=> grp.g
        ORDER BY o_orderpriority
        """
    )


@query(
    "subquery_in",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
""",
)
def subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir, ("orders", "customer"))
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
"""
    )


@query(
    "subquery_scalar_correlated",
    oracle="""
    SELECT c_custkey,
           (SELECT CAST(count(*) AS BIGINT) FROM orders WHERE o_custkey = c_custkey)
             AS n_orders
    FROM customer
""",
)
def subquery_scalar_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery — Catalyst decorrelates it into a
    left outer aggregate join (no per-row re-execution)."""
    register_tables(spark, sf_dir, ("orders", "customer"))
    return spark.sql(
        """
        SELECT c_custkey,
               (SELECT CAST(count(*) AS BIGINT) FROM orders WHERE o_custkey = c_custkey)
                 AS n_orders
        FROM customer
"""
    )


_CASE_SQL = """
SELECT o_orderkey,
       CASE WHEN o_totalprice >= 200000 THEN 'large'
            WHEN o_totalprice >= 50000  THEN 'medium'
            ELSE 'small' END                          AS size_bucket,
       COALESCE(NULLIF(o_orderstatus, 'O'), 'open')   AS status_label,
       (o_orderstatus = 'F') AND (o_totalprice > 100000) AS big_finished
FROM orders
"""


@query("case_null_logic", oracle=_CASE_SQL)
def case_null_logic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE / NULLIF / COALESCE / boolean algebra (dialect-portable SQL)."""
    register_tables(spark, sf_dir, ("orders",))
    return spark.sql(_CASE_SQL)


@query(
    "string_funcs_ext",
    oracle="""
    SELECT p_partkey,
           regexp_extract(p_name, '([a-z]+)', 1)        AS first_word,
           regexp_replace(p_name, '[aeiou]', '_', 'g')  AS devoweled,
           split_part(p_type, ' ', 1)                   AS type_head,
           lpad(CAST(p_size AS VARCHAR), 4, '0')        AS size_padded,
           levenshtein(p_brand, 'Brand#00')             AS brand_dist
    FROM part
""",
)
def string_funcs_ext(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp extract/replace, split_part, lpad, levenshtein — all
    JVM built-ins (Spark's regexp_replace is global by default; DuckDB
    needs the 'g' flag)."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_name", "([a-z]+)", 1).alias("first_word"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"),
        F.split_part("p_type", F.lit(" "), F.lit(1)).alias("type_head"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.levenshtein("p_brand", F.lit("Brand#00")).alias("brand_dist"),
    )


@query(
    "date_funcs_ext",
    oracle="""
    SELECT o_orderkey,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus3m,
           last_day(CAST(o_orderdate AS DATE))                        AS month_end,
           CAST(quarter(o_orderdate) AS INT)                          AS qtr,
           CAST(dayofmonth(o_orderdate) AS INT)                       AS dom
    FROM orders
""",
)
def date_funcs_ext(spark: SparkSession, sf_dir: str) -> DataFrame:
    """add_months/last_day/quarter/day (both engines clamp month-end
    identically: Jan 31 + 1 month = Feb 29)."""
    o = table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.add_months(d, 3).alias("plus3m"),
        F.last_day(d).alias("month_end"),
        F.quarter("o_orderdate").cast("int").alias("qtr"),
        F.dayofmonth("o_orderdate").cast("int").alias("dom"),
    )


@query(
    "conditional_agg",
    oracle=f"""
    SELECT l_returnflag,
           CAST(count_if(l_discount > 0.05) AS BIGINT)       AS n_discounted,
           CAST(count_if(l_quantity >= 25) AS BIGINT)        AS n_bulk,
           {dsum("CASE WHEN l_tax > 0.04 THEN l_extendedprice END")} AS taxed_revenue
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count_if + filtered sums (one scan, one aggregation)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count_if(F.col("l_discount") > 0.05).alias("n_discounted"),
            F.count_if(F.col("l_quantity") >= 25).alias("n_bulk"),
            F.sum(
                F.when(F.col("l_tax") > 0.04, F.col("l_extendedprice")).cast(
                    "decimal(18,6)"
                )
            )
            .cast("double")
            .alias("taxed_revenue"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "union_by_name",
    oracle="""
    SELECT party, nationkey, acctbal FROM (
      SELECT 'customer' AS party, c_nationkey AS nationkey, c_acctbal AS acctbal
      FROM customer
      UNION ALL BY NAME
      SELECT s_acctbal AS acctbal, s_nationkey AS nationkey, 'supplier' AS party
      FROM supplier)
""",
)
def union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName: positional-order-independent union."""
    c = table(spark, sf_dir, "customer").select(
        F.lit("customer").alias("party"),
        F.col("c_nationkey").alias("nationkey"),
        F.col("c_acctbal").alias("acctbal"),
    )
    s = table(spark, sf_dir, "supplier").select(
        F.col("s_acctbal").alias("acctbal"),
        F.col("s_nationkey").alias("nationkey"),
        F.lit("supplier").alias("party"),
    )
    return c.unionByName(s)


_ASOF_SQL = """
SELECT event_id, user_id,
       CAST(date_trunc('second', last_err_ts) AS TIMESTAMP) AS last_error_at
FROM (
  SELECT event_id, user_id,
         max(CASE WHEN event_type = 'error' THEN ts END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_err_ts
  FROM events)
"""


@query("asof_last_error", oracle=_ASOF_SQL)
def asof_last_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (as-of) association: for every event, the most
    recent STRICTLY PRIOR error of the same user — the window form of
    an as-of join (one shuffle on the key, no range join needed when
    both sides share a table; for two-table as-of, union the sides
    then apply this same window). Output second-truncated: the raw
    column is nanosecond-precision parquet which engines surface at
    different precisions."""
    register_tables(spark, sf_dir, ("events",))
    return spark.sql(_ASOF_SQL)


_RECURSIVE_SPINE_SQL = """
WITH RECURSIVE months(m) AS (
  SELECT TIMESTAMP '1995-01-01 00:00:00'
  UNION ALL
  SELECT m + INTERVAL 1 MONTH FROM months
  WHERE m < TIMESTAMP '2001-07-01 00:00:00')
SELECT m AS month_start,
       CAST(count(o_orderkey) AS BIGINT) AS n_orders
FROM months
LEFT JOIN orders ON date_trunc('month', o_orderdate) = m
GROUP BY m
ORDER BY m
"""


@query("recursive_month_spine", oracle=_RECURSIVE_SPINE_SQL)
def recursive_month_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (WITH RECURSIVE, native since Spark 4.0): generate
    a monthly calendar spine and left-join per-month order counts —
    the iterative-series SQL shape the reference's Spark 1.3.1 surface
    could never express, gap-filling months with zero orders.

    Scale: the recursion is driver-tiny (80 rows); the spine broadcasts
    into one pass over orders."""
    register_tables(spark, sf_dir, ("orders",))
    return spark.sql(_RECURSIVE_SPINE_SQL)


_SUGAR_SQL = """
SELECT o_orderstatus, o_orderpriority, n,
       CAST(n AS DOUBLE) / 1000 AS n_k,
       n_k * 100                AS n_pct
FROM (SELECT o_orderstatus, o_orderpriority, CAST(count(*) AS BIGINT) AS n
      FROM orders GROUP BY ALL)
ORDER BY ALL
"""


@query("sql_modern_sugar", oracle=_SUGAR_SQL)
def sql_modern_sugar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modern SQL sugar a migrating analytics user expects, identical
    text in both dialects: GROUP BY ALL (group on every non-aggregate
    select item), ORDER BY ALL, and lateral column aliases (``n_k``
    referenced by ``n_pct`` in the same select list — kept in a
    projection because Spark does not yet resolve lateral aliases
    THROUGH a GROUP BY ALL). Sugar only: Catalyst resolves it to the
    same aggregate plan as the explicit form.
    """
    register_tables(spark, sf_dir, ("orders",))
    return spark.sql(_SUGAR_SQL)
