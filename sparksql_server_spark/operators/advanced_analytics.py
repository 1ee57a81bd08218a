"""Sequence, affinity, and concentration analytics — the classic
OLAP-adjacent reports a warehouse serves next to the TPC-H suite:
top event paths (clickstream n-grams), market-basket pair affinity,
autocorrelation of activity, and ABC/Pareto revenue classification.

Every query is identical SQL text on Spark and DuckDB (no dialect
split needed — all constructs are common), with exact-integer or
exact-DECIMAL arithmetic everywhere a float boundary could diverge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from sparksql_server_spark.catalog import register_tables, table
from sparksql_server_spark.operators.registry import query

_PATHS_SQL = """
WITH seq AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e2,
         lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e3
  FROM events),
paths AS (
  SELECT event_type || '>' || e2 || '>' || e3 AS path
  FROM seq WHERE e2 IS NOT NULL AND e3 IS NOT NULL)
SELECT path, CAST(count(*) AS BIGINT) AS n
FROM paths GROUP BY path
ORDER BY n DESC, path
LIMIT 10
"""


@query("events_user_paths_topk", oracle=_PATHS_SQL)
def events_user_paths_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 three-step event-type paths across all user sessions —
    the clickstream n-gram report behind funnel discovery (which
    sequences actually happen, before you pin a funnel to check).

    Scale: ONE user_id-keyed shuffle for the sequence windows (the
    shared behavioral-partitioning key), then a combinable path count
    and a TakeOrdered top-10 — the path table never globally sorts.
    Ties at the LIMIT boundary break on (n, path), so the cut is
    engine-identical. Window ordering ties on ts break by event_id —
    fully deterministic sequences.
    """
    register_tables(spark, sf_dir, ("events",))
    return spark.sql(_PATHS_SQL)


_BASKET_SQL = """
WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey)
SELECT part_a, part_b, CAST(count(*) AS BIGINT) AS n_orders
FROM pairs GROUP BY part_a, part_b
ORDER BY n_orders DESC, part_a, part_b
LIMIT 20
"""


@query("basket_part_pairs", oracle=_BASKET_SQL)
def basket_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket affinity: the 20 part pairs most often bought in
    the same order (the co-occurrence table association-rule mining
    starts from).

    Spark side runs the basket form (the graph_triangle_count edge
    build): ONE groupBy(order) + map-side combination explode replaces
    the items-distinct self-join — lineitem scans once instead of
    twice and the plan drops from 3 shuffles (distinct, self-join,
    pair count) to 2 (basket rollup, pair count). r12 interleaved A/B
    at sf0.1: first-exec 2.29 vs 3.06 s, steady a wash (1.14/1.11 s —
    AQE stage reuse already deduped the old form's distinct at
    runtime); rows identical. Pair fan-out per order is C(lines, 2)
    with lines ≤ 7 in TPC-H — bounded by the SCHEMA, not the data
    volume; sort_array(collect_set(...)) gives part_a < part_b for
    free. A retail-scale variant with huge baskets would cap
    per-basket items first (the standard frequency-prune) — same plan
    shape. Oracle keeps the self-join spelling (DuckDB has no
    ordered-combination HOF); both produce the identical pair set.
    """
    from pyspark.sql import functions as F

    register_tables(spark, sf_dir, ("lineitem",))
    baskets = (
        spark.table("lineitem")
        .groupBy(F.col("l_orderkey"))
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("ps"))
    )
    return (
        baskets.select(
            F.explode(
                F.expr(
                    "flatten(transform(ps, (x, i) -> "
                    "transform(slice(ps, i + 2, size(ps)), "
                    "y -> struct(x AS part_a, y AS part_b))))"
                )
            ).alias("e")
        )
        .select("e.part_a", "e.part_b")
        .groupBy("part_a", "part_b")
        .agg(F.count("*").alias("n_orders"))
        .orderBy(F.desc("n_orders"), "part_a", "part_b")
        .limit(20)
    )


_AUTOCORR_SQL = """
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS h, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY date_trunc('hour', ts)),
lagd AS (SELECT n, lag(n) OVER (ORDER BY h) AS pn FROM hourly),
pairs AS (SELECT n, pn FROM lagd WHERE pn IS NOT NULL),
s AS (SELECT CAST(count(*) AS DOUBLE)   AS m,
             CAST(sum(n) AS DOUBLE)     AS sx,
             CAST(sum(pn) AS DOUBLE)    AS sy,
             CAST(sum(n * pn) AS DOUBLE)  AS sxy,
             CAST(sum(n * n) AS DOUBLE)   AS sxx,
             CAST(sum(pn * pn) AS DOUBLE) AS syy
      FROM pairs)
SELECT CAST(m AS BIGINT) AS n_pairs,
       round((m * sxy - sx * sy)
             / (sqrt(m * sxx - sx * sx) * sqrt(m * syy - sy * sy)), 6)
         AS autocorr_lag1
FROM s
"""


@query("events_autocorr_lag1", oracle=_AUTOCORR_SQL)
def events_autocorr_lag1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of the hourly event-count series — the
    seasonality/burstiness scalar a capacity or anomaly model checks
    first (≈0 Poisson-like arrivals, →1 strong hour-to-hour trend).

    Scale: the hourly rollup is one combinable aggregation over raw
    events; everything after runs on the |hours| rollup (720 rows per
    month — the global-ordered lag window costs nothing there, and at
    years-of-data scale it keys by day first). All moment sums are
    INTEGER products of counts — bit-exact in both engines; floats
    appear only in the final Pearson division.
    """
    register_tables(spark, sf_dir, ("events",))
    return spark.sql(_AUTOCORR_SQL)


_ABC_SQL = """
WITH rev AS (
  SELECT l_partkey,
         sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS r
  FROM lineitem GROUP BY l_partkey),
ranked AS (
  SELECT l_partkey, r,
         sum(r) OVER (ORDER BY r DESC, l_partkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         sum(r) OVER () AS tot
  FROM rev),
classed AS (
  SELECT l_partkey, r,
         CASE WHEN 100 * cum <= 80 * tot THEN 'A'
              WHEN 100 * cum <= 95 * tot THEN 'B'
              ELSE 'C' END AS cls
  FROM ranked)
SELECT cls,
       CAST(count(*) AS BIGINT) AS n_parts,
       CAST(sum(r) AS DOUBLE)   AS revenue
FROM classed GROUP BY cls
ORDER BY cls
"""


@query("abc_pareto_parts", oracle=_ABC_SQL)
def abc_pareto_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto classification of parts by discounted revenue:
    class A = parts covering the first 80% of cumulative revenue,
    B to 95%, C the tail — the inventory-concentration report.

    Determinism: the cumulative sum runs over exact DECIMALs with a
    ROWS frame and a total (r DESC, l_partkey) ordering, and the
    80/95 boundaries compare as 100*cum <= 80*tot — pure decimal
    integer-scaled arithmetic, no float threshold anywhere; doubles
    appear only in the final per-class revenue presentation.

    Scale: the per-part rollup is one combinable shuffle. The global
    cumulative window is the one genuinely serial construct — fine at
    |parts| rows (200k at SF100); at billions the standard rewrite is
    range-partition by r DESC, per-partition partial sums, broadcast
    the partition offsets, add — two passes, same answer.
    """
    register_tables(spark, sf_dir, ("lineitem",))
    return spark.sql(_ABC_SQL)


_GINI_SQL = """
WITH spend AS (
  SELECT o_custkey,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS x
  FROM orders GROUP BY o_custkey),
ranked AS (
  SELECT x, CAST(row_number() OVER (ORDER BY x, o_custkey) AS BIGINT) AS i
  FROM spend),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(i * x) AS DECIMAL(38,6)) AS ixsum,
         CAST(sum(x) AS DECIMAL(38,6)) AS xsum
  FROM ranked)
SELECT CAST(2.0 * CAST(ixsum AS DOUBLE) / (n * CAST(xsum AS DOUBLE))
            - (n + 1.0) / n AS DOUBLE) AS gini,
       n AS n_customers
FROM agg
"""


@query("stats_gini_concentration", oracle=_GINI_SQL)
def stats_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer revenue concentration — the
    inequality number behind "top-x% of customers drive y% of
    revenue", complementing the ABC/Pareto class table with a single
    comparable scalar.

    Exactness: the rank-weighted identity 2*sum(i*x)/(n*sum(x)) -
    (n+1)/n runs on DECIMAL sums (i*x is BIGINT x DECIMAL — exact in
    both engines); ties in x contribute a fixed rank-sum regardless of
    their internal order, so the row_number tiebreak cannot change the
    statistic. Scale: one o_custkey shuffle + one global rank window
    over the per-customer rollup (rows = customers, not orders). At
    billions of customers the rank window takes the same two-pass
    rewrite as abc_pareto_parts (range-partition by x, per-partition
    partial ranks/sums, broadcast partition offsets) — or the binned
    Lorenz-curve form when an approximate Gini suffices.
    """
    register_tables(spark, sf_dir, ("orders",))
    return spark.sql(_GINI_SQL)


_USER_ENTROPY_SQL = """
WITH c AS (
  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY user_id, event_type),
t AS (SELECT user_id, CAST(sum(n) AS BIGINT) AS tot FROM c GROUP BY user_id),
e AS (
  SELECT c.user_id,
         max(t.tot) AS n_events,
         CAST(round(-sum((CAST(n AS DOUBLE) / t.tot)
                         * ln(CAST(n AS DOUBLE) / t.tot)), 6) AS DOUBLE) AS entropy
  FROM c JOIN t ON t.user_id = c.user_id
  GROUP BY c.user_id)
SELECT user_id, CAST(n_events AS BIGINT) AS n_events, entropy
FROM e
ORDER BY entropy DESC, user_id
LIMIT 20
"""


@query("events_user_entropy_topk", oracle=_USER_ENTROPY_SQL)
def events_user_entropy_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral diversity: Shannon entropy of each user's event-type
    mix, top-20 most diverse — the explorer-vs-specialist segmentation
    feature (bots and single-purpose accounts sit near zero).

    Scale: two combinable aggregations sharing the user_id key, then a
    TakeOrdered top-20. Determinism at the LIMIT boundary: entropy is
    rounded to 6 dp BEFORE ordering (per-user sums of <=5 double terms
    can differ in final ulps between engines), with user_id breaking
    rounded ties.
    """
    table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_USER_ENTROPY_SQL)
