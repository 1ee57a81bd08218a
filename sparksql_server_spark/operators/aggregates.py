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


_HLL_M = 64  # registers
_HLL_ALPHA = 0.709  # bias constant for m=64 (Flajolet et al. 2007)

# Portable HyperLogLog: engine-native sketches (Spark HllSketch vs
# DuckDB approx_count_distinct) can never hash-match, so the sketch is
# built from portable integer arithmetic. The hash is a murmur3-style
# avalanche finalizer truncated to 31 bits (xor-shift + multiply, all
# intermediates < 2^62 so ANSI BIGINT never overflows in either
# engine): HLL's rank statistic needs every OUTPUT bit to depend on
# every input bit — a single multiplicative hash leaves the low bits
# (the bucket) a fixed permutation of the input's low bits and
# collapses the sketch on structured id spaces (stride-64 ids: every
# id landed in one bucket, estimate 1.0 vs true 1000; the finalizer
# estimates 1006). Rank = leading-zero count of the 25-bit rank word
# via length(bin(w)) (INTEGER, no float log); registers = max(rank).
_HLL_MUL1 = 0x85EBCA6B  # murmur3 fmix32 constants
_HLL_MUL2 = 0xC2B2AE35
_HLL_M31 = 1 << 31


def _hll_sql(dialect: str) -> str:
    if dialect == "spark":
        xor = lambda a, b: f"({a} ^ {b})"  # noqa: E731
        shr = lambda a, n: f"shiftright({a}, {n})"  # noqa: E731
    else:
        xor = lambda a, b: f"xor({a}, {b})"  # noqa: E731
        shr = lambda a, n: f"({a} >> {n})"  # noqa: E731
    return f"""
WITH m0 AS (
  SELECT event_type, user_id % {_HLL_M31} AS h FROM events),
m1 AS (SELECT event_type, {xor('h', shr('h', 16))} AS h FROM m0),
m2 AS (SELECT event_type, (h * {_HLL_MUL1}) % {_HLL_M31} AS h FROM m1),
m3 AS (SELECT event_type, {xor('h', shr('h', 13))} AS h FROM m2),
m4 AS (SELECT event_type, (h * {_HLL_MUL2}) % {_HLL_M31} AS h FROM m3),
m5 AS (SELECT event_type, {xor('h', shr('h', 16))} AS h FROM m4),
b AS (
  SELECT event_type,
         h % {_HLL_M} AS bucket,
         {shr('h', 6)} AS w
  FROM m5),
regs AS (
  SELECT event_type, bucket,
         MAX(CASE WHEN w > 0 THEN 26 - length(bin(w)) ELSE 26 END) AS m_j
  FROM b GROUP BY event_type, bucket),
sketch AS (
  SELECT event_type,
         sum(power(2.0, -m_j)) AS sum_pow,
         CAST(count(*) AS BIGINT) AS n_active
  FROM regs GROUP BY event_type),
est AS (
  SELECT event_type,
         {_HLL_M} - n_active AS n_zero,
         {_HLL_ALPHA} * {_HLL_M} * {_HLL_M}
           / (sum_pow + ({_HLL_M} - n_active)) AS raw
  FROM sketch),
fin AS (
  SELECT event_type,
         CASE WHEN raw <= 2.5 * {_HLL_M} AND n_zero > 0
              THEN {_HLL_M} * ln(CAST({_HLL_M} AS DOUBLE) / n_zero)
              ELSE raw END AS hll
  FROM est),
exact AS (
  SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users
  FROM events GROUP BY event_type)
SELECT e.event_type, e.exact_users,
       CAST(round(f.hll, 6) AS DOUBLE) AS hll_estimate,
       CAST(round(f.hll / e.exact_users - 1, 6) AS DOUBLE) AS rel_error
FROM exact e JOIN fin f ON e.event_type = f.event_type
ORDER BY e.event_type
"""


@query("agg_hll_mergeable", _hll_sql("duck"))
def agg_hll_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-user estimate per event type, built from
    first principles in portable SQL, audited against the exact count.
    Complements agg_approx_vs_exact (which oracle-checks only the
    exact half because engine-native sketches differ): here the WHOLE
    sketch is cross-engine deterministic, so the estimate itself is
    oracle-verified — the murmur-style finalizer hash and register
    ranks are integer arithmetic, the harmonic sum adds 64 exact
    dyadic rationals (2^-m_j, lsb 2^-26, sum < 2^7 — exact in a
    double in ANY order), and the
    linear-counting fallback is one ln() of an exact ratio rounded to
    6 dp.

    The point at 100 TB is MERGEABILITY: the register table is the
    sketch state, and max(m_j) is both the in-partition combine and
    the cross-partition/cross-day merge — a year of daily register
    tables folds with one 64-row-per-group max, no raw re-scan;
    that is how distinct-users-per-anything survives at petabyte
    scale. CAPACITY: ids fold through user_id % 2^31 before the
    finalizer, so the distinguishable universe is ~2.1e9 — above
    that (snowflake-style 64-bit ids) the estimate saturates; widen
    by avalanching in a 61-bit mod-prime domain with sub-2^31
    multipliers (products stay < 2^63), same plan shape. Plan: two
    combinable aggregations ((type, bucket) ->
    max, type -> sum) plus the exact branch's distinct for the audit
    column — the exact branch is the one you DROP in production,
    leaving no distinct shuffle at all.
    """
    register_tables(spark, sf_dir, ("events",))
    return spark.sql(_hll_sql("spark"))
