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
    # r12: small-input spread (guide §2.5) — interleaved steady A/B -0.40/-0.55 s
    register_tables(spark, sf_dir, ("lineitem",), spread=("lineitem",))
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
    # r12: small-input spread (guide §2.5) — interleaved steady A/B -0.21/-0.22 s
    register_tables(spark, sf_dir, ("lineitem",), spread=("lineitem",))
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
_HLL_M62 = 1 << 62  # hash domain: 62 bits (two mixed 31-bit lanes)

# REGISTER FORMAT VERSION. The r6 62-bit widening changed the register
# format incompatibly (rank base 26 -> 57 and different bucket
# assignment): merging a persisted register table built under the old
# 31-bit hash with a new one would produce silently-wrong estimates,
# not an error. Any pipeline that PERSISTS register tables (the 100 TB
# deployment shape this module's queries model) must stamp this tag
# into the table path / a format column, refuse cross-version max()
# merges, and rebuild pre-widening tables from raw events. The repo's
# own queries materialize registers per run, so no migration applies
# here — the tag exists so persisted-state deployments inherit the
# gate, the standard discipline of mergeable-sketch systems.
HLL_REGISTER_FORMAT = "hll-m64-h62-v2"


def _hll_bitops(dialect: str):
    """(xor, shift-right) expression builders per dialect."""
    if dialect == "spark":
        return (
            lambda a, b: f"({a} ^ {b})",
            lambda a, n: f"shiftright({a}, {n})",
        )
    return (
        lambda a, b: f"xor({a}, {b})",
        lambda a, n: f"({a} >> {n})",
    )


def _hll_regs_ctes(dialect: str, src: str) -> str:
    """The finalizer chain + register build as CTE text, over ``src``
    (a relation exposing columns (g, user_id)); ends with ``regs`` =
    (g, bucket, m_j). Shared by the audit query and the set-operations
    query so both hash identically — the merge property depends on it.

    Round-6 widening (VERDICT r5 ask #6): the hash domain is 62 bits,
    so snowflake-style 64-bit ids no longer saturate at the old
    ``user_id % 2^31`` fold. The id splits into two 31-bit halves,
    each runs the murmur3-fmix32-style finalizer (every product
    (2^31-1)·MUL < 2^63, ANSI BIGINT safe), the lanes cross-couple
    (xor / linear combination) so BOTH absorb BOTH halves — a
    small-id corpus (hi ≡ 0) still feeds every lane entropy — and a
    second finalizer pass avalanches the coupled lanes. h62 = A·2^31
    + B puts fully-mixed bits in both the bucket (h62 % 64 = B % 64)
    and the rank window (h62 >> 6, leading bits from A). Rank ≤ 57,
    so the estimator tracks cardinalities far past 2^31 (property-
    pinned in tests/test_portable_props.py with ids beyond 2^31)."""
    xor, shr = _hll_bitops(dialect)
    return f"""m0 AS (
  SELECT g, ((user_id % {_HLL_M62}) + {_HLL_M62}) % {_HLL_M62} AS h FROM {src}),
p0 AS (SELECT g, h % {_HLL_M31} AS a, {shr('h', 31)} AS b FROM m0),
p1 AS (SELECT g, {xor('a', shr('a', 16))} AS a, {xor('b', shr('b', 16))} AS b FROM p0),
p2 AS (SELECT g, (a * {_HLL_MUL1}) % {_HLL_M31} AS a, (b * {_HLL_MUL1}) % {_HLL_M31} AS b FROM p1),
p3 AS (SELECT g, {xor('a', shr('a', 13))} AS a, {xor('b', shr('b', 13))} AS b FROM p2),
p4 AS (SELECT g, (a * {_HLL_MUL2}) % {_HLL_M31} AS a, (b * {_HLL_MUL2}) % {_HLL_M31} AS b FROM p3),
p5 AS (SELECT g, {xor('a', shr('a', 16))} AS a, {xor('b', shr('b', 16))} AS b FROM p4),
c0 AS (SELECT g, {xor('a', 'b')} AS a, (a + 2 * b) % {_HLL_M31} AS b FROM p5),
q1 AS (SELECT g, {xor('a', shr('a', 16))} AS a, {xor('b', shr('b', 16))} AS b FROM c0),
q2 AS (SELECT g, (a * {_HLL_MUL1}) % {_HLL_M31} AS a, (b * {_HLL_MUL1}) % {_HLL_M31} AS b FROM q1),
q3 AS (SELECT g, {xor('a', shr('a', 13))} AS a, {xor('b', shr('b', 13))} AS b FROM q2),
q4 AS (SELECT g, (a * {_HLL_MUL2}) % {_HLL_M31} AS a, (b * {_HLL_MUL2}) % {_HLL_M31} AS b FROM q3),
q5 AS (SELECT g, {xor('a', shr('a', 16))} AS a, {xor('b', shr('b', 16))} AS b FROM q4),
hv AS (SELECT g, a * {_HLL_M31} + b AS h FROM q5),
b AS (
  SELECT g,
         h % {_HLL_M} AS bucket,
         {shr('h', 6)} AS w
  FROM hv),
regs AS (
  SELECT g, bucket,
         MAX(CASE WHEN w > 0 THEN 57 - length(bin(w)) ELSE 57 END) AS m_j
  FROM b GROUP BY g, bucket)"""


# estimation over a (g, bucket, m_j) register relation named ``{regs}``:
# harmonic mean + linear-counting fallback, ending with fin = (g, hll)
def _hll_finalizer_sql(src: str) -> str:
    """The (g, hll) estimate over a (g, bucket, m_j) register relation
    as ONE nested-subquery text — harmonic mean, bias constant, and
    the linear-counting fallback live here and nowhere else (review
    r7: the running-distinct query had grown its own copy, so a
    recalibration would have silently diverged the queries). The CTE
    form below wraps it; the running-distinct query embeds it
    directly (its outer statement must stay WITH-free so the
    CacheManager substitutes the persisted register table)."""
    return f"""
  SELECT g,
         CASE WHEN raw <= 2.5 * {_HLL_M} AND n_zero > 0
              THEN {_HLL_M} * ln(CAST({_HLL_M} AS DOUBLE) / n_zero)
              ELSE raw END AS hll
  FROM (
    SELECT g,
           {_HLL_M} - n_active AS n_zero,
           {_HLL_ALPHA} * {_HLL_M} * {_HLL_M}
             / (sum_pow + ({_HLL_M} - n_active)) AS raw
    FROM (
      SELECT g,
             sum(power(2.0, -m_j)) AS sum_pow,
             CAST(count(*) AS BIGINT) AS n_active
      FROM {src} GROUP BY g
    ) sketch
  ) est"""


def _hll_est_ctes(regs: str) -> str:
    return f"fin AS ({_hll_finalizer_sql(regs)})"


def _hll_sql(dialect: str) -> str:
    src = "(SELECT event_type AS g, user_id FROM events)"
    return f"""
WITH {_hll_regs_ctes(dialect, src)},
{_hll_est_ctes('regs')},
exact AS (
  SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users
  FROM events GROUP BY event_type)
SELECT e.event_type, e.exact_users,
       CAST(round(f.hll, 6) AS DOUBLE) AS hll_estimate,
       CAST(round(f.hll / e.exact_users - 1, 6) AS DOUBLE) AS rel_error
FROM exact e JOIN fin f ON e.event_type = f.g
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
    dyadic rationals 2^-m_j (each exactly representable; the 64-term
    sum's order-dependence is bounded by ~2^-52 relative — far below
    the 6-dp round, the same argument stats_jackknife_ci makes), and
    the linear-counting fallback is one ln() of an exact ratio
    rounded to 6 dp.

    The point at 100 TB is MERGEABILITY: the register table is the
    sketch state, and max(m_j) is both the in-partition combine and
    the cross-partition/cross-day merge — a year of daily register
    tables folds with one 64-row-per-group max, no raw re-scan;
    that is how distinct-users-per-anything survives at petabyte
    scale. CAPACITY (round-6 widening): the hash runs in a 62-bit
    domain built from two cross-coupled 31-bit fmix lanes (every
    product < 2^63 — ANSI BIGINT safe), so snowflake-style 64-bit
    ids fold through id % 2^62 with a ~4.6e18 distinguishable
    universe and rank ≤ 57; the old % 2^31 fold saturated at ~2.1e9.
    Property-pinned with ids beyond 2^31 in
    tests/test_portable_props.py. Plan: two
    combinable aggregations ((type, bucket) ->
    max, type -> sum) plus the exact branch's distinct for the audit
    column — the exact branch is the one you DROP in production,
    leaving no distinct shuffle at all.
    """
    register_tables(spark, sf_dir, ("events",))
    return spark.sql(_hll_sql("spark"))


_SETOP_VAL = 100.0  # membership filter (calibrated: at every test SF the two
# sets differ and the true intersection is strictly smaller than either side,
# so the algebra is exercised on genuinely distinct sets)


def _hll_setops_sql(dialect: str) -> str:
    """Shared shape: registers for set A (high-value click users) and
    set B (high-value purchase users); the UNION sketch is the
    per-bucket MAX of the two register tables — the merge itself,
    exercised inside the query — and the intersection estimate is
    inclusion-exclusion over the three estimates."""
    src = f"""(SELECT CASE WHEN event_type = 'click' THEN 'a' ELSE 'b' END AS g,
         user_id
  FROM events
  WHERE event_type IN ('click', 'purchase') AND value >= {_SETOP_VAL})"""
    return f"""
WITH {_hll_regs_ctes(dialect, src)},
merged AS (
  SELECT * FROM regs
  UNION ALL
  SELECT 'u' AS g, bucket, max(m_j) AS m_j FROM regs GROUP BY bucket),
{_hll_est_ctes('merged')},
wide AS (
  SELECT max(CASE WHEN g = 'a' THEN hll END) AS est_a,
         max(CASE WHEN g = 'b' THEN hll END) AS est_b,
         max(CASE WHEN g = 'u' THEN hll END) AS est_union
  FROM fin),
exact AS (
  SELECT CAST(count(DISTINCT CASE WHEN g = 'a' THEN user_id END) AS BIGINT)
           AS exact_a,
         CAST(count(DISTINCT CASE WHEN g = 'b' THEN user_id END) AS BIGINT)
           AS exact_b,
         CAST(count(DISTINCT user_id) AS BIGINT) AS exact_union
  FROM {src} x)
SELECT CAST(round(w.est_a, 6) AS DOUBLE) AS est_a,
       CAST(round(w.est_b, 6) AS DOUBLE) AS est_b,
       CAST(round(w.est_union, 6) AS DOUBLE) AS est_union,
       CAST(round(w.est_a + w.est_b - w.est_union, 6) AS DOUBLE)
         AS est_intersection,
       e.exact_a, e.exact_b, e.exact_union,
       CAST(e.exact_a + e.exact_b - e.exact_union AS BIGINT)
         AS exact_intersection
FROM wide w CROSS JOIN exact e
"""


@query("agg_hll_set_ops", _hll_setops_sql("duck"))
def agg_hll_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-set algebra on HyperLogLog sketches, with the merge
    EXERCISED rather than asserted: set A = high-value click users,
    set B = high-value purchase users; the union's register table is
    literally `max(m_j) per bucket` over A's and B's registers (the
    exact operation that folds daily sketches at 100 TB), and the
    intersection comes from inclusion-exclusion over the three
    estimates — the standard HLL answer to 'how many users did both',
    computable from stored sketches alone, no raw re-scan. All four
    estimates sit next to their exact counterparts.

    Determinism: same integer finalizer/register pipeline as
    agg_hll_mergeable (shared CTE builders — the sketches hash
    identically by construction); register max/merge is integer; the
    estimates round at 6 dp.

    Scale: the register build is one combinable aggregation over
    2x64 groups; the merge adds a 128-row aggregation; everything
    after operates on <= 192 register rows. The exact branch is the
    audit-only distinct production drops. Inclusion-exclusion error
    compounds (sigma_intersection ~ sigma_a + sigma_b + sigma_union) —
    the known trade the audit columns make visible.
    """
    register_tables(spark, sf_dir, ("events",))
    return spark.sql(_hll_setops_sql("spark"))


def _hll_running_rest_sql(
    dialect: str, regs_rel: str, days_from_regs: bool = False
) -> str:
    """Everything downstream of the daily register table: the as-of
    grid join carrying each bucket's cumulative max rank to every day,
    per-day estimates, and the exact first-seen cumulative series for
    the audit column. ``regs_rel`` names the (g, bucket, m_j) register
    relation. Days are epoch-day INTEGERS (floor(epoch-seconds/86400),
    the events_behavior convention) — CAST(ts AS DATE) is
    session-timezone-dependent in Spark and would shift
    midnight-adjacent events off the tz-naive oracle's days.

    Plan-shape constraints, all measured (r6/r7):

    * ``days_from_regs``: with regs_rel a PERSISTED relation (the
      Spark path), `SELECT DISTINCT g FROM regs_rel` is a near-free
      InMemoryTableScan over |days|x64 rows and the right source for
      the two day-domain references — reading events would scan the
      raw log twice more (review r7). Every event lands in some
      bucket, so regs' day set equals events' day set exactly. With
      regs_rel an INLINE CTE (the single-statement oracle), each
      reference would re-execute the whole per-event hash pipeline
      (measured 3.4x regression, r6) — there days must derive from
      events directly (the day column needs no hash). The bucket
      domain is the literal 0..63 range either way; unhit buckets
      only ever produce NULL cumulative maxima, filtered before the
      estimate.
    * NESTED SUBQUERIES, not a WITH clause: Spark's CacheManager
      performs cached-plan substitution on the analyzed plan but does
      not rewrite inside WithCTE nodes, so any `WITH ...` in the
      outer query silently bypasses the persisted register table and
      recomputes the hash pipeline from parquet (verified: identical
      query 0 vs 1 InMemoryTableScan with/without the WITH)."""
    sec = "unix_timestamp(ts)" if dialect == "spark" else "CAST(floor(epoch(ts)) AS BIGINT)"
    buckets = (
        "SELECT explode(sequence(0, 63)) AS bucket"
        if dialect == "spark"
        else "SELECT * FROM range(0, 64) t(bucket)"
    )
    days = (
        f"SELECT DISTINCT g AS day FROM {regs_rel}"
        if days_from_regs
        else (
            f"SELECT DISTINCT CAST(floor({sec} / 86400) AS BIGINT) AS day"
            " FROM events"
        )
    )
    if dialect == "spark":
        # r12 (guide §2.4/§3): the as-of carry-forward as a RUNNING MAX
        # window — O(|days| x 64) rows through one sort — instead of the
        # r.g <= d.day inequality join, which Spark plans as a broadcast
        # nested-loop doing O(|days|^2 x 64) comparisons AND compiles a
        # far deeper operator tree. Interleaved A/B at sf0.1: first-exec
        # 1.34 vs 4.58 s, steady 1.01 vs 1.07 s, rows identical. max()
        # OVER ignores NULLs, so days with no register for a bucket
        # inherit the last seen rank exactly like the join form; the
        # oracle keeps the join spelling (same result by definition of
        # running max).
        active = f"""
      SELECT g, bucket, m_j FROM (
        SELECT d.day AS g, bk.bucket,
               max(r.m_j) OVER (PARTITION BY bk.bucket ORDER BY d.day
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS m_j
        FROM ({days}) d
        CROSS JOIN ({buckets}) bk
        LEFT JOIN {regs_rel} r ON r.bucket = bk.bucket AND r.g = d.day
      ) cum WHERE m_j IS NOT NULL"""
    else:
        active = f"""
      SELECT g, bucket, m_j FROM (
        SELECT d.day AS g, bk.bucket, max(r.m_j) AS m_j
        FROM ({days}) d
        CROSS JOIN ({buckets}) bk
        LEFT JOIN {regs_rel} r ON r.bucket = bk.bucket AND r.g <= d.day
        GROUP BY d.day, bk.bucket
      ) cum WHERE m_j IS NOT NULL"""
    fin = _hll_finalizer_sql(f"({active}) a")
    exact = f"""
    SELECT d.day,
           CAST(sum(coalesce(n.n_new, 0))
                OVER (ORDER BY d.day
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS exact_users_to_date
    FROM ({days}) d
    LEFT JOIN (
      SELECT first_day AS day, CAST(count(*) AS BIGINT) AS n_new
      FROM (
        SELECT user_id,
               min(CAST(floor({sec} / 86400) AS BIGINT)) AS first_day
        FROM events GROUP BY user_id
      ) first_seen GROUP BY first_day
    ) n ON n.day = d.day"""
    return f"""
SELECT e.day, e.exact_users_to_date,
       CAST(round(f.hll, 6) AS DOUBLE) AS hll_estimate,
       CAST(round(f.hll / e.exact_users_to_date - 1, 6) AS DOUBLE) AS rel_error
FROM ({exact}) e JOIN ({fin}) f ON e.day = f.g
ORDER BY e.day
"""


def _hll_running_src(dialect: str) -> str:
    sec = "unix_timestamp(ts)" if dialect == "spark" else "CAST(floor(epoch(ts)) AS BIGINT)"
    return f"(SELECT CAST(floor({sec} / 86400) AS BIGINT) AS g, user_id FROM events)"


def _hll_running_sql(dialect: str) -> str:
    """One-statement form (the DuckDB oracle; DuckDB materializes CTEs
    sensibly, so the single statement is fine there)."""
    return (
        f"WITH {_hll_regs_ctes(dialect, _hll_running_src(dialect))}"
        + _hll_running_rest_sql(dialect, "regs")
    )


@query("agg_hll_running_distinct", _hll_running_sql("duck"))
def agg_hll_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'Distinct users to date', daily — the dashboard series that is
    impossible to maintain exactly at 100 TB without re-scanning
    history, produced here from SKETCH STATE ONLY: each day's HLL
    registers (shared finalizer CTEs with the audit/set-ops queries)
    fold forward via a per-bucket cumulative max, so day d's estimate
    reads exactly the stored daily registers, never raw history. The
    exact first-seen cumulative series rides along as the audit.

    Determinism: the register pipeline is integer; the as-of grid
    join and cumulative max are integer; per-day estimates are the
    shared harmonic/linear-counting formula rounded at 6 dp; the
    exact side is a first-seen groupBy plus one running sum of
    integers.

    Scale: daily registers are the persisted state (64 rows/day);
    the carry-forward grid is |days| x 64 rows and the as-of join is
    O(|days|^2 x 64) on that TINY relation — independent of event
    volume, the entire point. The exact branch (one user-keyed
    groupBy) is the audit production drops; first-seen itself stays
    cheap because min(day) per user is combinable.

    Plan note (r7): the register table is materialized as a cached
    DataFrame rather than a CTE. Left inline, Catalyst's
    InferFiltersFromConstraints pushes the grid join's
    isnotnull(bucket) through the 12 collapsed projections,
    duplicating the ENTIRE per-event hash expression inside a scan
    Filter — and the resulting >2x-deep tree kicks the stage out of
    whole-stage codegen (interpreted evaluation, measured 4.6 s vs
    0.6 s for the register build alone at sf0.1). The
    InMemoryRelation is an optimizer barrier AND the honest 100 TB
    shape: daily registers (64 rows/day) ARE what a production
    pipeline persists; the grid never touches raw events.
    """
    from sparksql_server_spark.operators.scratch import CacheScope

    register_tables(spark, sf_dir, ("events",))
    scope = CacheScope(spark)
    regs = spark.sql(
        f"WITH {_hll_regs_ctes('spark', _hll_running_src('spark'))} "
        "SELECT g, bucket, m_j FROM regs"
    )
    regs.persist()
    regs.createOrReplaceTempView("hll_daily_regs")
    # scope.finish: materialize the result, then release the register
    # cache (no scoped block survives the return — the CacheScope
    # convention; an orphaned InMemoryRelation would both compete with
    # the server's cache budget and silently serve stale registers if
    # the parquet underneath were rewritten)
    out = scope.finish_pin(
        spark.sql(
            _hll_running_rest_sql("spark", "hll_daily_regs", days_from_regs=True)
        ),
        "hll_running_mat",
    )
    spark.catalog.dropTempView("hll_daily_regs")
    return out


def _nvr_sql(dialect: str) -> str:
    sec = "unix_timestamp(ts)" if dialect == "spark" else "CAST(floor(epoch(ts)) AS BIGINT)"
    return f"""
WITH d AS (SELECT CAST(floor({sec} / 86400) AS BIGINT) AS day, user_id
           FROM events),
first_seen AS (SELECT user_id, min(day) AS first_day FROM d GROUP BY user_id),
daily AS (
  SELECT d.day,
         CAST(count(DISTINCT d.user_id) AS BIGINT) AS active_users,
         CAST(count(DISTINCT CASE WHEN f.first_day = d.day
                                  THEN d.user_id END) AS BIGINT) AS new_users
  FROM d JOIN first_seen f ON d.user_id = f.user_id
  GROUP BY d.day)
SELECT day, active_users, new_users,
       CAST(active_users - new_users AS BIGINT) AS returning_users,
       CAST(sum(new_users) OVER (ORDER BY day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS users_to_date
FROM daily
ORDER BY day
"""


@query("events_new_vs_returning", _nvr_sql("duck"))
def events_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily new-vs-returning user split plus the cumulative user
    count — the acquisition/retention panel next to events_dau_wau's
    activity view: a user is 'new' on their first-seen day and
    'returning' on every later active day.

    Determinism: dates and integer counts end-to-end.

    Scale: first-seen is one combinable user-keyed aggregation (the
    persisted user-birthday table a real pipeline keeps — appended,
    never recomputed); the daily rollup joins events to it on user_id
    (co-partitioned with the groupBy's shuffle) and the running total
    is a window over |days| rows. No distinct-over-history anywhere —
    cumulative counts derive from first-seen days, the same trick the
    exact branch of agg_hll_running_distinct uses. Days are epoch-day
    integers (tz-independent, the events_behavior convention).
    """
    register_tables(spark, sf_dir, ("events",))
    return spark.sql(_nvr_sql("spark"))
