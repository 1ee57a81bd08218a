"""Statistical aggregates — variance/stddev, correlation/covariance,
fixed-bin histograms, and ordered string aggregation.

Float accumulation order makes engine-native ``stddev``/``corr``
non-reproducible across engines, so these compute the classical
moment sums exactly in DECIMAL (input columns carry ≤2 decimals →
products carry ≤4 — exact), then derive the statistics with
IEEE-deterministic double arithmetic from the exact moments. The same
SQL text runs on both engines. Spark's native stddev/corr agree with
these to float tolerance (pinned by a unit test, tests/test_oracle.py
family); the moment form is what lets t2 hash-match.

Scale: each query is one scan + one partial/final aggregation —
moments are algebraic, so map-side combine applies (same property
Spark's own ImperativeAggregates exploit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparksql_server_spark.catalog import register_tables, table
from sparksql_server_spark.functions.portable import prime_mix
from sparksql_server_spark.operators.registry import query


def _m(x: str, scale: int = 6) -> str:
    """Exact decimal sum of a ≤4-decimal product term, as double."""
    return f"CAST(sum(CAST({x} AS DECIMAL(28,{scale}))) AS DOUBLE)"


_MOMENTS_SQL = f"""
SELECT c_mktsegment,
       CAST(n AS BIGINT)                                   AS n,
       sx / n                                              AS mean_bal,
       (sxx - sx * sx / n) / (n - 1)                       AS var_bal,
       sqrt((sxx - sx * sx / n) / (n - 1))                 AS stddev_bal
FROM (
  SELECT c_mktsegment, count(*) AS n,
         {_m('c_acctbal')}                AS sx,
         {_m('c_acctbal * c_acctbal', 4)} AS sxx
  FROM customer GROUP BY c_mktsegment)
ORDER BY c_mktsegment
"""


@query("stats_var_stddev", oracle=_MOMENTS_SQL)
def stats_var_stddev(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample variance/stddev of account balance per segment via exact
    decimal moments (x carries 2 decimals, x² exactly 4)."""
    register_tables(spark, sf_dir, ("customer",))
    return spark.sql(_MOMENTS_SQL)


_CORR_SQL = f"""
SELECT l_returnflag,
       CAST(n AS BIGINT) AS n,
       (sxy - sx * sy / n)
         / (sqrt(sxx - sx * sx / n) * sqrt(syy - sy * sy / n)) AS corr_qty_price,
       (sxy - sx * sy / n) / (n - 1)                           AS covar_qty_price
FROM (
  SELECT l_returnflag, count(*) AS n,
         {_m('l_quantity')}                          AS sx,
         {_m('l_extendedprice')}                     AS sy,
         {_m('l_quantity * l_extendedprice', 4)}     AS sxy,
         {_m('l_quantity * l_quantity', 4)}          AS sxx,
         {_m('l_extendedprice * l_extendedprice', 4)} AS syy
  FROM lineitem GROUP BY l_returnflag)
ORDER BY l_returnflag
"""


@query("stats_corr_covar", oracle=_CORR_SQL)
def stats_corr_covar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation + sample covariance of quantity vs extended
    price per return flag, from the five exact moment sums — one scan,
    one aggregation, all map-side combinable."""
    # r12: small-input spread (guide §2.5) — interleaved steady A/B -0.98/-1.07 s
    register_tables(spark, sf_dir, ("lineitem",), spread=("lineitem",))
    return spark.sql(_CORR_SQL)


@query(
    "stats_histogram",
    oracle="""
    SELECT CAST(least(greatest(floor((c_acctbal + 1000.0) / 1100.0), 0), 9) AS INT)
             AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           CAST(min(c_acctbal) AS DOUBLE) AS lo,
           CAST(max(c_acctbal) AS DOUBLE) AS hi
    FROM customer
    GROUP BY bucket
    ORDER BY bucket
    """,
)
def stats_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-bin histogram of account balance (10 bins over
    [-1000, 10000), clamped): the distributed histogram primitive —
    bucket arithmetic is a deterministic row-local expression, so the
    whole thing is one hash aggregation."""
    c = table(spark, sf_dir, "customer")
    bucket = F.least(
        F.greatest(F.floor((F.col("c_acctbal") + 1000.0) / 1100.0), F.lit(0)),
        F.lit(9),
    ).cast("int")
    return (
        c.groupBy(bucket.alias("bucket"))
        .agg(
            F.count("*").alias("n"),
            F.min("c_acctbal").cast("double").alias("lo"),
            F.max("c_acctbal").cast("double").alias("hi"),
        )
        .orderBy("bucket")
    )


@query(
    "stats_string_agg",
    oracle="""
    SELECT n_nationkey,
           string_agg(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment)
             AS segments,
           CAST(count(DISTINCT c_mktsegment) AS INT) AS n_segments
    FROM nation JOIN customer ON c_nationkey = n_nationkey
    GROUP BY n_nationkey
    ORDER BY n_nationkey
    """,
)
def stats_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (listagg): distinct market segments
    per nation as a sorted CSV. Spark side builds it as
    array_join(array_sort(collect_set(...))) — same value, and the
    sort makes the result deterministic on both engines."""
    n = table(spark, sf_dir, "nation")
    c = table(spark, sf_dir, "customer")
    return (
        n.join(c, c.c_nationkey == n.n_nationkey)
        .groupBy("n_nationkey")
        .agg(
            F.array_join(F.array_sort(F.collect_set("c_mktsegment")), ",").alias(
                "segments"
            ),
            F.size(F.collect_set("c_mktsegment")).alias("n_segments"),
        )
        .orderBy("n_nationkey")
    )


@query(
    "stats_bool_bit_agg",
    oracle="""
    SELECT l_returnflag,
           bool_and(l_discount <= 0.1)   AS all_discount_capped,
           bool_or(l_tax > 0.07)         AS any_high_tax,
           CAST(bit_and(l_linenumber) AS BIGINT) AS ln_and,
           CAST(bit_or(l_linenumber)  AS BIGINT) AS ln_or,
           CAST(bit_xor(CAST(l_orderkey AS BIGINT)) AS BIGINT) AS key_xor
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def stats_bool_bit_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean (every/any) and bitwise (AND/OR/XOR) aggregates — all
    order-insensitive, so engine-portable with no decimal tricks."""
    register_tables(spark, sf_dir, ("lineitem",))
    return spark.sql(
        """
        SELECT l_returnflag,
               every(l_discount <= 0.1)  AS all_discount_capped,
               some(l_tax > 0.07)        AS any_high_tax,
               CAST(bit_and(l_linenumber) AS BIGINT) AS ln_and,
               CAST(bit_or(l_linenumber)  AS BIGINT) AS ln_or,
               CAST(bit_xor(CAST(l_orderkey AS BIGINT)) AS BIGINT) AS key_xor
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
        """
    )


_REGR_SQL = f"""
WITH m AS (
  SELECT l_returnflag,
         CAST(count(*) AS DOUBLE)                     AS n,
         {_m('l_quantity')}                           AS sx,
         {_m('l_extendedprice')}                      AS sy,
         {_m('l_quantity * l_quantity', 4)}           AS sxx,
         {_m('l_extendedprice * l_extendedprice', 4)} AS syy,
         {_m('l_quantity * l_extendedprice', 4)}      AS sxy
  FROM lineitem GROUP BY l_returnflag)
SELECT l_returnflag,
       CAST(n AS BIGINT)                                   AS regr_count,
       (n * sxy - sx * sy) / (n * sxx - sx * sx)           AS regr_slope,
       (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n
                                                           AS regr_intercept,
       ((n * sxy - sx * sy) * (n * sxy - sx * sy))
         / ((n * sxx - sx * sx) * (n * syy - sy * sy))     AS regr_r2
FROM m ORDER BY l_returnflag
"""


@query("stats_regr_linear", oracle=_REGR_SQL)
def stats_regr_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group simple linear regression (extendedprice on quantity):
    slope, intercept, R^2, n — the SQL regr_* aggregate family, built
    from the same exact-DECIMAL moment sums as stats_corr_covar
    because the engines' native regr_slope/regr_r2 accumulate floats
    in different orders and can't hash-match. The JVM-native closed
    form next to grouped_ols_regression's applyInPandas version: same
    math, zero Python in the path.

    Scale: one scan, one map-side-combinable aggregation — six moments
    per group; the regression solves in the projection.
    """
    # r12: small-input spread (guide §2.5) — interleaved steady A/B -1.03/-0.98 s
    register_tables(spark, sf_dir, ("lineitem",), spread=("lineitem",))
    return spark.sql(_REGR_SQL)


_MODE_SQL = """
WITH freq AS (
  SELECT l_returnflag, l_quantity, CAST(count(*) AS BIGINT) AS cnt
  FROM lineitem GROUP BY l_returnflag, l_quantity),
ranked AS (
  SELECT l_returnflag, l_quantity, cnt,
         row_number() OVER (PARTITION BY l_returnflag
                            ORDER BY cnt DESC, l_quantity) AS rn
  FROM freq)
SELECT l_returnflag, CAST(l_quantity AS DOUBLE) AS mode_qty, cnt AS mode_count
FROM ranked WHERE rn = 1 ORDER BY l_returnflag
"""


@query("stats_mode_deterministic", oracle=_MODE_SQL)
def stats_mode_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical mode per group with a DETERMINISTIC tiebreak
    (smallest value wins) — engine-native mode() returns an arbitrary
    element on ties, so it can never hash-match across engines; the
    count-then-rank form pins the answer and is the shape that scales
    anyway (two combinable aggregations + a WindowGroupLimit-prunable
    rank, never a per-group collect).
    """
    register_tables(spark, sf_dir, ("lineitem",))
    return spark.sql(_MODE_SQL)


_SKEW_SQL = """
WITH per_key AS (
  SELECT l_partkey AS key, CAST(count(*) AS BIGINT) AS n
  FROM lineitem GROUP BY l_partkey),
buckets AS (
  SELECT CAST(length(bin(n)) - 1 AS BIGINT) AS log2_bucket, n
  FROM per_key),
hist AS (
  SELECT log2_bucket,
         CAST(count(*) AS BIGINT) AS n_keys,
         CAST(sum(n) AS BIGINT) AS n_rows,
         CAST(max(n) AS BIGINT) AS hottest_key_rows
  FROM buckets GROUP BY log2_bucket),
tot AS (
  SELECT CAST(max(n) AS BIGINT) AS max_n,
         CAST(sum(n) AS BIGINT) AS total_rows,
         CAST(count(*) AS BIGINT) AS total_keys
  FROM per_key)
SELECT h.log2_bucket, h.n_keys, h.n_rows, h.hottest_key_rows,
       CAST(round(CAST(t.max_n AS DOUBLE) * t.total_keys / t.total_rows, 6)
            AS DOUBLE) AS skew_ratio_max_vs_mean
FROM hist h CROSS JOIN tot t
ORDER BY h.log2_bucket
"""


@query("stats_key_skew", _SKEW_SQL)
def stats_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew diagnostic for a prospective join/agg key —
    the profile you run BEFORE picking a strategy at 100 TB: per-key
    row counts folded into a log2 histogram (how heavy is the tail),
    the hottest key per bucket, and the max-vs-mean skew ratio that
    decides between a plain shuffle, AQE skew splitting, or salting.
    Key here: lineitem.l_partkey.

    Determinism: counts are exact integers; the log2 bucket is
    INTEGER arithmetic — length(bin(n)) - 1, never a float log whose
    last-ulp could flip floor() at a power of two; one rounded ratio
    column.

    Scale: this is two chained combinable aggregations (key -> count,
    bucket -> stats) — the profile costs one shuffle on the key being
    profiled, which is the cheapest possible full-data statistic; the
    1-row `tot` side broadcasts. Production runs it on a sample
    partition first, same plan shape.
    """
    register_tables(spark, sf_dir, ("lineitem",))
    return spark.sql(_SKEW_SQL)


_QSK_BINS = 64
_QSK_QS = "(0.5), (0.9), (0.99)"


_QSK_BOUNDS_BODY = """
  SELECT min(value) AS lo, max(value) AS hi,
         CAST(count(value) AS BIGINT) AS n
  FROM events"""


def _qsketch_sql(dialect: str, bounds_from: str | None = None) -> str:
    """Shared shape: 64-bin equi-width histogram sketch of
    events.value, interpolated quantile estimates, audited against the
    exact type-1 order statistic. Only the VALUES clause spells
    differently across dialects.

    ``bounds_from``: name of a relation already holding the one-row
    (lo, hi, n) bounds aggregate. The bounds CTE has THREE consumers
    (binned, and targets inlined by est AND exact), so without a
    barrier Spark re-runs the min/max/count scan per consumer — 5
    events scans in the plan where the algorithm needs 3 (bounds,
    histogram, exact sort)."""
    vals = (
        f"SELECT * FROM VALUES {_QSK_QS} AS t(q)"
        if dialect == "spark"
        else f"SELECT * FROM (VALUES {_QSK_QS}) t(q)"
    )
    bounds_body = (
        f"SELECT lo, hi, n FROM {bounds_from}"
        if bounds_from is not None
        else _QSK_BOUNDS_BODY
    )
    return f"""
WITH bounds AS ({bounds_body}),
binned AS (
  -- nullif guards the degenerate distribution (constant or single
  -- value -> hi == lo -> 0-width bins): the NULL bin coalesces to 0
  -- so every row lands in bin 0 on both engines instead of a NaN
  -- sketch (ADVICE r5 #4)
  SELECT CAST(least(coalesce(
                floor((e.value - b.lo) / (nullif(b.hi - b.lo, 0) / {_QSK_BINS})),
                0),
              {_QSK_BINS} - 1) AS BIGINT) AS bin
  FROM events e CROSS JOIN bounds b
  WHERE e.value IS NOT NULL),
hist AS (
  SELECT bin, CAST(count(*) AS BIGINT) AS c FROM binned GROUP BY bin),
cum AS (
  SELECT bin, c,
         CAST(sum(c) OVER (ORDER BY bin) AS BIGINT) AS cum,
         CAST(coalesce(sum(c) OVER (ORDER BY bin
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS cum_before
  FROM hist),
targets AS (
  SELECT q, CAST(ceil(q * b.n) AS BIGINT) AS r, b.lo, b.hi, b.n
  FROM ({vals}) CROSS JOIN bounds b),
est AS (
  SELECT t.q,
         t.lo + (c.bin + CAST(t.r - c.cum_before AS DOUBLE) / c.c)
              * ((t.hi - t.lo) / {_QSK_BINS}) AS sketch_v
  FROM targets t
  JOIN cum c ON c.cum >= t.r AND c.cum_before < t.r),
ranked AS (
  SELECT value, row_number() OVER (ORDER BY value) AS rn FROM events
  WHERE value IS NOT NULL),
exact AS (
  SELECT t.q, r.value AS exact_v
  FROM targets t JOIN ranked r ON r.rn = t.r)
SELECT e.q,
       CAST(round(e.exact_v, 6) AS DOUBLE) AS exact_value,
       CAST(round(s.sketch_v, 6) AS DOUBLE) AS sketch_estimate,
       CAST(round(abs(s.sketch_v - e.exact_v), 6) AS DOUBLE) AS abs_error
FROM exact e JOIN est s ON e.q = s.q
ORDER BY e.q
"""


@query("stats_quantile_sketch_audit", _qsketch_sql("duck"))
def stats_quantile_sketch_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-histogram quantile sketch, audited: p50/p90/p99 of
    events.value estimated from a 64-bin equi-width histogram with
    linear in-bin interpolation, next to the exact type-1 order
    statistic and the absolute error — the t-digest/KLL trade
    (bounded state, bounded error) in its simplest portable form.
    Completes the mergeable-sketch set with agg_hll_mergeable
    (distinct counts) — here the sketch state is the 64-row count
    vector and the merge is elementwise SUM, so per-partition / per-day
    histograms fold without re-scanning raw data.

    Determinism: bin ids come from one sub+div+floor on exact-input
    doubles (identical IEEE ops both engines); counts and target ranks
    are integers; interpolation is a short chain of exact-input float
    ops rounded to 6 dp.

    Scale: the sketch path is two combinable aggregations (bounds,
    then bin counts) and a 64-row window — constant state regardless
    of input size. The exact path's global row_number exists only for
    the audit column and is the branch production DROPS (at 100 TB
    the full sort is the thing the sketch replaces; the audit runs on
    samples). The bounds pass broadcasts as a 1-row relation.

    Round 12: the one-row bounds aggregate is pinned so its three
    consumers read the materialized row instead of re-scanning events
    per consumer (5 scans → 3, the algorithm's floor; see
    _qsketch_sql). Values identical — the pin is a barrier only.
    """
    from sparksql_server_spark.operators.scratch import pin_view

    register_tables(spark, sf_dir, ("events",))
    pin_view(spark, spark.sql(_QSK_BOUNDS_BODY), "qsk_bounds")
    return spark.sql(_qsketch_sql("spark", bounds_from="qsk_bounds"))


_CMS_D = 4  # hash rows
_CMS_W = 128  # counters per row
# four pairwise-independent-ish multiplicative hash schedules (odd
# multipliers, distinct adders) over the key, all exact BIGINT math
_CMS_HASH = "((({a} + {k} * {m}) % 1000000007) % {w})"
_CMS_PARAMS = ((1, 2654435761), (40503, 2246822519), (83117, 3266489917), (126611, 668265263))
_CMS_TOP = 12


_CMS_PER_KEY_BODY = """
  SELECT user_id, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY user_id"""


def _cms_sql(per_key_from: str | None = None) -> str:
    """Dialect-neutral SQL: build the d x w counter matrix in ONE
    aggregation pass (explode each key into its d (row, bucket)
    cells), then estimate the hottest users' counts as min over rows
    and audit against the exact count.

    ``per_key_from``: relation already holding the (user_id, n)
    per-key counts. The per_key CTE is consumed by all 4 cell UNION
    branches AND (through top_keys) all 4 probe branches, so the
    inline form re-runs the events groupBy 8 times (round 12; the
    Spark side pins it — 8 events scans → 1)."""
    cells = " UNION ALL ".join(
        f"SELECT {j} AS hrow, "
        + _CMS_HASH.format(a=a, k="user_id", m=m, w=_CMS_W)
        + " AS bucket, n FROM per_key"
        for j, (a, m) in enumerate(_CMS_PARAMS)
    )
    probes = " UNION ALL ".join(
        f"SELECT user_id, n, {j} AS hrow, "
        + _CMS_HASH.format(a=a, k="user_id", m=m, w=_CMS_W)
        + " AS bucket FROM top_keys"
        for j, (a, m) in enumerate(_CMS_PARAMS)
    )
    per_key = (
        f"SELECT user_id, n FROM {per_key_from}"
        if per_key_from
        else _CMS_PER_KEY_BODY
    )
    return f"""
WITH per_key AS ({per_key}),
cells AS ({cells}),
sketch AS (
  SELECT hrow, bucket, CAST(sum(n) AS BIGINT) AS c
  FROM cells GROUP BY hrow, bucket),
top_keys AS (
  SELECT user_id, n FROM per_key
  ORDER BY n DESC, user_id LIMIT {_CMS_TOP}),
probes AS ({probes}),
est AS (
  SELECT p.user_id, p.n, min(s.c) AS cms_estimate
  FROM probes p
  JOIN sketch s ON s.hrow = p.hrow AND s.bucket = p.bucket
  GROUP BY p.user_id, p.n)
SELECT user_id,
       n AS exact_count,
       CAST(cms_estimate AS BIGINT) AS cms_estimate,
       CAST(cms_estimate - n AS BIGINT) AS overcount
FROM est
ORDER BY exact_count DESC, user_id
"""


@query("stats_countmin_audit", _cms_sql())
def stats_countmin_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (Cormode/Muthukrishnan 2005) for heavy-hitter
    frequency, audited: a 4x128 counter matrix summarizes per-user
    event counts, the hottest users' frequencies are re-estimated as
    the min over their 4 cells, and the (always >= 0) overcount is
    reported next to the exact count. Third member of the mergeable-
    sketch set (agg_hll_mergeable: distinct; stats_quantile_sketch_
    audit: quantiles) — the CMS state is 512 integers and merges by
    elementwise SUM, so per-partition/per-day sketches fold without
    raw re-scans, and point frequency queries never touch raw data.

    Determinism: every hash, counter, and estimate is exact BIGINT
    arithmetic — zero float columns.

    Scale: the counter build is ONE combinable aggregation over
    (hrow, bucket) — 512 groups regardless of input size (the per_key
    pre-aggregation here is itself one keyed shuffle, and at 100 TB
    you skip it: feed raw events straight into the cell explode and
    let partial aggregation collapse to 512 rows map-side). The probe
    side is a LIMIT-12 broadcast against a 512-row relation. The
    exact column is the audit-only branch production drops.

    Round 12: the Spark side pins the per-key counts once — the 4+4
    UNION branches each re-ran the events groupBy under CTE inlining
    (8 events scans → 1; see _cms_sql). Values identical.
    """
    from sparksql_server_spark.operators.scratch import pin_view

    register_tables(spark, sf_dir, ("events",))
    pin_view(spark, spark.sql(_CMS_PER_KEY_BODY), "cms_per_key")
    return spark.sql(_cms_sql(per_key_from="cms_per_key"))


_JK_B = 32  # jackknife blocks


def _jk_blk_body() -> str:
    return f"""
  SELECT o_orderpriority AS grp,
         ({prime_mix('o_orderkey')}) % {_JK_B} AS b,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS s
  FROM orders
  GROUP BY o_orderpriority, ({prime_mix('o_orderkey')}) % {_JK_B}"""


def _jackknife_sql(blk_from: str | None = None) -> str:
    """Dialect-neutral SQL: hash rows into 32 blocks, one exact-decimal
    aggregation per (group, block), leave-one-block-out means, and the
    block-jackknife standard error of the per-priority mean price.

    ``blk_from``: relation already holding the tiny |groups|×32 block
    table. Under CTE inlining blk re-runs the orders aggregation for
    every transitive consumer (tot, loo, loo_mean, jk — 4 orders scans
    in the plan); the Spark side pins it once (round 12)."""
    blk = f"SELECT grp, b, n, s FROM {blk_from}" if blk_from else _jk_blk_body()
    return f"""
WITH blk AS ({blk}),
tot AS (
  SELECT grp, CAST(sum(n) AS BIGINT) AS n_tot,
         CAST(sum(CAST(s AS DECIMAL(24,6))) AS DOUBLE) AS s_tot,
         CAST(count(*) AS BIGINT) AS b_used
  FROM blk GROUP BY grp),
loo AS (
  SELECT blk.grp,
         (t.s_tot - blk.s) / (t.n_tot - blk.n) AS mean_i,
         t.s_tot / t.n_tot AS mean_all,
         t.n_tot, t.b_used
  FROM blk JOIN tot t ON blk.grp = t.grp),
loo_mean AS (
  -- the delete-one jackknife variance centers on the MEAN OF THE
  -- LEAVE-ONE-OUT ESTIMATES, not the overall mean: with unequal
  -- hash-block sizes the two differ and mean_all-centering
  -- systematically inflates the SE (ADVICE r5 #5)
  SELECT grp, avg(mean_i) AS m_bar FROM loo GROUP BY grp),
jk AS (
  SELECT loo.grp,
         min(mean_all) AS mean_price,
         min(n_tot) AS n_orders,
         min(b_used) AS b_used,
         sum((mean_i - m.m_bar) * (mean_i - m.m_bar)) AS ss
  FROM loo JOIN loo_mean m ON loo.grp = m.grp
  GROUP BY loo.grp)
SELECT grp AS o_orderpriority,
       CAST(n_orders AS BIGINT) AS n_orders,
       CAST(round(mean_price, 6) AS DOUBLE) AS mean_price,
       CAST(round(sqrt(ss * (b_used - 1) / b_used), 6) AS DOUBLE) AS jackknife_se,
       CAST(round(mean_price - 1.96 * sqrt(ss * (b_used - 1) / b_used), 6)
            AS DOUBLE) AS ci_lo,
       CAST(round(mean_price + 1.96 * sqrt(ss * (b_used - 1) / b_used), 6)
            AS DOUBLE) AS ci_hi
FROM jk
ORDER BY o_orderpriority
"""


@query("stats_jackknife_ci", _jackknife_sql())
def stats_jackknife_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Block-jackknife confidence interval for the mean order price per
    priority — uncertainty quantification as pure dataflow, no RNG:
    rows land in 32 blocks by multiplicative hash of the order key
    folded through a prime modulus — taking 2^31 residues mod 32 would
    keep only the key's unmixed low 5 bits (sparse dbgen-style key
    spaces then populate a fraction of the blocks and silently inflate
    the SE); the prime fold spreads every key bit, the pre-mod keeps
    the product under 2^62 for ANSI BIGINT, and the assignment stays
    reproducible across engines/reruns/partitionings, unlike sampled
    bootstraps — each block's exact-decimal sum/count feed
    leave-one-block-out means, and the delete-block jackknife variance
    (squared deviations centered on the mean of the leave-one-out
    estimates — mean_all-centering inflates the SE when hash blocks
    are unequal) yields the SE and a 95% CI.

    Determinism: block assignment and per-block sums are exact
    (integer hash, DECIMAL accumulation); the only order-dependent
    float reduction is the 32-term squared-deviation sum (error
    ~1e-14 vs 6-dp rounding).

    Scale: ONE aggregation keyed by (group, block) — 32x the groups of
    a plain mean, still combinable and tiny — then a 32-row-per-group
    join and rollup. This is the mergeable-uncertainty shape: daily
    (group, block) sums fold across days by addition, so the CI of any
    window is computable from stored partials without re-scanning raw
    data (same storytelling as the sketch set, but for error bars).

    Round 12: the Spark side pins the |groups|×32 block table once —
    CTE inlining re-ran the orders aggregation per transitive consumer
    (4 orders scans → 1; see _jackknife_sql). Values identical.
    """
    from sparksql_server_spark.operators.scratch import pin_view

    register_tables(spark, sf_dir, ("orders",))
    pin_view(spark, spark.sql(_jk_blk_body()), "jk_blk")
    return spark.sql(_jackknife_sql(blk_from="jk_blk"))


_AB_SQL = f"""
WITH assigned AS (
  SELECT event_type,
         ({prime_mix('user_id')}) % 2 AS arm,
         value
  FROM events WHERE value IS NOT NULL),
m AS (
  SELECT event_type, arm,
         CAST(count(*) AS BIGINT) AS n,
         {_m('value', 2)} AS s,
         {_m('value * value', 4)} AS ss
  FROM assigned GROUP BY event_type, arm),
wide AS (
  SELECT event_type,
         max(CASE WHEN arm = 0 THEN n END) AS na,
         max(CASE WHEN arm = 1 THEN n END) AS nb,
         max(CASE WHEN arm = 0 THEN s END) AS sa,
         max(CASE WHEN arm = 1 THEN s END) AS sb,
         max(CASE WHEN arm = 0 THEN ss END) AS ssa,
         max(CASE WHEN arm = 1 THEN ss END) AS ssb
  FROM m GROUP BY event_type),
stats AS (
  SELECT event_type, na, nb,
         sa / na AS ma, sb / nb AS mb,
         (ssa - sa * sa / na) / (na - 1) / na AS va_n,
         (ssb - sb * sb / nb) / (nb - 1) / nb AS vb_n
  FROM wide)
SELECT event_type,
       na AS n_a, nb AS n_b,
       CAST(round(ma, 6) AS DOUBLE) AS mean_a,
       CAST(round(mb, 6) AS DOUBLE) AS mean_b,
       CAST(round((ma - mb) / sqrt(va_n + vb_n), 6) AS DOUBLE) AS welch_t,
       CAST(round((va_n + vb_n) * (va_n + vb_n)
              / (va_n * va_n / (na - 1) + vb_n * vb_n / (nb - 1)), 6)
            AS DOUBLE) AS welch_df
FROM stats
ORDER BY event_type
"""


@query("stats_ab_welch_ttest", _AB_SQL)
def stats_ab_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout — Welch's unequal-variance t-test per
    event type, with DETERMINISTIC arm assignment: users hash into
    arms via the prime-folded multiplicative mix (the
    stats_jackknife_ci hash — every key bit spreads, and assignment is
    reproducible across engines/reruns, which a real experiment
    platform requires for consistent user bucketing). Reports per-arm
    means, the Welch t statistic, and the Welch-Satterthwaite degrees
    of freedom; the null decision is the caller's threshold on |t|.
    On this corpus value is arm-independent by construction, so t
    hovers near 0 — the negative control an experiment pipeline
    validates itself with (an A/A test).

    Determinism: arm assignment and counts are integer; sums go
    through the exact-DECIMAL pattern (value carries 2 decimals, its
    square exactly 4); every derived statistic is a short chain of
    exact-input IEEE ops rounded at 6 dp.

    Scale: ONE combinable aggregation keyed by (event_type, arm) —
    the moment sums are the experiment's mergeable state (daily
    partials fold by addition, the jackknife/sketch storytelling),
    and the readout runs from stored partials without raw re-scans.
    """
    register_tables(spark, sf_dir, ("events",))
    return spark.sql(_AB_SQL)


_CUPED_SPLIT = "TIMESTAMP '2024-01-16 00:00:00'"


def _cuped_sql() -> str:
    """Dialect-neutral SQL: per-user pre/post means (exact-decimal
    inner sums), decimal-folded user-level moments, CUPED theta and
    the achieved variance reduction."""
    return f"""
WITH per_user AS (
  SELECT user_id,
         CAST(sum(CASE WHEN ts < {_CUPED_SPLIT}
                       THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE)
           AS s_pre,
         count(CASE WHEN ts < {_CUPED_SPLIT} THEN 1 END) AS n_pre,
         CAST(sum(CASE WHEN ts >= {_CUPED_SPLIT}
                       THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE)
           AS s_post,
         count(CASE WHEN ts >= {_CUPED_SPLIT} THEN 1 END) AS n_post
  FROM events WHERE value IS NOT NULL
  GROUP BY user_id),
xy AS (
  SELECT user_id, s_pre / n_pre AS x, s_post / n_post AS y
  FROM per_user WHERE n_pre > 0 AND n_post > 0),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(x AS DECIMAL(28,12))) AS DOUBLE) AS sx,
         CAST(sum(CAST(y AS DECIMAL(28,12))) AS DOUBLE) AS sy,
         CAST(sum(CAST(x * x AS DECIMAL(38,20))) AS DOUBLE) AS sxx,
         CAST(sum(CAST(y * y AS DECIMAL(38,20))) AS DOUBLE) AS syy,
         CAST(sum(CAST(x * y AS DECIMAL(38,20))) AS DOUBLE) AS sxy
  FROM xy),
stats AS (
  SELECT n,
         (sxy - sx * sy / n) / (n - 1) AS cov_xy,
         (sxx - sx * sx / n) / (n - 1) AS var_x,
         (syy - sy * sy / n) / (n - 1) AS var_y
  FROM m)
SELECT n AS n_users,
       CAST(round(cov_xy / var_x, 6) AS DOUBLE) AS theta,
       CAST(round(var_y, 6) AS DOUBLE) AS var_y,
       CAST(round(var_y - cov_xy * cov_xy / var_x, 6) AS DOUBLE) AS var_y_cuped,
       CAST(round(100 * cov_xy * cov_xy / (var_x * var_y), 6) AS DOUBLE)
         AS variance_reduction_pct
FROM stats
"""


@query("stats_cuped_adjustment", _cuped_sql())
def stats_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED (Deng et al., WSDM 2013) — the industry-standard
    experiment variance-reduction readout: each user's pre-period mean
    value is the control covariate for their post-period metric;
    theta = cov(x,y)/var(x) is the adjustment coefficient, and the
    reduction column is the fraction of metric variance the covariate
    removes (rho^2) — i.e. how much smaller an experiment this
    telemetry could run. Pairs with stats_ab_welch_ttest: Welch reads
    the experiment, CUPED shrinks the sample size it needs.

    Determinism: the inner pre/post sums are exact DECIMAL over
    2-decimal values; user-level means are single exact divisions;
    the user-level moment sums fold through the DECIMAL-cast pattern
    (emb_centroid_stats precedent) so accumulation order cannot
    perturb them; final statistics are short exact-input IEEE chains
    rounded at 6 dp.

    Scale: one user-keyed aggregation (pre and post in the SAME pass
    via conditional aggregates — not two scans), then a single-group
    moment fold; both combinable. The per-user pre-period relation is
    the covariate table an experiment platform persists per cohort —
    computed once, joined by every subsequent experiment readout.
    """
    register_tables(spark, sf_dir, ("events",))
    return spark.sql(_cuped_sql())
