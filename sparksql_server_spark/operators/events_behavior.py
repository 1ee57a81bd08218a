"""Behavioral analytics over the events table — cohort retention,
event-to-event transition matrix, rolling active users (DAU/WAU).

All time arithmetic compares epoch SECONDS (Spark flooring
`unix_timestamp` vs DuckDB `floor(epoch(ts))` — the events parquet is
nanosecond-typed, so sub-second comparisons would be engine-relative;
see events_windows._funnel_sql). Outputs are integer counts and single
IEEE divisions — cross-engine deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from sparksql_server_spark.catalog import register_tables
from sparksql_server_spark.functions.portable import dsum
from sparksql_server_spark.operators.registry import query

_SPARK_SEC = "unix_timestamp(ts)"
_DUCK_SEC = "CAST(floor(epoch(ts)) AS BIGINT)"


def _retention_sql(sec_expr: str) -> str:
    """Shared shape: cohort week = each user's first active week;
    retention cell (cohort_week, week_offset) counts distinct users
    from that cohort active offset weeks later."""
    return f"""
WITH a AS (SELECT user_id,
                  CAST(floor({sec_expr} / 604800) AS BIGINT) AS week
           FROM events),
cohort AS (SELECT user_id, min(week) AS cohort_week
           FROM a GROUP BY user_id),
cells AS (SELECT DISTINCT c.cohort_week, a.week - c.cohort_week AS week_offset,
                 a.user_id
          FROM a JOIN cohort c ON a.user_id = c.user_id)
SELECT cohort_week,
       week_offset,
       CAST(count(*) AS BIGINT) AS n_users,
       round(CAST(count(*) AS DOUBLE) /
             max(CAST((SELECT count(*) FROM cohort c2
                       WHERE c2.cohort_week = cells.cohort_week) AS DOUBLE)),
             4) AS retention
FROM cells
GROUP BY cohort_week, week_offset
ORDER BY cohort_week, week_offset
"""


@query("events_retention_cohort", oracle=_retention_sql(_DUCK_SEC))
def events_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users are assigned to the week of
    their first event; each (cohort_week, week_offset) cell counts the
    cohort's users still active that many weeks later, with the
    retention rate against cohort size.

    Scale: two aggregations keyed on user_id (cohort assignment) and
    one on (cohort, offset) — all map-side combinable; the cohort-size
    correlated subquery decorrelates to a broadcast join against the
    weeks-sized cohort table. No windows, no explode.
    """
    register_tables(spark, sf_dir, ("events",))
    return spark.sql(_retention_sql(_SPARK_SEC))


def _transition_sql(sec_expr: str) -> str:
    """Shared shape: per user, events ordered by (second, event_id);
    count each (event_type -> next_event_type) step and its share of
    all steps leaving the source type."""
    return f"""
WITH e AS (SELECT user_id, event_type, {sec_expr} AS s, event_id
           FROM events),
steps AS (SELECT event_type AS from_type,
                 lead(event_type) OVER (PARTITION BY user_id
                                        ORDER BY s, event_id) AS to_type
          FROM e),
pairs AS (SELECT from_type, to_type, count(*) AS n
          FROM steps WHERE to_type IS NOT NULL
          GROUP BY from_type, to_type)
SELECT from_type, to_type,
       CAST(n AS BIGINT) AS n_steps,
       CAST(n AS DOUBLE) /
         CAST(sum(n) OVER (PARTITION BY from_type) AS DOUBLE) AS p_transition
FROM pairs
ORDER BY from_type, to_type
"""


@query("events_transition_matrix", oracle=_transition_sql(_DUCK_SEC))
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of user behavior: for each
    consecutive event pair in a user's (second, event_id)-ordered
    stream, the step count and the conditional probability of the next
    event type given the current one.

    Scale: one lead() window partitioned by user_id (the natural
    shuffle key), then an aggregation to the |types|² matrix; the
    normalizing window runs over that tiny matrix. The (s, event_id)
    ordering is total and engine-identical, so lead() is deterministic.
    """
    register_tables(spark, sf_dir, ("events",))
    return spark.sql(_transition_sql(_SPARK_SEC))


def _dau_wau_sql(dialect: str) -> str:
    """Shared shape: distinct (user, day) activity; DAU per day; WAU
    via the explode-to-window trick — each active (user, day)
    contributes membership to the 7 trailing windows that contain it,
    turning a rolling COUNT(DISTINCT) (which window frames cannot
    express) into a plain groupBy-distinct."""
    sec = _SPARK_SEC if dialect == "spark" else _DUCK_SEC
    off = (
        "LATERAL VIEW explode(sequence(0, 6)) t AS off"
        if dialect == "spark"
        else ", unnest(range(0, 7)) AS t(off)"
    )
    return f"""
WITH a AS (SELECT DISTINCT user_id,
                  CAST(floor({sec} / 86400) AS BIGINT) AS day
           FROM events),
dau AS (SELECT day, CAST(count(*) AS BIGINT) AS dau
        FROM a GROUP BY day),
cover AS (SELECT DISTINCT a.user_id, a.day + off AS day
          FROM a {off}),
wau AS (SELECT day, CAST(count(*) AS BIGINT) AS wau
        FROM cover GROUP BY day)
SELECT d.day, d.dau, w.wau,
       round(CAST(d.dau AS DOUBLE) / w.wau, 4) AS stickiness
FROM dau d JOIN wau w ON d.day = w.day
ORDER BY d.day
"""


@query("events_dau_wau", oracle=_dau_wau_sql("duck"))
def events_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily and trailing-7-day active users with the DAU/WAU
    stickiness ratio. A rolling COUNT(DISTINCT user) is inexpressible
    as a window frame, so each active (user, day) is exploded to the 7
    trailing windows containing it and de-duplicated — the standard
    scale trick that keeps distinct-counting a plain aggregation.

    Scale: the explode is a fixed ×7 on the *distinct* (user, day)
    table (already ≪ raw events), and every aggregation is map-side
    combinable on well-distributed keys. Swapping 7 → N only changes
    the fan-out constant.
    """
    register_tables(spark, sf_dir, ("events",))
    return spark.sql(_dau_wau_sql("spark"))


def _arrival_sql(sec: str) -> str:
    """Shared shape: per event-type stream in event_id (arrival)
    order — inter-arrival gap histogram plus the out-of-order event
    count (event time below the running high-water mark)."""
    return f"""
WITH arr AS (
  SELECT event_type,
         {sec} AS ts_sec,
         lag({sec}) OVER (PARTITION BY event_type ORDER BY event_id)
           AS prev_sec,
         max({sec}) OVER (PARTITION BY event_type ORDER BY event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS high_water
  FROM events),
late AS (
  SELECT event_type,
         CAST(sum(CASE WHEN ts_sec < high_water THEN 1 ELSE 0 END) AS BIGINT)
           AS n_out_of_order
  FROM arr GROUP BY event_type),
gaps AS (
  SELECT event_type,
         ts_sec - prev_sec AS gap,
         CASE WHEN ts_sec - prev_sec < 0 THEN -1
              WHEN ts_sec - prev_sec <= 60 THEN 0
              WHEN ts_sec - prev_sec <= 600 THEN 1
              WHEN ts_sec - prev_sec <= 1800 THEN 2
              WHEN ts_sec - prev_sec <= 3600 THEN 3
              ELSE 4 END AS gap_bucket
  FROM arr WHERE prev_sec IS NOT NULL)
SELECT l.event_type,
       CAST(coalesce(g.gap_bucket, -2) AS INT) AS gap_bucket,
       CAST(count(g.gap_bucket) AS BIGINT) AS n_gaps,
       CAST(coalesce(max(g.gap), 0) AS BIGINT) AS max_gap_sec,
       CAST(min(l.n_out_of_order) AS BIGINT) AS n_out_of_order
FROM late l LEFT JOIN gaps g ON g.event_type = l.event_type
GROUP BY l.event_type, g.gap_bucket
ORDER BY l.event_type, gap_bucket
"""


_ARRIVAL_ONEPASS_TAIL = """
cells AS (
  SELECT event_type,
         CASE WHEN prev_sec IS NULL THEN NULL
              WHEN ts_sec - prev_sec < 0 THEN -1
              WHEN ts_sec - prev_sec <= 60 THEN 0
              WHEN ts_sec - prev_sec <= 600 THEN 1
              WHEN ts_sec - prev_sec <= 1800 THEN 2
              WHEN ts_sec - prev_sec <= 3600 THEN 3
              ELSE 4 END AS gap_bucket,
         ts_sec - prev_sec AS gap,
         CASE WHEN ts_sec < high_water THEN 1 ELSE 0 END AS late
  FROM arr),
agg AS (
  SELECT event_type, gap_bucket,
         CAST(count(gap) AS BIGINT) AS n_gaps,
         max(gap) AS max_gap,
         sum(late) AS n_late
  FROM cells GROUP BY event_type, gap_bucket),
fin AS (
  SELECT event_type, gap_bucket, n_gaps, max_gap,
         sum(n_late) OVER (PARTITION BY event_type) AS n_out_of_order,
         count(gap_bucket) OVER (PARTITION BY event_type) AS n_buckets
  FROM agg)
SELECT event_type,
       CAST(coalesce(gap_bucket, -2) AS INT) AS gap_bucket,
       n_gaps,
       CAST(coalesce(max_gap, 0) AS BIGINT) AS max_gap_sec,
       CAST(n_out_of_order AS BIGINT) AS n_out_of_order
FROM fin
WHERE gap_bucket IS NOT NULL OR n_buckets = 0
ORDER BY event_type, gap_bucket
"""


def _arrival_spark_onepass_sql(sec: str) -> str:
    """Spark-side one-pass tail over the plain single-window ``arr``
    (round 12, guide §2.4 "remove shuffles outright"): the oracle-shape
    tail consumes ``arr`` TWICE (``late`` aggregates every row,
    ``gaps`` re-reads it for the histogram), and Spark's CTE inlining
    re-executes the window for each consumer (ReuseExchange dedups the
    shuffle below it, not the window sort above it). One grouped pass
    over ``arr`` keyed by (event_type, nullable gap_bucket) computes
    per-bucket n_gaps/max_gap AND the per-row lateness sum; a
    per-type window over those ≤7-row groups (window, not a
    groupBy+self-join — a second consumer of agg would make CTE
    inlining duplicate the whole subtree again) reconstructs
    n_out_of_order and the -2 no-gaps row. Values are IDENTICAL to the
    oracle tail: gap/bucket/lateness are per-row integer expressions,
    counts/sums/maxes are grouping-order-free, and the -2 row fires
    exactly when a type has zero non-NULL gaps (first-event rows carry
    a NULL bucket, so every type has the NULL group; types with
    buckets drop it, types without surface it as the oracle's
    LEFT-JOIN miss)."""
    return f"""
WITH arr AS (
  SELECT event_type,
         {sec} AS ts_sec,
         lag({sec}) OVER (PARTITION BY event_type ORDER BY event_id)
           AS prev_sec,
         max({sec}) OVER (PARTITION BY event_type ORDER BY event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS high_water
  FROM events),
{_ARRIVAL_ONEPASS_TAIL}"""


def _arrival_spark_banded_sql(sec: str, band: int) -> str:
    """Spark-side banded rewrite of :func:`_arrival_sql`'s ``arr`` CTE
    (round 11; the ×100 scale sweep measured exponent 0.749 and the
    cause is structural: ``PARTITION BY event_type`` caps the window
    sort at 5 parallel tasks forever — a constant-parallelism ceiling,
    the window-flavored cousin of the constant-bucket ceiling the r6
    verdict flagged). ``bkt = floor(event_id / band)`` is monotone in
    the window's ORDER BY key, so per-(type, band) windows compute
    lag/running-max for every row except each band's head rows, and a
    TINY per-(type, band) prefix table (last event time per band via
    max_by, prefix running max via a window over bands) patches the
    heads: prev_sec = coalesce(in-band lag, previous band's last),
    high_water = max(in-band prefix max, previous bands' max).
    Parallelism now grows with the data (types × bands) instead of
    pinning at the type count; values are IDENTICAL to the oracle's
    single-window form (band order ≡ event_id order)."""
    return f"""
WITH ev AS (
  SELECT event_type, event_id, {sec} AS ts_sec,
         CAST(floor(event_id / {band}) AS BIGINT) AS bkt
  FROM events),
w AS (
  SELECT event_type, bkt, ts_sec,
         lag(ts_sec) OVER (PARTITION BY event_type, bkt
                           ORDER BY event_id) AS prev_in,
         max(ts_sec) OVER (PARTITION BY event_type, bkt ORDER BY event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS hw_in
  FROM ev),
bstats AS (
  SELECT event_type, bkt, max_by(ts_sec, event_id) AS last_sec,
         max(ts_sec) AS max_sec
  FROM ev GROUP BY event_type, bkt),
bpre AS (
  SELECT event_type, bkt,
         lag(last_sec) OVER (PARTITION BY event_type ORDER BY bkt)
           AS prev_last,
         max(max_sec) OVER (PARTITION BY event_type ORDER BY bkt
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prefix_hw
  FROM bstats),
arr AS (
  SELECT w.event_type, w.ts_sec,
         coalesce(w.prev_in, b.prev_last) AS prev_sec,
         CASE WHEN w.hw_in IS NULL THEN b.prefix_hw
              WHEN b.prefix_hw IS NULL THEN w.hw_in
              ELSE greatest(w.hw_in, b.prefix_hw) END AS high_water
  FROM w JOIN bpre b ON w.event_type = b.event_type AND w.bkt = b.bkt),
{_ARRIVAL_ONEPASS_TAIL}"""


@query("events_arrival_profile", oracle=_arrival_sql(_DUCK_SEC))
def events_arrival_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-arrival profile — the batch numbers that tune the
    streaming operators in streaming/events.py: per event-type stream
    in arrival order (event_id is the ingestion sequence), the
    inter-arrival gap histogram (<=1min / <=10min / <=30min / <=1h /
    over, with out-of-order arrivals in their own bucket -1 so a
    negative gap can never masquerade as 'on time', and streams too
    small to have any gap emitted as bucket -2 so no stream is
    silently absent — picks the sessionize gap and trigger interval)
    and the
    out-of-order event count vs the running event-time high-water
    mark (the `withWatermark` delay input; 0 on this corpus — the
    generator emits in order, and the column PROVES that rather than
    assuming it).

    Determinism: epoch-seconds integers end-to-end (the
    unix_timestamp/floor(epoch()) pairing of this module); running
    max/lag over a total (event_type, event_id) order; integer
    buckets and counts.

    Scale (round 11): a plain ``PARTITION BY event_type`` window pins
    the sort at one task per type forever (5 here) — measured exponent
    0.749 at the ×100 sweep. Past ~4 bands of rows the Spark plan
    switches to the BANDED form (:func:`_arrival_spark_banded_sql`):
    per-(type, band) windows plus a tiny per-band prefix patch, so
    parallelism grows with the data (×100 measured 34.3 → 16.9 s,
    exponent → ~0.5). Below that the banding machinery's extra
    shuffle/join/windows cost more than they parallelize (sf0.1
    measured 1.09 s plain vs 2.67 s banded — the constant-size count
    probe picks the plain single-window statement there, which is also
    byte-identical to the oracle's shape). Values are IDENTICAL either
    way; the oracle keeps the single-window statement. Then a
    combinable histogram rollup joined with the 5-row lateness rollup.
    No global ordering anywhere.
    """
    register_tables(spark, sf_dir, ("events",))
    band = 65536
    # r12: both Spark forms consume arr through the ONE-PASS tail
    # (_ARRIVAL_ONEPASS_TAIL) — the oracle keeps the two-consumer
    # LEFT-JOIN shape; see _arrival_spark_onepass_sql for the
    # equivalence argument and OPTIMIZATION_r12.md for the A/B.
    if spark.table("events").count() > 4 * band:
        return spark.sql(_arrival_spark_banded_sql(_SPARK_SEC, band))
    return spark.sql(_arrival_spark_onepass_sql(_SPARK_SEC))


def _ltv_sql(sec: str) -> str:
    """Shared shape: weekly signup cohorts, per-(cohort, age) exact
    value sums, cumulative LTV per cohort member via a window over the
    tiny cell table."""
    return f"""
WITH a AS (SELECT user_id, value,
                  CAST(floor({sec} / 604800) AS BIGINT) AS week
           FROM events),
cohort AS (SELECT user_id, min(week) AS cohort_week
           FROM a GROUP BY user_id),
csize AS (SELECT cohort_week, CAST(count(*) AS BIGINT) AS cohort_users
          FROM cohort GROUP BY cohort_week),
cells AS (
  SELECT c.cohort_week, a.week - c.cohort_week AS age_weeks,
         coalesce({dsum('a.value', 2)}, 0) AS revenue
  FROM a JOIN cohort c ON a.user_id = c.user_id
  GROUP BY c.cohort_week, a.week - c.cohort_week),
cum AS (
  SELECT cohort_week, age_weeks,
         sum(revenue) OVER (PARTITION BY cohort_week ORDER BY age_weeks
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_revenue
  FROM cells)
SELECT cm.cohort_week, CAST(cm.age_weeks AS BIGINT) AS age_weeks,
       s.cohort_users,
       CAST(round(cm.cum_revenue, 6) AS DOUBLE) AS cum_revenue,
       CAST(round(cm.cum_revenue / s.cohort_users, 6) AS DOUBLE)
         AS ltv_per_user
FROM cum cm JOIN csize s ON cm.cohort_week = s.cohort_week
ORDER BY cm.cohort_week, cm.age_weeks
"""


@query("events_cohort_ltv", oracle=_ltv_sql(_DUCK_SEC))
def events_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV triangle — the value companion to
    events_retention_cohort's count matrix: users group into weekly
    signup cohorts, and each (cohort, age) cell reports the cohort's
    CUMULATIVE revenue and per-user lifetime value at that age (the
    curve whose plateau prices an acquisition budget). Cohort
    assignment uses ALL events (the same first-seen definition as
    events_new_vs_returning, so one persisted birthday table serves
    both); only the revenue sums skip NULL values.

    Determinism: week arithmetic is epoch-seconds integer division
    (this module's pairing); revenue sums go through portable.dsum
    (the exact-DECIMAL pattern) per cell; the cumulative window then adds exact-input
    doubles in one deterministic order (ordered window frame, not an
    unordered aggregation), so both engines accumulate identically;
    one rounded division by an integer cohort size.

    Scale: one user-keyed aggregation for cohort assignment (the same
    persisted user-birthday table events_new_vs_returning reads), a
    co-partitioned join back, one combinable (cohort, age) rollup —
    the window runs over the weeks x weeks cell table, never over raw
    events. Cohort tables at 100 TB are exactly this shape with more
    weeks.
    """
    register_tables(spark, sf_dir, ("events",))
    return spark.sql(_ltv_sql(_SPARK_SEC))
