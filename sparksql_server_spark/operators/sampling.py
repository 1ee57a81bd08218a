"""Deterministic sampling operators — hash-Bernoulli, stratified
fixed-size, and a seeded sampled aggregate.

Training-data pipelines sample constantly (eval splits, QA draws,
curriculum mixes). Engine-native TABLESAMPLE is nondeterministic
across engines/partitionings, so these operators sample by *key
hash*: reproducible, re-runnable, cross-engine identical, and — the
scale property — evaluated as a pushed-down filter on a map-only
pass, never a shuffle or a driver RNG.

Knuth multiplicative hashing: mix(k) = (k * 2654435761) % 2^31, then
take a residue band. Max key (~6M at sf0.1) × 2654435761 ≈ 1.6e16 —
far inside BIGINT on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sparksql_server_spark.catalog import register_tables, table
from sparksql_server_spark.functions.portable import dsum
from sparksql_server_spark.operators.registry import query

_MIX = "((({k}) * 2654435761) % 2147483648)"


def _mix_col(k: str) -> F.Column:
    return (F.col(k) * F.lit(2654435761)) % F.lit(2147483648)


@query(
    "sample_bernoulli_hash",
    oracle=f"""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE {_MIX.format(k='o_orderkey')} % 100 < 10
""",
)
def sample_bernoulli_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~10% Bernoulli sample of orders, keyed on o_orderkey. The
    predicate is a deterministic row-local filter: map-only, safe to
    re-run, and stable when the table is rewritten/repartitioned."""
    o = table(spark, sf_dir, "orders")
    return (
        o.filter(_mix_col("o_orderkey") % 100 < 10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@query(
    "sample_stratified_fixed",
    oracle=f"""
    SELECT c_mktsegment, c_custkey, c_acctbal
    FROM (SELECT c_mktsegment, c_custkey, c_acctbal,
                 row_number() OVER (PARTITION BY c_mktsegment
                     ORDER BY {_MIX.format(k='c_custkey')}, c_custkey) AS rn
          FROM customer)
    WHERE rn <= 50
    ORDER BY c_mktsegment, c_custkey
    """,
)
def sample_stratified_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-50-per-segment stratified sample: rank rows inside each
    stratum by key hash (a deterministic shuffle order) and keep the
    first 50 — the reproducible analogue of reservoir sampling.

    Scale: one shuffle on the stratum key; Spark plans the rn<=k
    filter as WindowGroupLimit, so each partition keeps only 50 rows
    before the window sort.
    """
    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        _mix_col("c_custkey").asc(), F.col("c_custkey").asc()
    )
    return (
        c.select(
            "c_mktsegment",
            "c_custkey",
            "c_acctbal",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 50)
        .drop("rn")
        .orderBy("c_mktsegment", "c_custkey")
    )


@query(
    "sample_estimate_vs_exact",
    oracle=f"""
    SELECT CAST(count(*) AS BIGINT)  AS n_sampled,
           {dsum('l_extendedprice')} AS sampled_revenue
    FROM lineitem
    WHERE {_MIX.format(k='l_orderkey * 8 + l_linenumber')} % 100 < 5
    """,
)
def sample_estimate_vs_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sampled aggregate over a ~5% line-level sample (composite key:
    orderkey*8+linenumber so lines of one order draw independently).
    The 20× extrapolation is the caller's: this pins the sample's
    exact content."""
    li = table(spark, sf_dir, "lineitem")
    composite = F.col("l_orderkey") * 8 + F.col("l_linenumber")
    return li.filter(
        ((composite * F.lit(2654435761)) % F.lit(2147483648)) % 100 < 5
    ).agg(
        F.count("*").alias("n_sampled"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,6)"))
        .cast("double")
        .alias("sampled_revenue"),
    )


@query(
    "pipeline_shard_assignment",
    oracle=f"""
    SELECT shard,
           CAST(count(*) AS BIGINT)     AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           min(doc_id)                  AS min_id,
           max(doc_id)                  AS max_id
    FROM (SELECT doc_id, n_chars,
                 {_MIX.format(k="doc_id")} % 16 AS shard
          FROM documents)
    GROUP BY shard
    ORDER BY shard
    """,
)
def pipeline_shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic output sharding: every document lands in one of 16
    shards by multiplicative hash of its id, with a per-shard balance
    audit (docs + bytes). This is the writer-side op for emitting a
    100 TB corpus as N equal shards — the assignment is reproducible
    across reruns/engines (portable arithmetic, not engine hash()),
    so a re-run resumes into identical shard membership.

    Scale: the shard column is row-local (map-only); the audit is one
    map-side-combinable aggregation over 16 groups. The real write is
    ``df.repartition(16, col).write.partitionBy(shard)`` reusing the
    same column — one shuffle, already balanced by construction.
    """
    d = table(spark, sf_dir, "documents")
    return (
        d.select(
            "doc_id",
            "n_chars",
            (_mix_col("doc_id") % 16).alias("shard"),
        )
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
        )
        .orderBy("shard")
    )


_QUOTA = 15  # max documents kept per source domain


@query(
    "pipeline_source_quota",
    oracle=f"""
WITH ranked AS (
  SELECT source, doc_id, n_chars,
         row_number() OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id) AS rnk
  FROM documents)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN rnk <= {_QUOTA} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_kept,
       CAST(sum(CASE WHEN rnk <= {_QUOTA} THEN n_chars ELSE 0 END) AS BIGINT)
         AS kept_chars,
       CAST(min(CASE WHEN rnk <= {_QUOTA} THEN n_chars END) AS BIGINT)
         AS kept_min_chars
FROM ranked
GROUP BY source
ORDER BY source
""",
)
def pipeline_source_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain quota capping — the CommonCrawl-style guard against
    any single domain flooding the corpus: each source keeps at most
    its quota of documents, chosen by quality rank (length proxy here;
    swap the ORDER BY for a model score column in production), with a
    per-source audit of kept counts, kept bytes, and the admission
    cutoff. Complements pipeline_domain_mix (probabilistic rate) with
    the hard cap real crawls apply to head domains.

    Determinism: integer ranks with doc_id tiebreak; integer sums.

    Scale: ONE shuffle keyed by source for the ranking window. NOTE —
    because the audit reports totals over ALL rows (n_docs counts the
    uncapped domain), every row must be ranked and Spark cannot prune
    the sort to the top-quota (no WindowGroupLimit here; the executed
    plan is a full per-source sort — verified). That is the audit's
    cost, not the cap's: the production keep-query (`WHERE rnk <=
    quota` with no full-domain aggregate) DOES get the WindowGroupLimit
    pruned sort — join_lateral_topk demonstrates that plan — and a
    billion-doc head domain is then bounded by each partition's local
    top-quota. At 100 TB run the audit on per-mapper pre-aggregates
    (count + capped sums combine) or accept one ranked pass.
    """
    doc = table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(F.desc("n_chars"), "doc_id")
    ranked = doc.select(
        "source", "doc_id", "n_chars", F.row_number().over(w).alias("rnk")
    )
    kept = F.col("rnk") <= _QUOTA
    return (
        ranked.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(kept, 1).otherwise(0)).alias("n_kept"),
            F.sum(F.when(kept, F.col("n_chars")).otherwise(0)).alias("kept_chars"),
            F.min(F.when(kept, F.col("n_chars"))).alias("kept_min_chars"),
        )
        .orderBy("source")
    )


_Z_BITS = 8  # per-dimension bits (values bucketed mod 256)
_Z_FILES = 16
_Z_PROBE_X = 100  # point probes for the pruning audit
_Z_PROBE_Y = 77


def zorder_terms(x: str = "x", y: str = "y") -> str:
    """The Morton-interleave expression over two bound 8-bit columns —
    bit k of v = floor(v / 2^k) % 2, no engine bit operators needed.
    Module-level so the property test exercises THIS text (a typo here
    must fail the injectivity test, not a test-local copy)."""
    return " + ".join(
        f"(CAST(floor({x} / {1 << k}) AS BIGINT) % 2) * {1 << (2 * k)}"
        f" + (CAST(floor({y} / {1 << k}) AS BIGINT) % 2) * {1 << (2 * k + 1)}"
        for k in range(_Z_BITS)
    )


def _zorder_sql() -> str:
    """Dialect-neutral SQL: Morton-interleave two 8-bit key buckets,
    lay rows into 16 equal-z-range 'files' vs 16 x-range files, and
    audit min/max-stats pruning for a point probe on each dimension
    under both layouts."""
    z_terms = zorder_terms()
    z_span = (1 << (2 * _Z_BITS)) // _Z_FILES
    x_span = (1 << _Z_BITS) // _Z_FILES
    return f"""
WITH base AS (
  SELECT l_partkey % {1 << _Z_BITS} AS x,
         l_suppkey % {1 << _Z_BITS} AS y
  FROM lineitem),
keyed AS (SELECT x, y, {z_terms} AS z FROM base),
files AS (
  SELECT 'zorder' AS layout,
         CAST(floor(z / {z_span}) AS BIGINT) AS file_id, x, y
  FROM keyed
  UNION ALL
  SELECT 'linear' AS layout,
         CAST(floor(x / {x_span}) AS BIGINT) AS file_id, x, y
  FROM keyed),
stats AS (
  SELECT layout, file_id,
         CAST(count(*) AS BIGINT) AS n_rows,
         min(x) AS min_x, max(x) AS max_x,
         min(y) AS min_y, max(y) AS max_y
  FROM files GROUP BY layout, file_id)
SELECT layout,
       CAST(count(*) AS BIGINT) AS n_files,
       CAST(sum(n_rows) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN min_x <= {_Z_PROBE_X} AND {_Z_PROBE_X} <= max_x
                     THEN 1 ELSE 0 END) AS BIGINT) AS files_touched_x_probe,
       CAST(sum(CASE WHEN min_y <= {_Z_PROBE_Y} AND {_Z_PROBE_Y} <= max_y
                     THEN 1 ELSE 0 END) AS BIGINT) AS files_touched_y_probe
FROM stats
GROUP BY layout
ORDER BY layout
"""


@query("pipeline_zorder_audit", _zorder_sql())
def pipeline_zorder_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton-curve) layout audit — the data-skipping story
    behind Delta/Iceberg Z-ORDER, measured instead of asserted: rows
    keyed by two independent 8-bit key buckets are laid into 16
    files either by Morton-interleaved z-ranges or by plain x-ranges,
    and per-file min/max column stats (what parquet footers store)
    answer how many files a point probe on EACH dimension must touch.
    Linear layout prunes perfectly on x and not at all on y; z-order
    prunes on BOTH (~sqrt(files) touched per dimension) — the reason
    multi-dimension-filtered scans cluster by curve, not by sort key.

    Determinism: bit extraction is floor-div/mod integer arithmetic
    (no engine bit operators), counts and min/max are integers —
    zero float columns.

    Scale: the z key is row-local (map-only, like the shard column of
    pipeline_shard_assignment); file stats are one combinable
    aggregation over 32 groups; the audit aggregates 32 rows. The
    production write is repartitionByRange(z).write — same one
    shuffle any layout write pays, the pruning is free forever after.
    """
    register_tables(spark, sf_dir, ("lineitem",))
    return spark.sql(_zorder_sql())
