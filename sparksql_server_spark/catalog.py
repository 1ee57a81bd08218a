"""Table registry over the driver's parquet testdata.

The reference re-registers the client's temp table server-side so the
relation is nameable in SQL (``DAGListener.scala:155-162``:
``createDataFrame(dfrdd, beanClass); df.registerTempTable(...)``).
Here the catalog is first-class: every known table is a parquet
directory registered as a temp view, schema carried by parquet
metadata (vs. the reference's Java-bean reflection).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

# --- small-input spread (round 12, guide §2.5 "input skew: one huge
# unsplittable file") -------------------------------------------------
# Parquet scans parallelize at ROW-GROUP granularity. The driver's
# testdata writes each table as ONE file with ONE row group, so every
# scan stage - and any per-row work Catalyst fuses into it (decimal
# moment sums, shingle explode+hash, JSON parsing) - runs on ONE core
# no matter how many byte-range splits the scheduler makes (measured:
# the 5-moment decimal aggregation over lineitem takes 1.92 s at 3
# splits, 1.67 s at coalesce(1) - i.e. splits buy nothing - and 0.79 s
# after a round-robin repartition INCLUDING the extra shuffle).
# table()/register_tables() therefore OPTIONALLY spread a small input
# across the session's cores right after the scan. Opt-in per
# operator, because the blanket version was measured NET-NEGATIVE
# (full-corpus A/B: the extra AQE shuffle stage costs ~0.2-1 s on the
# ~140 scan-cheap star-join queries, far outweighing their scan win);
# only queries whose first post-scan stage does heavy per-row work
# (exact-decimal moments, shingle explode + rolling char-hash, JSON
# parse, LSH hashing) won the interleaved within-session A/B, and each
# opt-in site cites its measured delta. Scale-adaptive by
# construction: inputs bigger than the threshold (default one
# maxPartitionBytes split, i.e. anything that gives the scheduler real
# split parallelism) are left untouched even when requested, so at
# cluster scale - where tables are thousands of row groups - this is
# a no-op and no extra shuffle is ever paid. Filters and column
# pruning still reach the scan (Catalyst pushes deterministic
# predicates and projections through Repartition; plan-gated by
# tests/test_plans.py).
def _spread_max_bytes() -> int:
    """Read per call so tests/A-B harnesses can toggle without a new
    interpreter; the getenv cost is nanoseconds next to a py4j call."""
    return int(
        os.environ.get("SPARK_GRAFT_SPREAD_SMALL_BYTES", str(128 * 1024 * 1024))
    )


_dir_bytes_cache: dict[str, int] = {}


def _dir_bytes(path: str) -> int:
    """Total bytes under a parquet file/directory (memoized — the
    testdata is immutable for a session's lifetime)."""
    got = _dir_bytes_cache.get(path)
    if got is None:
        total = 0
        if os.path.isdir(path):
            for root, _dirs, files in os.walk(path):
                for f in files:
                    try:
                        total += os.path.getsize(os.path.join(root, f))
                    except OSError:
                        pass
        else:
            try:
                total = os.path.getsize(path)
            except OSError:
                pass
        _dir_bytes_cache[path] = got = total
    return got


def _spread_small(spark: SparkSession, df: DataFrame, path: str) -> DataFrame:
    """Round-robin repartition a single-row-group-sized input to the
    session's default parallelism; identity for anything bigger (or
    when disabled via SPARK_GRAFT_SPREAD_SMALL_BYTES=0)."""
    size = _dir_bytes(path)
    if not (0 < size <= _spread_max_bytes()):
        return df
    n = spark.sparkContext.defaultParallelism
    if n <= 1:
        return df
    return df.repartition(n)

# The driver's TPC-H-ish star schema + events/documents/embeddings
# (TESTDATA.md). Order matters only for readability.
TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)



# --- per-session relation memo (round 12, guide §5/§6: driver-side
# overhead) -----------------------------------------------------------
# ``spark.read.parquet`` costs ~100-125 ms per call on this runtime
# (py4j round trips + InMemoryFileIndex + footer schema read), and
# every operator re-reads its tables on EVERY invocation — ~0.2-0.3 s
# of pure driver work per query, ~30-50 s across the 204-query corpus,
# paid in steady state too. DataFrames are immutable plans and the
# testdata directory is immutable for a session's lifetime, so the
# relation is built once per (session, dir, table, spread) and reused;
# the temp-view registration still happens per call (two operators may
# register the same name with different spread settings). This is
# plan/metadata memoization only — no query RESULT is ever cached; the
# relation re-scans parquet on every action exactly as before.
_relation_memo: "WeakKeyDictionary[SparkSession, dict]" = None  # type: ignore[assignment]


def _memo_for(spark: SparkSession) -> dict:
    global _relation_memo
    if _relation_memo is None:
        from weakref import WeakKeyDictionary

        _relation_memo = WeakKeyDictionary()
    got = _relation_memo.get(spark)
    if got is None:
        got = _relation_memo[spark] = {}
    return got


def table(
    spark: SparkSession, sf_dir: str, name: str, spread: bool = False
) -> DataFrame:
    """Load one table as a DataFrame (parquet scan, pushdown-capable).

    events.ts is written as parquet TIMESTAMP(NANOS).  How Spark
    surfaces that column depends on the runtime, so branch on the
    dtype the reader actually produced rather than trusting any
    version-specific conf:

    - Spark 4.1+ reads NANOS natively as TIMESTAMP_NTZ (micros
      truncation applied by the reader) — rebuilt field-by-field into
      an epoch-micros TimestampType, independent of the session
      timezone (a plain NTZ→timestamp cast is session-tz wall-clock
      preserving, which shifts or duplicates instants across DST
      gaps/overlaps on non-UTC hosts).
    - Older runtimes honoring ``spark.sql.legacy.parquet.nanosAsLong``
      surface int64 nanos — integer-divide to micros and convert.

    Either path yields the same microsecond-truncated TimestampType
    column, so every downstream query is runtime-independent.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    memo = _memo_for(spark)
    key = (path, spread, _spread_max_bytes() if spread else 0)
    df = memo.get(key)
    if df is None:
        df = spark.read.parquet(path)
        if name == "events":
            df = _normalize_event_ts(df)
        if spread:
            df = _spread_small(spark, df, path)
        memo[key] = df
    return df


def _normalize_event_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Coerce the events timestamp column to microsecond TimestampType
    regardless of how the runtime's parquet reader surfaced NANOS."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    dtype = df.schema[col].dataType
    if isinstance(dtype, T.LongType):
        return df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    if isinstance(dtype, T.TimestampNTZType):
        return df.withColumn(col, F.expr(ntz_to_utc_micros_sql(col)))
    return df  # already TimestampType


def ntz_to_utc_micros_sql(col: str) -> str:
    """SQL expression converting a TIMESTAMP_NTZ column (whose wall
    clock IS the UTC instant) to microsecond TimestampType,
    independent of the session timezone — shared by the DataFrame
    normalizer above and the persistent-view DDL in server/thrift.py.

    Epoch micros are rebuilt from date/time FIELDS: every extraction
    below is timezone-free on NTZ, so the result is identical on any
    host timezone. (A bare cast('timestamp') is wall-clock preserving
    in the SESSION zone: ambiguous in DST overlaps, shifted in DST
    gaps; timestampdiff/to_utc_timestamp route NTZ through the session
    zone too — both measurably shift in-gap instants on a non-UTC
    host.)
    """
    micros = (
        f"bigint(datediff(cast(`{col}` as date), date'1970-01-01'))"
        f" * 86400000000"
        f" + bigint(hour(`{col}`)) * 3600000000"
        f" + bigint(minute(`{col}`)) * 60000000"
        f" + bigint(floor(extract(SECOND from `{col}`) * 1000000))"
    )
    return f"timestamp_micros({micros})"


def register_tables(
    spark: SparkSession,
    sf_dir: str,
    names: tuple[str, ...] = TABLES,
    spread: tuple[str, ...] = (),
) -> dict[str, DataFrame]:
    """Register every table as a temp view so ``spark.sql`` can name it.

    Idempotent and cheap (view creation is metadata-only; no IO until
    an action runs). Tables listed in ``spread`` get the small-input
    spread (see ``_spread_small``); each query re-registers the views
    it needs, so one operator's spread never leaks into the next.
    """
    out: dict[str, DataFrame] = {}
    for name in names:
        df = table(spark, sf_dir, name, spread=name in spread)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
