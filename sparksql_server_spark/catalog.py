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



def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
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
    if name == "events":
        df = spark.read.parquet(path)
        return _normalize_event_ts(df)
    return spark.read.parquet(path)


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
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Register every table as a temp view so ``spark.sql`` can name it.

    Idempotent and cheap (view creation is metadata-only; no IO until
    an action runs).
    """
    out: dict[str, DataFrame] = {}
    for name in names:
        df = table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
