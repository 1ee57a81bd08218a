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

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table as a DataFrame (parquet scan, pushdown-capable).

    events.ts is written as parquet TIMESTAMP(NANOS), which Spark 4
    refuses by default — read it as int64 nanos (legacy conf) and
    convert to a microsecond TimestampType column.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(path)


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
