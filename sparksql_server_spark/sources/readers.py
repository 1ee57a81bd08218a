"""Readers — the reference's client-visible input surface, Spark-first.

The reference handles line-oriented text (``sc.textFile`` → A1) and,
via the bundled Spark 1.3.1 examples its clients could run, CSV-ish
text (people.txt: "name, age"), JSON (people.json), Parquet
(users.parquet) and Hive-style kv text (kv1.txt) — SURVEY.md §1.2.
Modern mapping, schema-explicit (no inferSchema in production paths):

    text    -> spark.read.text            (one 'value' column)
    csv     -> spark.read.csv(schema=...)
    json    -> spark.read.json(schema=...)
    parquet -> spark.read.parquet         (self-describing)
    binary  -> spark.read.format('binaryFile')  (multimodal payloads)

``read_any`` dispatches on format name — the sources half of the
gateway protocol's ``input`` field (DAGListener.scala:104).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_text(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.text(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    header: bool = False,
    sep: str = ",",
) -> DataFrame:
    reader = spark.read.option("header", header).option("sep", sep)
    reader = reader.option("ignoreLeadingWhiteSpace", True).option(
        "ignoreTrailingWhiteSpace", True
    )
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)  # convenience only
    return reader.csv(path)


def read_json(
    spark: SparkSession, path: str, schema: T.StructType | str | None = None
) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_binary(spark: SparkSession, path: str, glob: str | None = None) -> DataFrame:
    """Opaque file payloads: (path, modificationTime, length, content) —
    the ingest point for multimodal columns (SURVEY.md §7 north star)."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


_READERS = {
    "text": read_text,
    "csv": read_csv,
    "json": read_json,
    "parquet": read_parquet,
    "binary": read_binary,
}


def read_any(spark: SparkSession, fmt: str, path: str, **kwargs) -> DataFrame:
    try:
        reader = _READERS[fmt]
    except KeyError:
        raise ValueError(f"unknown format {fmt!r}; known: {sorted(_READERS)}") from None
    return reader(spark, path, **kwargs)
