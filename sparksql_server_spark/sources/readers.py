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
    orc     -> spark.read.orc             (self-describing)
    xml     -> spark.read.format('xml')   (native since Spark 4.0)
    avro    -> spark.read.format('avro')  (gated: spark-avro not bundled)
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


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def read_xml(
    spark: SparkSession,
    path: str,
    row_tag: str,
    schema: T.StructType | str | None = None,
) -> DataFrame:
    """XML rows (native datasource since Spark 4.0 — no external jar)."""
    reader = spark.read.format("xml").option("rowTag", row_tag)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Avro (the reference bundles user.avsc fixtures — SURVEY.md §5).

    The spark-avro datasource module is not bundled with PyPI pyspark;
    raise a clear error if absent rather than a Java stack trace.
    """
    try:
        return spark.read.format("avro").load(path)
    except Exception as exc:  # pragma: no cover - env-dependent
        # match ONLY the missing-datasource error (error class, or the
        # lookup message that names avro as the missing SOURCE) — a
        # substring like 'AVRO' matches the '.avro' path inside any
        # PATH_NOT_FOUND / corruption message and would mislabel a
        # user error as a classpath problem
        msg = str(exc)
        if (
            "DATA_SOURCE_NOT_FOUND" in msg
            or "Failed to find the data source: avro" in msg
            or "Failed to find data source: avro" in msg
        ):
            raise NotImplementedError(
                "avro datasource not on the classpath; add the "
                "org.apache.spark:spark-avro package to use it"
            ) from exc
        raise


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
    "orc": read_orc,
    "xml": read_xml,
    "avro": read_avro,
    "binary": read_binary,
}


def read_any(spark: SparkSession, fmt: str, path: str, **kwargs) -> DataFrame:
    try:
        reader = _READERS[fmt]
    except KeyError:
        raise ValueError(f"unknown format {fmt!r}; known: {sorted(_READERS)}") from None
    return reader(spark, path, **kwargs)
