"""Sinks — the reference's output surface, Spark-first.

- ``write_text``   ≙ A11 ``saveAsTextFile`` (FIFOStrategy.scala:70,92,102;
  WordCount.scala:98,113): rows serialized to delimited lines.
- ``write_demux``  ≙ A12 multi-output demultiplex sink
  (WordCountInputTagging/.../WordCount.scala:45-95: a custom
  MultipleTextOutputFormat routing records by tag to ``...-jobId``
  files). Spark-native: ``partitionBy(tag)`` — one job, N output
  directories, routing handled by the file committer, scaling to
  arbitrary tag cardinality without a custom OutputFormat.
- ``write_parquet``: the engine's default columnar sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).parquet(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSON-lines sink — one JSON object per row, splittable on read."""
    df.write.mode(mode).json(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)


def write_text(df: DataFrame, path: str, sep: str = "\t", mode: str = "overwrite") -> None:
    """Serialize every row to one delimited line (A11).

    Columns are cast to string and concat'd JVM-side; null becomes the
    empty string (same as Hadoop TextOutputFormat's behavior for the
    reference's (word, count) pairs).
    """
    line = F.concat_ws(sep, *[F.coalesce(F.col(c).cast("string"), F.lit("")) for c in df.columns])
    df.select(line.alias("value")).write.mode(mode).text(path)


def write_demux(
    df: DataFrame, path: str, tag_col: str, fmt: str = "parquet", mode: str = "overwrite"
) -> None:
    """One job, N outputs routed by ``tag_col`` (A12).

    Output layout: ``{path}/{tag_col}={value}/part-*`` — the modern
    equivalent of the reference's ``output-jobId`` file naming.
    """
    # format(fmt).save, NOT getattr(writer, fmt): dispatching on writer
    # attributes silently returns a builder (writes nothing) for any
    # non-format attribute name ('mode', 'option', ...), while an
    # unknown real format must fail loudly
    df.write.mode(mode).partitionBy(tag_col).format(fmt).save(path)


def compact_parquet(
    spark, src: str, dst: str, target_files: int = 8
) -> tuple[int, int]:
    """Small-files compaction: rewrite a parquet directory into
    ``target_files`` evenly-sized files. Returns (files_before,
    files_after).

    The operational half of a 100 TB ingest: streaming and per-batch
    writers leave thousands of KB-sized files whose open/footer
    overhead dominates later scans; periodic compaction restores scan
    efficiency. ``repartition(n)`` round-robins rows for even output
    sizes (use ``repartition(n, col)`` instead when downstream joins
    want co-location, or sortWithinPartitions for min/max pruning).
    """
    import glob
    import os

    if os.path.realpath(src) == os.path.realpath(dst):
        # overwrite-while-reading would delete the source mid-scan;
        # compaction must land in a fresh directory (rename after)
        raise ValueError(f"compact_parquet: src and dst are the same path: {src!r}")

    def _count(d: str) -> int:
        return len(glob.glob(os.path.join(d, "part-*")))

    df = spark.read.parquet(src)
    df.repartition(target_files).write.mode("overwrite").parquet(dst)
    return _count(src), _count(dst)
