"""Scale strategies — bucketed co-located joins and skew salting.

Two shuffle-elimination tools the 100 TB deployment leans on, made
concrete and testable:

- **Bucketing**: write both join sides bucketed (and sorted) on the
  join key; Spark's scan then reports the bucket spec as its output
  partitioning and the join plans with NO Exchange on either side —
  the shuffle happened once at write time and is amortized over every
  subsequent join. This is the modern, durable form of the
  reference's scan-sharing idea: share the *partitioning*, not just
  the bytes (reference shares only the scan via `.cache()` injection,
  `SRV/rewriter/rules/scan/Caching.scala:85-108`).

- **Salting**: for a skewed build key that AQE's skew-join splitting
  can't fix (e.g. one key = 30% of rows joined against a
  non-broadcastable side), shard each hot left row into one of
  ``n_salts`` sub-keys derived from a *deterministic* row attribute,
  and replicate right rows to every salt. Same result set, shuffle
  partitions bounded by |hot key| / n_salts.

Both are result-transparent: tests assert equality against the
straight join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    name: str,
    keys: list[str],
    n_buckets: int = 32,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (+ per-bucket sorted) managed table.

    On a cluster this is the one-time shuffle that every later
    key-aligned join/aggregation reuses for free.
    """
    writer = df.write.mode("overwrite").bucketBy(n_buckets, *keys)
    if sort:
        writer = writer.sortBy(*keys)
    writer.saveAsTable(name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two tables bucketed on the same keys/bucket-count: planned
    as a sort-merge join with ZERO Exchange (verified in tests).
    autoBroadcast is irrelevant here — even if one side is small, the
    co-located plan wins at scale because neither side moves.
    """
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    n_salts: int = 8,
    salt_source: str | None = None,
) -> DataFrame:
    """Inner equi-join on ``key`` with left-side salting and right-side
    replication — for skewed keys joining a non-broadcastable right.

    The salt is ``pmod(xxhash64(salt_source), n_salts)`` over a
    deterministic left attribute (default: the key row's full tuple via
    all columns), NOT rand(): deterministic retries/speculative tasks
    see the same salt. Output columns = left ∪ right minus duplicates,
    exactly like ``left.join(right, key)``.
    """
    src = (
        [F.col(salt_source)]
        if salt_source
        else [F.col(c) for c in left.columns]
    )
    l_salted = left.withColumn("__salt", F.pmod(F.xxhash64(*src), F.lit(n_salts)))
    r_salted = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("__salt", F.col("__salt").cast("long"))
    joined = l_salted.join(r_salted, on=[key, "__salt"], how="inner")
    return joined.drop("__salt")
