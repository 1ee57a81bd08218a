"""Layer A parity queries — the reference's own effective query surface.

Reference evidence (SURVEY.md §2 Layer A):
- A1 scan / A11 sink:      SimpleAppClient.scala:54, FIFOStrategy.scala:70
- A2/A4/A5 project+filter:  SimpleAppClient.scala:66-68 (the teenagers query)
- A3/A6 wordcount:          testSharingScan/WordCount/.../WordCount.scala:94-95
- A7 input tagging:         WordCountInputTagging/.../WordCount.scala:117-122

Expressed Spark-first: scans are parquet (pushdown + pruning), the
wordcount is explode+groupBy (partial aggregation map-side, planned by
Catalyst as partial+final HashAggregate — the modern form of
``reduceByKey``'s map-side combine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparksql_server_spark.catalog import table
from sparksql_server_spark.operators.registry import query

N_TAG_JOBS = 3  # reference runs 2/5/10 tagged jobs; 3 keeps the oracle small


@query(
    "a1_scan_region",
    oracle="SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey",
)
def a1_scan_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-table scan + ordered sink (A1 + A11)."""
    return table(spark, sf_dir, "region").select("r_regionkey", "r_name").orderBy("r_regionkey")


@query(
    "a1_scan_kv_text",
    oracle="""
    SELECT CAST(key % 5 AS INT) AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(key) AS BIGINT) AS key_sum,
           max(val) AS max_val
    FROM (SELECT n_nationkey AS key, 'val_' || n_nationkey AS val FROM nation)
    GROUP BY key % 5 ORDER BY bucket
    """,
)
def a1_scan_kv_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style ctrl-A-delimited kv text (A1 parity with the
    reference's kv1.txt fixture — "238\\x01val_238" lines,
    SimpleAppClient/examples/src/main/resources/kv1.txt): rows derived
    from nation round-trip through the text sink and ``read_csv`` with
    the \\x01 delimiter and an explicit ``key INT, value STRING``
    schema, then aggregate. The oracle computes the same result from
    the base table directly, so the comparison proves the sink → scan
    round-trip is content-exact.

    Scale: line-splitting CSV parse is splittable and schema-explicit
    (no inferSchema pre-pass); one map-side-combinable aggregation.
    """
    import glob
    import os

    from sparksql_server_spark.sources.readers import read_csv
    from sparksql_server_spark.sources.sinks import write_text

    out = f"/tmp/sparkgraft_fixtures/{os.path.basename(sf_dir.rstrip('/'))}_kv1"
    # write-once, via atomic rename: the fixture derives only from
    # nation (stable per sf). Writing straight to `out` would race —
    # reader-vs-overwrite on later calls, and writer-vs-writer when two
    # processes both see it missing — so each writer builds a private
    # staging dir and renames it into place; rename is atomic and fails
    # (harmlessly) for every writer but the first.
    if not glob.glob(out + "/_SUCCESS"):
        kv_src = table(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("key"),
            F.concat(F.lit("val_"), F.col("n_nationkey")).alias("value"),
        )
        staging = f"{out}.staging.{os.getpid()}"
        write_text(kv_src, staging, sep="\x01")
        try:
            os.rename(staging, out)
        except OSError:  # another writer won the rename
            import shutil

            shutil.rmtree(staging, ignore_errors=True)
    kv = read_csv(spark, out, schema="key INT, value STRING", sep="\x01")
    return (
        kv.groupBy((F.col("key") % 5).cast("int").alias("bucket"))
        .agg(
            F.count("*").alias("n"),
            F.sum("key").alias("key_sum"),
            F.max("value").alias("max_val"),
        )
        .orderBy("bucket")
    )


@query(
    "a2_filter_project",
    oracle="""
    SELECT c_name FROM customer
    WHERE c_acctbal >= 1300 AND c_acctbal <= 1900
    ORDER BY c_name
    """,
)
def a2_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The teenagers query (SimpleAppClient.scala:68) transposed to customer.

    Catalyst pushes both the range predicate and the single-column
    projection into the parquet scan (check: PushedFilters / ReadSchema).
    """
    c = table(spark, sf_dir, "customer")
    return (
        c.filter((F.col("c_acctbal") >= 1300) & (F.col("c_acctbal") <= 1900))
        .select("c_name")
        .orderBy("c_name")
    )


@query(
    "a3_wordcount",
    oracle="""
    SELECT word, COUNT(*) AS cnt
    FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
    WHERE word <> ''
    GROUP BY word
    ORDER BY cnt DESC, word
    LIMIT 100
    """,
)
def a3_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's canonical job (WordCount.scala:94-95), top-100.

    ``explode(split(..))`` + groupBy → Catalyst plans partial+final
    HashAggregate (map-side combine), the DataFrame form of
    ``reduceByKey``.
    """
    d = table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), "word")
        .limit(100)
    )


@query(
    "a7_tagged_wordcount",
    oracle=f"""
    SELECT job_id, word, COUNT(*) AS cnt
    FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
    CROSS JOIN (SELECT unnest(range({N_TAG_JOBS})) AS job_id)
    WHERE word <> ''
    GROUP BY job_id, word
    ORDER BY job_id, cnt DESC, word
    """,
)
def a7_tagged_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Input-tagging aggregation (WordCountInputTagging WordCount.scala:117-122).

    The reference replicates every token once per job id and aggregates
    on the composite key ``(jobId, word)`` — the manual simulation of
    MRShare job merging. Here: ``explode(sequence(...))`` cross-product
    + a single composite-key aggregation.
    """
    d = table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .select(F.explode(F.sequence(F.lit(0), F.lit(N_TAG_JOBS - 1))).alias("job_id"), "word")
        # cast to long: DuckDB's range() yields BIGINT and the driver
        # compares schemas (generators can't be wrapped in a cast directly)
        .withColumn("job_id", F.col("job_id").cast("long"))
        .groupBy("job_id", "word")
        .agg(F.count("*").alias("cnt"))
        .orderBy("job_id", F.desc("cnt"), "word")
    )
