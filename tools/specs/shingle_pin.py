"""A/B: dedup_ngram_jaccard / dedup_shingle_containment — the shared
kept-shingle relation as r9 parquet spill (arm a, current) vs an eager
localCheckpoint pin taken AFTER the DF-cutoff window (arm b).

Two effects in arm b: (1) pin skips the parquet encode+listing+decode
round trip (the lsh_eval r7 measurement); (2) localCheckpoint's
LogicalRDD preserves the window's hashpartitioning(shingle), which the
downstream pair self-join on shingle can reuse — the join's two
exchanges should disappear. SPEC_TARGET: jacc | cont. SPEC_SWAP=1 swaps.
"""

import os

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sparksql_server_spark.catalog import register_tables
from sparksql_server_spark.operators import QUERIES
from sparksql_server_spark.operators.dedup import (
    _SHINGLE_MAX_DF,
    _doc_shingle_sets,
)
from sparksql_server_spark.operators.scratch import pin_view

TARGET = os.environ.get("SPEC_TARGET", "jacc")
NAME = f"shingle_pin_{TARGET}"

_QNAME = {
    "jacc": "dedup_ngram_jaccard",
    "cont": "dedup_shingle_containment",
}[TARGET]


def build_a(spark, sf_dir):  # current: parquet spill
    return QUERIES[_QNAME](spark, sf_dir)


def _kept_pinned(spark):
    docs = spark.table("documents").select("doc_id", "text")
    id_type = docs.schema["doc_id"].dataType.simpleString()
    sh = docs.mapInPandas(_doc_shingle_sets, f"doc_id {id_type}, shingle string")
    kept = (
        sh.withColumn("c", F.count("*").over(Window.partitionBy("shingle")))
        .filter(F.col("c") <= _SHINGLE_MAX_DF)
        .select("doc_id", "shingle")
    )
    return pin_view(spark, kept, f"kept_pin_{TARGET}")


def build_b(spark, sf_dir):  # pinned, shingle-partitioned
    # same spread posture as the current operators (jacc spreads,
    # cont does not — dedup.py r12 annotations)
    spread = ("documents",) if TARGET == "jacc" else ()
    register_tables(spark, sf_dir, ("documents",), spread=spread)
    kept = _kept_pinned(spark)
    counts = kept.groupBy("doc_id").agg(F.count("*").alias("n"))
    a, b = kept.alias("a"), kept.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("d1" if TARGET == "jacc" else "lo"),
                 F.col("b.doc_id").alias("d2" if TARGET == "jacc" else "hi"))
        .agg(F.count("*").alias("shared"))
        .filter(F.col("shared") >= 2)
    )
    if TARGET == "jacc":
        return (
            inter.join(counts.alias("ca"), F.col("d1") == F.col("ca.doc_id"))
            .join(counts.alias("cb"), F.col("d2") == F.col("cb.doc_id"))
            .select(
                "d1",
                "d2",
                F.round(
                    F.col("shared") / (F.col("ca.n") + F.col("cb.n") - F.col("shared")),
                    6,
                ).alias("jaccard"),
            )
            .orderBy(F.desc("jaccard"), "d1", "d2")
            .limit(500)
        )
    ca = counts.select(F.col("doc_id").alias("lo"), F.col("n").alias("n_lo"))
    cb = counts.select(F.col("doc_id").alias("hi"), F.col("n").alias("n_hi"))
    directed = (
        inter.join(F.broadcast(ca), "lo")
        .join(F.broadcast(cb), "hi")
        .select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("lo").alias("d1"),
                        F.col("hi").alias("d2"),
                        F.col("shared").alias("shared"),
                        F.col("n_lo").alias("n_d1"),
                    ),
                    F.struct(
                        F.col("hi").alias("d1"),
                        F.col("lo").alias("d2"),
                        F.col("shared").alias("shared"),
                        F.col("n_hi").alias("n_d1"),
                    ),
                )
            ).alias("r")
        )
        .select("r.*")
    )
    return (
        directed.filter(4 * F.col("shared") >= F.col("n_d1"))
        .select(
            "d1",
            "d2",
            F.col("shared").cast("bigint").alias("shared"),
            F.col("n_d1").cast("bigint").alias("n_d1"),
            F.round(F.col("shared") / F.col("n_d1"), 6).alias("containment"),
        )
        .orderBy(F.desc("containment"), "d1", "d2")
        .limit(500)
    )


if os.environ.get("SPEC_SWAP") == "1":
    build_a, build_b = build_b, build_a
