"""A/B: the five VERDICT-r12 pin-gate targets — pinned (current, arm a)
vs inline oracle-shape (arm b) — run one target at a time via
SPEC_TARGET env: mi | chi2 | qsk | surprisal | trunc | quant.

VERDICT r12 #1: the driver record says these tiny-input audits got
record-WORSE first-exec after the r12 pins (stats_mutual_info worse in
both regimes), while the builder's interleaved A/Bs said the opposite;
box noise confounded both. This spec re-measures each pair interleaved
in ONE JVM on the current box to decide which arm sf0.1 keeps.
"""

import os

from sparksql_server_spark.catalog import register_tables
from sparksql_server_spark.operators.ml_features import _chi2_sql, _mi_sql, _OBS_BODY
from sparksql_server_spark.operators.quality_filters import _surprisal_sql
from sparksql_server_spark.operators.similarity import (
    _quant_recall_sql,
    _trunc_recall_sql,
)
from sparksql_server_spark.operators.stats import (
    _QSK_BOUNDS_BODY,
    _qsketch_sql,
)
from sparksql_server_spark.operators.scratch import pin_view

TARGET = os.environ.get("SPEC_TARGET", "mi")
NAME = f"pin_gate_{TARGET}"

# ab_inline records each arm's "first" only once, and arm a's first is
# the session's very first real query — it absorbs one-time session
# costs (first shuffle, first checkpoint, first broadcast machinery)
# that arm b then gets for free. SPEC_SWAP=1 swaps the arms so each
# form's first-exec can be read from SECOND position across two runs
# (the position comparable to bench.py's warm-session regime).


def build_a(spark, sf_dir):  # current (pinned / fused) form
    if TARGET == "mi":
        register_tables(spark, sf_dir, ("documents",))
        pin_view(spark, spark.sql(_OBS_BODY), "mi_obs")
        return spark.sql(_mi_sql(obs_from="mi_obs"))
    if TARGET == "chi2":
        register_tables(spark, sf_dir, ("documents",))
        pin_view(spark, spark.sql(_OBS_BODY), "chi2_obs")
        return spark.sql(_chi2_sql(obs_from="chi2_obs"))
    if TARGET == "qsk":
        register_tables(spark, sf_dir, ("events",))
        pin_view(spark, spark.sql(_QSK_BOUNDS_BODY), "qsk_bounds")
        return spark.sql(_qsketch_sql("spark", bounds_from="qsk_bounds"))
    if TARGET == "surprisal":
        from pyspark.sql import functions as F

        from sparksql_server_spark.functions.portable import spark_words

        register_tables(spark, sf_dir, ("documents",))
        docs = spark.table("documents")
        w = docs.select("doc_id", F.expr(spark_words("text")).alias("w"))
        terms = w.select("doc_id", F.explode("w").alias("term"))
        pin_view(
            spark,
            terms.groupBy("doc_id", "term").agg(
                F.count("*").cast("bigint").alias("n")
            ),
            "surprisal_tf_mat",
        )
        return spark.sql(_surprisal_sql("spark", tf_from="surprisal_tf_mat"))
    if TARGET == "trunc":
        register_tables(spark, sf_dir, ("embeddings",))
        return spark.sql(_trunc_recall_sql("spark", fused=True))
    if TARGET == "quant":
        register_tables(spark, sf_dir, ("embeddings",))
        return spark.sql(_quant_recall_sql("spark", fused=True))
    raise KeyError(TARGET)


def build_b(spark, sf_dir):  # inline oracle-shape form
    if TARGET == "mi":
        register_tables(spark, sf_dir, ("documents",))
        return spark.sql(_mi_sql())
    if TARGET == "chi2":
        register_tables(spark, sf_dir, ("documents",))
        return spark.sql(_chi2_sql())
    if TARGET == "qsk":
        register_tables(spark, sf_dir, ("events",))
        return spark.sql(_qsketch_sql("spark"))
    if TARGET == "surprisal":
        register_tables(spark, sf_dir, ("documents",))
        return spark.sql(_surprisal_sql("spark"))
    if TARGET == "trunc":
        register_tables(spark, sf_dir, ("embeddings",))
        return spark.sql(_trunc_recall_sql("spark", fused=False))
    if TARGET == "quant":
        register_tables(spark, sf_dir, ("embeddings",))
        return spark.sql(_quant_recall_sql("spark", fused=False))
    raise KeyError(TARGET)


if os.environ.get("SPEC_SWAP") == "1":
    build_a, build_b = build_b, build_a
