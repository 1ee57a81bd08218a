"""A/B: reconcile the r12 committed first_exec_regressions (VERDICT
r12 #2) — current form (arm a) vs the pre-r12 form (arm b), interleaved
in one JVM. SPEC_TARGET env: ivf_refine | q21 | regr_linear |
substring_runs | boilerplate (the last three toggle the r12 spread
opt-in via SPARK_GRAFT_SPREAD_SMALL_BYTES, which keys the relation
memo, so both arms coexist in one session).
"""

import os

from sparksql_server_spark.catalog import register_tables
from sparksql_server_spark.operators import QUERIES

TARGET = os.environ.get("SPEC_TARGET", "q21")
NAME = f"reconcile_{TARGET}"

_SPREAD_QUERIES = {
    "regr_linear": "stats_regr_linear",
    "substring_runs": "dedup_exact_substring_runs",
    "boilerplate": "quality_boilerplate_density",
}


def build_a(spark, sf_dir):  # current (r12) form
    if TARGET == "ivf_refine":
        return QUERIES["sim_ivf_kmeans_refine"](spark, sf_dir)
    if TARGET == "q21":
        return QUERIES["tpch_q21_suppliers_kept_waiting"](spark, sf_dir)
    if TARGET in _SPREAD_QUERIES:
        os.environ.pop("SPARK_GRAFT_SPREAD_SMALL_BYTES", None)  # default gate
        return QUERIES[_SPREAD_QUERIES[TARGET]](spark, sf_dir)
    raise KeyError(TARGET)


def build_b(spark, sf_dir):  # pre-r12 form
    if TARGET == "ivf_refine":
        from sparksql_server_spark.operators.similarity import (
            _REFINE_CELL_SPARK,
            _REFINE_SEED_SPARK,
            _ivf_refine_sql,
            spark_dot,
            spark_norm,
        )

        register_tables(spark, sf_dir, ("embeddings",))
        return spark.sql(
            _ivf_refine_sql(
                spark_dot, spark_norm, _REFINE_CELL_SPARK, _REFINE_SEED_SPARK
            )
        )
    if TARGET == "q21":
        from sparksql_server_spark.operators.tpch import _Q21_SQL

        register_tables(
            spark, sf_dir, ("supplier", "lineitem", "orders", "nation", "region")
        )
        return spark.sql(_Q21_SQL)
    if TARGET in _SPREAD_QUERIES:
        os.environ["SPARK_GRAFT_SPREAD_SMALL_BYTES"] = "0"  # spread off
        try:
            return QUERIES[_SPREAD_QUERIES[TARGET]](spark, sf_dir)
        finally:
            os.environ.pop("SPARK_GRAFT_SPREAD_SMALL_BYTES", None)
    raise KeyError(TARGET)


if os.environ.get("SPEC_SWAP") == "1":
    build_a, build_b = build_b, build_a
