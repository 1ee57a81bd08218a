"""A/B: CacheScope.finish (parquet spill, arm a) vs finish_pin (eager
localCheckpoint, arm b) for any spill-finishing operator. Arm b
monkeypatches finish -> finish_pin around the operator call, so both
arms run the IDENTICAL operator body. SPEC_TARGET = query name.
SPEC_SWAP=1 swaps arms.
"""

import os

from sparksql_server_spark.operators import QUERIES
import sparksql_server_spark.operators.scratch as S

TARGET = os.environ.get("SPEC_TARGET", "agg_hll_running_distinct")
NAME = f"finish_pin_{TARGET}"


def build_a(spark, sf_dir):  # current: parquet spill
    return QUERIES[TARGET](spark, sf_dir)


def build_b(spark, sf_dir):  # finish -> finish_pin
    orig = S.CacheScope.finish
    S.CacheScope.finish = lambda self, result, name: S.CacheScope.finish_pin(
        self, result, f"{name}_pin"
    )
    try:
        return QUERIES[TARGET](spark, sf_dir)
    finally:
        S.CacheScope.finish = orig


if os.environ.get("SPEC_SWAP") == "1":
    build_a, build_b = build_b, build_a
