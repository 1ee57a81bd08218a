"""A/B: events_arrival_profile — two-consumer oracle-shape tail (arr
window re-executed by CTE inlining for late + gaps) vs one-pass
grouped tail."""

from sparksql_server_spark.catalog import register_tables
from sparksql_server_spark.operators.events_behavior import (
    _SPARK_SEC,
    _arrival_spark_onepass_sql,
    _arrival_sql,
)

NAME = "arrival_onepass"


def build_a(spark, sf_dir):
    register_tables(spark, sf_dir, ("events",))
    return spark.sql(_arrival_sql(_SPARK_SEC))


def build_b(spark, sf_dir):
    register_tables(spark, sf_dir, ("events",))
    return spark.sql(_arrival_spark_onepass_sql(_SPARK_SEC))
