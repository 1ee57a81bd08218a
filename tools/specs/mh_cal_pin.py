"""A/B: dedup_minhash_calibration — inline sh CTE (4 consumers, re-run
per consumer by CTE inlining) vs pin_view'd canonical sh relation."""

from sparksql_server_spark.catalog import register_tables
from sparksql_server_spark.operators.dedup import (
    _mh_calibration_sql,
    _sh_canonical_sql,
)
from sparksql_server_spark.operators.scratch import pin_view

NAME = "mh_cal_pin"


def build_a(spark, sf_dir):
    register_tables(spark, sf_dir, ("documents",), spread=("documents",))
    return spark.sql(_mh_calibration_sql("spark"))


def build_b(spark, sf_dir):
    register_tables(spark, sf_dir, ("documents",), spread=("documents",))
    w_body, ex = _sh_canonical_sql("spark")
    pin_view(spark, spark.sql(f"WITH w AS ({w_body}) {ex}"), "mh_cal_sh_mat")
    return spark.sql(_mh_calibration_sql("spark", sh_from="mh_cal_sh_mat"))
