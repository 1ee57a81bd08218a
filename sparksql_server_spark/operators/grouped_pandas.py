"""Custom grouped operator via applyInPandas — per-group OLS
regression, the batch showcase of the Arrow grouped-UDF path.

The corpus keeps hot paths JVM-side on principle; this module is the
deliberate exception that proves the plumbing for operators Spark
genuinely can't express (per-group model fits, iterative solvers):
``groupBy().applyInPandas`` with an Arrow batch per group.

Cross-engine determinism: the slope/intercept are derived from moment
sums. Both input columns carry ≤2 decimals, so the Python side
rescales to int64 (exact), sums exactly, and converts each moment to
double by one correctly-rounded division — landing on the *same*
doubles as the oracle's DECIMAL sums cast to DOUBLE (both are
nearest-double of the same rational). The final slope arithmetic is
then the same IEEE expression on both sides.

Scale: one shuffle on the group key; per-group state is five moment
sums regardless of group size (the pandas fit is streaming-friendly);
skewed groups split fine under AQE since the UDF only needs
column-chunk sums.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

from sparksql_server_spark.catalog import table
from sparksql_server_spark.operators.registry import query

_OUT_SCHEMA = (
    "l_returnflag string, n bigint, slope double, intercept double, mean_x double"
)


def _fit_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """OLS extendedprice ~ quantity from exact integer moments."""
    # ≤2-decimal doubles -> exact int64 (values are exactly representable,
    # so round() recovers the true scaled integer)
    x = [round(v * 100) for v in pdf["l_quantity"]]
    y = [round(v * 100) for v in pdf["l_extendedprice"]]
    n = len(x)
    sx_i, sy_i = sum(x), sum(y)
    sxy_i = sum(a * b for a, b in zip(x, y))
    sxx_i = sum(a * a for a in x)
    # one correctly-rounded division per moment == DECIMAL->DOUBLE cast
    sx, sy = sx_i / 100.0, sy_i / 100.0
    sxy, sxx = sxy_i / 10000.0, sxx_i / 10000.0
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    return pd.DataFrame(
        {
            "l_returnflag": [pdf["l_returnflag"].iloc[0]],
            "n": [n],
            "slope": [slope],
            "intercept": [intercept],
            "mean_x": [sx / n],
        }
    )


@query(
    "grouped_ols_regression",
    oracle="""
    SELECT l_returnflag,
           CAST(n AS BIGINT) AS n,
           (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
           (sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n
             AS intercept,
           sx / n AS mean_x
    FROM (
      SELECT l_returnflag, count(*) AS n,
             CAST(sum(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE)        AS sx,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE)   AS sy,
             CAST(sum(CAST(l_quantity * l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS sxy,
             CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(28,4))) AS DOUBLE)      AS sxx
      FROM lineitem GROUP BY l_returnflag)
    ORDER BY l_returnflag
    """,
)
def grouped_ols_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-return-flag OLS fit of extendedprice against quantity,
    executed as a grouped pandas UDF (Arrow batch per group)."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity", "l_extendedprice"
    )
    return (
        li.groupBy("l_returnflag")
        .applyInPandas(_fit_group, schema=_OUT_SCHEMA)
        .orderBy("l_returnflag")
    )
