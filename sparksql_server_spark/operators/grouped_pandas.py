"""Custom grouped operator via the Arrow pandas-UDF path — per-group
OLS regression as MAP-SIDE PARTIAL MOMENTS plus a tiny SQL combine.

The corpus keeps hot paths JVM-side on principle; this module is the
deliberate exception that proves the plumbing for operators Spark
genuinely can't express natively (per-group model fits). It is shaped
the way such an operator must be shaped at 100 TB:

* ``mapInPandas`` folds each Arrow batch into one partial-moment row
  per (batch, group) — (n, Σx, Σy, Σxy, Σxx) as exact scaled int64 —
  so NO worker ever materializes a group. The r5/r6 form used
  ``groupBy(l_returnflag).applyInPandas``, which shuffles ALL of
  lineitem into one task per group (3 groups ⇒ 3 tasks, each holding
  the entire group as a single pandas DataFrame; AQE does NOT split a
  single group across applyInPandas tasks). At 100 TB that is
  terabytes into one Python worker. Partial moments make the Python
  stage embarrassingly parallel and the shuffle carries only
  O(batches x |groups|) tiny rows.
* the final combine is plain Spark SQL aggregation over those partial
  rows (map-side combinable), then the closed-form slope/intercept.

Cross-engine determinism: the slope/intercept derive from moment sums.
Both input columns carry ≤2 decimals, so the Python side rescales to
int64 (exact — the scaled values are exactly representable, and Python
ints in the per-batch fold are arbitrary-precision). Partials are
exact integers; the combine sums them as DECIMAL(38,0) (exact,
overflow-safe past int64: 600 B rows x 5e10 max per-row product needs
~2^75), and each moment becomes a double via ONE exact decimal
division then ONE cast — the nearest double of the same rational the
oracle's ``CAST(sum(DECIMAL) AS DOUBLE)`` lands on. The final slope
arithmetic is then the same IEEE expression on both sides.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

from sparksql_server_spark.catalog import table
from sparksql_server_spark.operators.registry import query

_PARTIAL_SCHEMA = (
    "l_returnflag string, n bigint, sx bigint, sy bigint, "
    "sxy bigint, sxx bigint"
)


def _partial_moments(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Fold each Arrow batch into one exact scaled-integer moment row
    per group present in the batch. Per-row products max out near
    5e10 (quantity ≤ 5e3 scaled, extendedprice ≤ 1e7 scaled), so a
    batch of ~10k rows stays far below int64; totals past int64 are
    the COMBINE's job (DECIMAL(38,0))."""
    for pdf in batches:
        if pdf.empty:
            continue
        out: dict[str, list] = {
            "l_returnflag": [], "n": [], "sx": [], "sy": [],
            "sxy": [], "sxx": [],
        }
        for flag, g in pdf.groupby("l_returnflag", sort=False):
            # exact int64 rescale of <=2-decimal doubles
            x = [round(v * 100) for v in g["l_quantity"]]
            y = [round(v * 100) for v in g["l_extendedprice"]]
            out["l_returnflag"].append(flag)
            out["n"].append(len(x))
            out["sx"].append(sum(x))
            out["sy"].append(sum(y))
            out["sxy"].append(sum(a * b for a, b in zip(x, y)))
            out["sxx"].append(sum(a * a for a in x))
        yield pd.DataFrame(out)


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
    """Per-return-flag OLS fit of extendedprice against quantity:
    Arrow-batch partial moments (mapInPandas) + SQL final combine."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity", "l_extendedprice"
    )
    partials = li.mapInPandas(_partial_moments, schema=_PARTIAL_SCHEMA)
    partials.createOrReplaceTempView("ols_partials")
    return spark.sql(
        """
        SELECT l_returnflag,
               CAST(n AS BIGINT) AS n,
               (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
               (sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n
                 AS intercept,
               sx / n AS mean_x
        FROM (
          SELECT l_returnflag, sum(n) AS n,
                 CAST(sum(CAST(sx AS DECIMAL(38,0))) / 100 AS DOUBLE)    AS sx,
                 CAST(sum(CAST(sy AS DECIMAL(38,0))) / 100 AS DOUBLE)    AS sy,
                 CAST(sum(CAST(sxy AS DECIMAL(38,0))) / 10000 AS DOUBLE) AS sxy,
                 CAST(sum(CAST(sxx AS DECIMAL(38,0))) / 10000 AS DOUBLE) AS sxx
          FROM ols_partials GROUP BY l_returnflag)
        ORDER BY l_returnflag
        """
    )
