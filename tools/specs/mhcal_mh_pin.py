"""A/B: dedup_minhash_calibration — current form (sh pinned, mh inline
with 3 consumers re-running the 16-component signature groupBy, arm a)
vs additionally pinning the |docs|-sized mh signature table (arm b).
SPEC_SWAP=1 swaps arms.
"""

import os

from sparksql_server_spark.catalog import register_tables
from sparksql_server_spark.operators import QUERIES
from sparksql_server_spark.operators.dedup import (
    _MH_K,
    _MH_MINS,
    _STACK_ARGS,
    _MH_R,
    _mh_calibration_sql,
    _sh_canonical_sql,
)
from sparksql_server_spark.operators.dedup import spark_char_hash
from sparksql_server_spark.operators.scratch import pin_view

NAME = "mhcal_mh_pin"


def build_a(spark, sf_dir):
    return QUERIES["dedup_minhash_calibration"](spark, sf_dir)


def build_b(spark, sf_dir):
    register_tables(spark, sf_dir, ("documents",), spread=("documents",))
    w_body, ex = _sh_canonical_sql("spark")
    pin_view(spark, spark.sql(f"WITH w AS ({w_body}) {ex}"), "mh_cal_sh_mat")
    chash = spark_char_hash("shingle")
    pin_view(
        spark,
        spark.sql(
            f"""
WITH sh AS (SELECT doc_id, shingle FROM mh_cal_sh_mat),
h AS (SELECT doc_id, {chash} AS h FROM sh)
SELECT doc_id, {_MH_MINS} FROM h GROUP BY doc_id"""
        ),
        "mh_cal_mh_mat",
    )
    eq_terms = " + ".join(
        f"(CASE WHEN a.m{j} = b.m{j} THEN 1 ELSE 0 END)" for j in range(_MH_K)
    )
    bands = (
        f"SELECT doc_id, band, band_sig FROM mh "
        f"LATERAL VIEW stack({_MH_K // _MH_R}, {_STACK_ARGS}) s AS band, band_sig"
    )
    return spark.sql(
        f"""
WITH sh AS (SELECT doc_id, shingle FROM mh_cal_sh_mat),
mh AS (SELECT * FROM mh_cal_mh_mat),
bs AS ({bands}),
pairs AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
          FROM bs a JOIN bs b
            ON a.band = b.band AND a.band_sig = b.band_sig
           AND a.doc_id < b.doc_id),
est AS (SELECT p.d1, p.d2, ({eq_terms}) / {_MH_K}.0 AS est_j
        FROM pairs p
        JOIN mh a ON a.doc_id = p.d1
        JOIN mh b ON b.doc_id = p.d2),
sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY doc_id),
inter AS (SELECT p.d1, p.d2, CAST(count(*) AS BIGINT) AS ni
          FROM pairs p
          JOIN sh s1 ON s1.doc_id = p.d1
          JOIN sh s2 ON s2.doc_id = p.d2 AND s2.shingle = s1.shingle
          GROUP BY p.d1, p.d2),
scored AS (
  SELECT e.d1, e.d2, e.est_j,
         CAST(coalesce(i.ni, 0) AS DOUBLE)
           / (sa.n + sb.n - coalesce(i.ni, 0)) AS exact_j
  FROM est e
  LEFT JOIN inter i ON i.d1 = e.d1 AND i.d2 = e.d2
  JOIN sizes sa ON sa.doc_id = e.d1
  JOIN sizes sb ON sb.doc_id = e.d2)
SELECT CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(avg(abs(est_j - exact_j)) AS DOUBLE) AS mean_abs_err,
       CAST(max(abs(est_j - exact_j)) AS DOUBLE) AS max_abs_err,
       CAST(avg(exact_j) AS DOUBLE) AS mean_exact_j
FROM scored
"""
    )


if os.environ.get("SPEC_SWAP") == "1":
    build_a, build_b = build_b, build_a
