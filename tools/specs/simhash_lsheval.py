"""A/B round 13: SPEC_TARGET=
  simhash  — dedup_simhash_pairs: inline sig CTE (signature pipeline
             re-executed per join side, arm a) vs pinned sig (arm b).
  lsheval  — dedup_lsh_eval_pr: current sz-groupBy + two joins in the
             truth branch (arm a) vs per-doc count window annotated on
             the pinned shingle relation (arm b) — one doc_id shuffle
             replaces two inlined groupBys + joins; min(n) per side in
             the same pair aggregation.
SPEC_SWAP=1 swaps arms.
"""

import os

from sparksql_server_spark.catalog import register_tables
from sparksql_server_spark.operators import QUERIES
from sparksql_server_spark.operators.dedup import (
    _EVAL_TAU,
    _mh_candidate_ctes,
    _sh_canonical_sql,
    _simhash_spark,
    _MASK,
    _SH_BLOCK_BITS,
    _SH_K,
    _SH_NBLOCKS,
    _emit_once,
)
from sparksql_server_spark.operators.scratch import pin_view

TARGET = os.environ.get("SPEC_TARGET", "simhash")
NAME = f"r13_{TARGET}"

_QNAME = {
    "simhash": "dedup_simhash_pairs",
    "lsheval": "dedup_lsh_eval_pr",
}[TARGET]


def build_a(spark, sf_dir):  # current
    return QUERIES[_QNAME](spark, sf_dir)


def _simhash_pinned(spark, sf_dir):
    register_tables(spark, sf_dir, ("documents",))
    pin_view(spark, spark.sql(_simhash_spark()), "simhash_sig_mat")
    return spark.sql(
        f"""
WITH sig AS (SELECT doc_id, simhash FROM simhash_sig_mat),
blocks AS (
  SELECT doc_id, simhash, band,
         shiftright(simhash, band * {_SH_BLOCK_BITS}) & {_MASK} AS blk
  FROM sig
  LATERAL VIEW explode(sequence(0, {_SH_NBLOCKS - 1})) t AS band)
SELECT d1, d2, hamming FROM (
  SELECT a.doc_id AS d1, b.doc_id AS d2,
         CAST(bit_count(a.simhash ^ b.simhash) AS INT) AS hamming
  FROM blocks a JOIN blocks b
    ON a.band = b.band AND a.blk = b.blk AND a.doc_id < b.doc_id
   AND {_emit_once(f"shiftright({{sig}}, {{shift}}) & {_MASK}")})
WHERE hamming <= {_SH_K}
"""
    )


def _lsheval_window(spark, sf_dir):
    register_tables(spark, sf_dir, ("documents",))
    w_body, ex = _sh_canonical_sql("spark")
    pin_view(spark, spark.sql(f"WITH w AS ({w_body}) {ex}"), "lsh_eval_sh_mat")
    return spark.sql(
        f"""
WITH {_mh_candidate_ctes("spark", sh_from="lsh_eval_sh_mat")},
shn AS (
  SELECT doc_id, shingle, count(*) OVER (PARTITION BY doc_id) AS n FROM sh),
inter AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2,
         CAST(count(*) AS BIGINT) AS i,
         min(a.n) AS na, min(b.n) AS nb
  FROM shn a JOIN shn b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id),
truth AS (
  SELECT d1, d2 FROM inter
  WHERE CAST(i AS DOUBLE) / (na + nb - i) >= {_EVAL_TAU}),
marked AS (
  SELECT CASE WHEN c.d1 IS NOT NULL THEN 1 END AS in_c,
         CASE WHEN t.d1 IS NOT NULL THEN 1 END AS in_t
  FROM cand c FULL JOIN truth t ON c.d1 = t.d1 AND c.d2 = t.d2),
counts AS (
  SELECT CAST(count(in_t) AS BIGINT) AS n_truth,
         CAST(count(in_c) AS BIGINT) AS n_candidates,
         CAST(count(CASE WHEN in_c = 1 AND in_t = 1 THEN 1 END) AS BIGINT)
           AS n_hit
  FROM marked)
SELECT n_truth, n_candidates, n_hit,
       CAST(round(CAST(n_hit AS DOUBLE) / nullif(n_candidates, 0), 6) AS DOUBLE)
         AS precision_at_tau,
       CAST(round(CAST(n_hit AS DOUBLE) / nullif(n_truth, 0), 6) AS DOUBLE)
         AS recall_at_tau
FROM counts
"""
    )


def build_b(spark, sf_dir):
    if TARGET == "simhash":
        return _simhash_pinned(spark, sf_dir)
    return _lsheval_window(spark, sf_dir)


if os.environ.get("SPEC_SWAP") == "1":
    build_a, build_b = build_b, build_a
