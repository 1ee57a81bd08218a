"""Similarity search over the embeddings table (north-star set).

- ``sim_topk_bruteforce``: exact top-k cosine — the correctness
  baseline. Cross-join of a small query set against the corpus;
  Spark broadcasts the query side, so the corpus never shuffles.
- ``sim_topk_lsh``: random-hyperplane LSH buckets — the scale path.
  Bucket assignment is a map-only expression; the probe joins on
  bucket id, so the pairwise work is Σ bucket² instead of |Q|×|C|.

Vector math is JVM-side higher-order functions (functions/vector.py);
coefficients of the LSH hyperplanes are integer-derived pseudo-randoms
(no float trig) so the DuckDB oracle reproduces them exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from sparksql_server_spark.catalog import register_tables
from sparksql_server_spark.operators.registry import query
from sparksql_server_spark.functions.vector import duck_dot, duck_norm, spark_dot, spark_norm

_N_QUERIES = 8  # vec_id < 8 are the probe vectors
_TOP_K = 10
_LSH_PLANES = 8  # 2^8 = 256 buckets
# integer pseudo-random hyperplane coefficient for plane p, element i (1-based):
#   coef(p, i) = ((p * 1000 + i) * 2654435761) % 97 - 48     (in [-48, 48])
_SPARK_COEF = "double(((p * 1000 + i) * 2654435761) % 97 - 48)"
_DUCK_COEF = "((((p * 1000 + i) * 2654435761) % 97) - 48)::DOUBLE"


def _brute_spark() -> str:
    return f"""
WITH n AS (SELECT vec_id, embedding, {spark_norm('embedding')} AS nrm FROM embeddings),
q AS (SELECT vec_id AS q_id, embedding AS q_emb, nrm AS q_nrm FROM n
      WHERE vec_id < {_N_QUERIES}),
scored AS (
  SELECT q_id, n.vec_id AS neighbor_id,
         round({spark_dot('q_emb', 'n.embedding')} / (q_nrm * n.nrm), 6) AS cos
  FROM q CROSS JOIN n WHERE q_id <> n.vec_id),
ranked AS (
  SELECT q_id, neighbor_id, cos,
         CAST(row_number() OVER (PARTITION BY q_id
               ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rank
  FROM scored)
SELECT q_id, neighbor_id, cos, rank FROM ranked
WHERE rank <= {_TOP_K}
ORDER BY q_id, rank
"""


def _brute_duck() -> str:
    return f"""
WITH n AS (SELECT vec_id, embedding, {duck_norm('embedding')} AS nrm FROM embeddings),
q AS (SELECT vec_id AS q_id, embedding AS q_emb, nrm AS q_nrm FROM n
      WHERE vec_id < {_N_QUERIES}),
scored AS (
  SELECT q_id, n.vec_id AS neighbor_id,
         round({duck_dot('q_emb', 'n.embedding')} / (q_nrm * n.nrm), 6) AS cos
  FROM q CROSS JOIN n WHERE q_id <> n.vec_id),
ranked AS (
  SELECT q_id, neighbor_id, cos,
         row_number() OVER (PARTITION BY q_id
               ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored)
SELECT q_id, neighbor_id, cos, rank FROM ranked
WHERE rank <= {_TOP_K}
ORDER BY q_id, rank
"""


@query("sim_topk_bruteforce", oracle=_brute_duck())
def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-k cosine neighbors for the probe set (vec_id < 8).

    Scale: Catalyst broadcasts the tiny query side (BroadcastNestedLoop
    over 8 rows ≈ map-only pass over the corpus); per-partition top-k
    then a driver merge via TakeOrdered — the corpus is read once and
    never shuffled.
    """
    register_tables(spark, sf_dir, ("embeddings",))
    return spark.sql(_brute_spark())


def _lsh_spark() -> str:
    bucket = f"""
  aggregate(transform(sequence(0, {_LSH_PLANES - 1}), p ->
      CASE WHEN aggregate(transform(sequence(1, size(embedding)), i ->
                     element_at(embedding, i) * {_SPARK_COEF}),
                 0D, (acc, v) -> acc + v) > 0D
           THEN shiftleft(1, p) ELSE 0 END),
    0, (acc, v) -> acc + v)"""
    return f"""
WITH n AS (SELECT vec_id, embedding, {spark_norm('embedding')} AS nrm,
                  {bucket} AS bucket
           FROM embeddings),
q AS (SELECT vec_id AS q_id, embedding AS q_emb, nrm AS q_nrm, bucket FROM n
      WHERE vec_id < {_N_QUERIES}),
scored AS (
  SELECT q_id, n.vec_id AS neighbor_id,
         round({spark_dot('q_emb', 'n.embedding')} / (q_nrm * n.nrm), 6) AS cos
  FROM q JOIN n ON q.bucket = n.bucket AND q_id <> n.vec_id),
ranked AS (
  SELECT q_id, neighbor_id, cos,
         CAST(row_number() OVER (PARTITION BY q_id
               ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rank
  FROM scored)
SELECT q_id, neighbor_id, cos, rank FROM ranked
WHERE rank <= {_TOP_K}
ORDER BY q_id, rank
"""


def _lsh_duck() -> str:
    bucket = f"""
  list_reduce(list_prepend(0::BIGINT, list_transform(range(0, {_LSH_PLANES}), p ->
      CASE WHEN list_reduce(list_prepend(0.0::DOUBLE,
                     list_transform(range(1, len(embedding) + 1), i ->
                         embedding[i] * {_DUCK_COEF})),
                 (acc, v) -> acc + v) > 0.0
           THEN (1 << p)::BIGINT ELSE 0::BIGINT END)),
    (acc, v) -> acc + v)"""
    return f"""
WITH n AS (SELECT vec_id, embedding, {duck_norm('embedding')} AS nrm,
                  {bucket} AS bucket
           FROM embeddings),
q AS (SELECT vec_id AS q_id, embedding AS q_emb, nrm AS q_nrm, bucket FROM n
      WHERE vec_id < {_N_QUERIES}),
scored AS (
  SELECT q_id, n.vec_id AS neighbor_id,
         round({duck_dot('q_emb', 'n.embedding')} / (q_nrm * n.nrm), 6) AS cos
  FROM q JOIN n ON q.bucket = n.bucket AND q_id <> n.vec_id),
ranked AS (
  SELECT q_id, neighbor_id, cos,
         row_number() OVER (PARTITION BY q_id
               ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored)
SELECT q_id, neighbor_id, cos, rank FROM ranked
WHERE rank <= {_TOP_K}
ORDER BY q_id, rank
"""


_N_CELLS = 16  # IVF coarse centroids: vec_id ∈ [100, 116)
_N_PROBE = 2  # cells searched per query


def _ivf_sql(dot, norm) -> str:
    """IVF-Flat shared across dialects: a coarse quantizer (16 fixed
    centroid vectors), nearest-cell assignment for the corpus, and
    nprobe=2 cell search for the queries."""
    return f"""
WITH n AS (SELECT vec_id, embedding, {norm('embedding')} AS nrm FROM embeddings),
c AS (SELECT vec_id AS c_id, embedding AS c_emb, nrm AS c_nrm FROM n
      WHERE vec_id >= 100 AND vec_id < {100 + _N_CELLS}),
assign AS (
  SELECT vec_id, embedding, nrm, c_id,
         row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, c_id) AS rn
  FROM (SELECT n.vec_id, n.embedding, n.nrm, c.c_id,
               round({dot('n.embedding', 'c_emb')} / (n.nrm * c_nrm), 6) AS cos
        FROM n CROSS JOIN c)),
cell AS (SELECT vec_id, embedding, nrm, c_id FROM assign WHERE rn = 1),
qprobe AS (
  SELECT vec_id AS q_id, embedding AS q_emb, nrm AS q_nrm, c_id
  FROM assign WHERE vec_id < {_N_QUERIES} AND rn <= {_N_PROBE}),
scored AS (
  SELECT q_id, cell.vec_id AS neighbor_id,
         round({dot('q_emb', 'cell.embedding')} / (q_nrm * cell.nrm), 6) AS cos
  FROM qprobe JOIN cell ON qprobe.c_id = cell.c_id AND q_id <> cell.vec_id),
ranked AS (
  SELECT q_id, neighbor_id, cos,
         CAST(row_number() OVER (PARTITION BY q_id
               ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rank
  FROM scored)
SELECT q_id, neighbor_id, cos, rank FROM ranked
WHERE rank <= {_TOP_K}
ORDER BY q_id, rank
"""


@query("sim_topk_ivf", oracle=_ivf_sql(duck_dot, duck_norm))
def sim_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k via IVF-Flat: 16 coarse centroid vectors
    partition the corpus into cells (nearest-centroid assignment);
    each query searches only its nprobe=2 nearest cells.

    Scale: centroids broadcast (map-only assignment over the corpus —
    at 100 TB the assignment is written once as a partition column and
    reused); the probe is an equi-join on cell id, so pairwise work is
    |Q| × (corpus / cells) × nprobe instead of |Q| × corpus. Recall
    trades via nprobe with no plan-shape change. Centroids here are
    fixed corpus vectors so the oracle reproduces them; a real build
    would k-means them offline and broadcast the table.
    """
    register_tables(spark, sf_dir, ("embeddings",))
    return spark.sql(_ivf_sql(spark_dot, spark_norm))


@query("sim_topk_lsh", oracle=_lsh_duck())
def sim_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k: random-hyperplane LSH (8 planes → 256 buckets),
    probing only the query's own bucket.

    Scale: bucket assignment is map-only; the probe is an equi-join on
    bucket id (broadcastable query side). Recall/cost trades via plane
    count and multi-probe (flip one bit per probe) — both plan-shape
    preserving.
    """
    register_tables(spark, sf_dir, ("embeddings",))
    return spark.sql(_lsh_spark())
