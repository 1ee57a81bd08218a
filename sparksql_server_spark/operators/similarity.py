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


def spark_lsh_bucket(col: str) -> str:
    """Random-hyperplane LSH bucket id (0..2^planes-1) of a vector
    column — Spark dialect. Shared by sim_topk_lsh/multiprobe/range and
    dedup_embedding_cosine, so every operator blocks on the SAME
    deterministic buckets (integer-derived coefficients, reproducible
    on the DuckDB oracle via ``duck_lsh_bucket``)."""
    return f"""
  aggregate(transform(sequence(0, {_LSH_PLANES - 1}), p ->
      CASE WHEN aggregate(transform(sequence(1, size({col})), i ->
                     element_at({col}, i) * {_SPARK_COEF}),
                 0D, (acc, v) -> acc + v) > 0D
           THEN shiftleft(1, p) ELSE 0 END),
    0, (acc, v) -> acc + v)"""


def duck_lsh_bucket(col: str) -> str:
    """DuckDB twin of ``spark_lsh_bucket`` — same planes, same integer
    coefficient schedule, same sign rule."""
    return f"""
  list_reduce(list_prepend(0::BIGINT, list_transform(range(0, {_LSH_PLANES}), p ->
      CASE WHEN list_reduce(list_prepend(0.0::DOUBLE,
                     list_transform(range(1, len({col}) + 1), i ->
                         {col}[i] * {_DUCK_COEF})),
                 (acc, v) -> acc + v) > 0.0
           THEN (1 << p)::BIGINT ELSE 0::BIGINT END)),
    (acc, v) -> acc + v)"""


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
    bucket = spark_lsh_bucket("embedding")
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
    bucket = duck_lsh_bucket("embedding")
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


def _ivf_spark_staged(spark: SparkSession) -> DataFrame:
    """Spark execution of :func:`_ivf_sql` staged at the assignment
    (round 12, guide §2.4/§5): ``assign`` — the N×16 centroid
    cross-join plus per-vector ranking window — feeds both ``cell``
    (rn = 1, all vectors) and ``qprobe`` (rn ≤ nprobe, query vectors),
    and CTE inlining executes it once per consumer. One pinned pass
    keeps exactly the union of rows either consumer reads
    (rn = 1 OR (query vector AND rn ≤ nprobe) — N + nprobe·|Q| rows,
    the IVF index + probe lists a real build materializes); the tail
    filters the pinned relation. Values identical — pure barrier."""
    from sparksql_server_spark.operators.scratch import pin_view

    asg = spark.sql(
        f"""
WITH n AS (SELECT vec_id, embedding, {spark_norm('embedding')} AS nrm FROM embeddings),
c AS (SELECT vec_id AS c_id, embedding AS c_emb, nrm AS c_nrm FROM n
      WHERE vec_id >= 100 AND vec_id < {100 + _N_CELLS}),
assign AS (
  SELECT vec_id, embedding, nrm, c_id,
         row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, c_id) AS rn
  FROM (SELECT n.vec_id, n.embedding, n.nrm, c.c_id,
               round({spark_dot('n.embedding', 'c_emb')} / (n.nrm * c_nrm), 6) AS cos
        FROM n CROSS JOIN c))
SELECT vec_id, embedding, nrm, c_id, rn FROM assign
WHERE rn = 1 OR (vec_id < {_N_QUERIES} AND rn <= {_N_PROBE})"""
    )
    pin_view(spark, asg, "ivf_asg")
    return spark.sql(
        f"""
WITH cell AS (SELECT vec_id, embedding, nrm, c_id FROM ivf_asg WHERE rn = 1),
qprobe AS (
  SELECT vec_id AS q_id, embedding AS q_emb, nrm AS q_nrm, c_id
  FROM ivf_asg WHERE vec_id < {_N_QUERIES} AND rn <= {_N_PROBE}),
scored AS (
  SELECT q_id, cell.vec_id AS neighbor_id,
         round({spark_dot('q_emb', 'cell.embedding')} / (q_nrm * cell.nrm), 6) AS cos
  FROM qprobe JOIN cell ON qprobe.c_id = cell.c_id AND q_id <> cell.vec_id),
ranked AS (
  SELECT q_id, neighbor_id, cos,
         CAST(row_number() OVER (PARTITION BY q_id
               ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rank
  FROM scored)
SELECT q_id, neighbor_id, cos, rank FROM ranked
WHERE rank <= {_TOP_K}
ORDER BY q_id, rank"""
    )


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
    # r12: small-input spread (guide §2.5) — interleaved steady A/B -0.13 s
    register_tables(spark, sf_dir, ("embeddings",), spread=("embeddings",))
    # r12: staged at the pinned assignment — see _ivf_spark_staged
    # (the one-statement form executed the N×16 ranking window once
    # per consumer). Oracle keeps the one-statement text.
    return _ivf_spark_staged(spark)


def _ivf_refine_sql(dot, norm, cell_elems: str, seed_elems: str) -> str:
    """One distributed Lloyd (k-means) refinement of the IVF coarse
    quantizer, shared across dialects. ``cell_elems``/``seed_elems``
    are the dialect's 1-row-per-(vector, dimension) expansions of the
    assigned corpus and the seed centroids.

    Double determinism: per-dimension sums use the exact-DECIMAL
    pattern (a binary float can never fall exactly halfway between two
    decimal ticks — halfway points carry a factor 5^k no dyadic has —
    so both engines' round-to-nearest casts agree tie-free), and every
    remaining float op is IEEE-identical (division, sqrt, multiply).
    """
    return f"""
WITH n AS (SELECT vec_id, embedding, {norm('embedding')} AS nrm FROM embeddings),
c AS (SELECT vec_id AS c_id, embedding AS c_emb, nrm AS c_nrm FROM n
      WHERE vec_id >= 100 AND vec_id < {100 + _N_CELLS}),
assign AS (
  SELECT vec_id, embedding, c_id,
         row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, c_id) AS rn
  FROM (SELECT n.vec_id, n.embedding, c.c_id,
               round({dot('n.embedding', 'c_emb')} / (n.nrm * c_nrm), 6) AS cos
        FROM n CROSS JOIN c)),
cell AS (SELECT vec_id, embedding, c_id FROM assign WHERE rn = 1),
counts AS (SELECT c_id, count(*) AS n_members FROM cell GROUP BY c_id),
elems AS ({cell_elems}),
sums AS (SELECT c_id, i, CAST(sum(CAST(x AS DECIMAL(18,12))) AS DOUBLE) AS sx
         FROM elems GROUP BY c_id, i),
means AS (SELECT s.c_id, s.i, s.sx / cnt.n_members AS mu
          FROM sums s JOIN counts cnt ON s.c_id = cnt.c_id),
seed AS ({seed_elems}),
refined AS (
  SELECT m.c_id,
         CAST(sum(CAST(m.mu * m.mu AS DECIMAL(18,12))) AS DOUBLE) AS mu_sq,
         CAST(sum(CAST(m.mu * sd.sv AS DECIMAL(18,12))) AS DOUBLE) AS mu_dot_seed,
         max(sd.c_nrm) AS c_nrm
  FROM means m JOIN seed sd ON m.c_id = sd.c_id AND m.i = sd.i
  GROUP BY m.c_id)
SELECT r.c_id, cnt.n_members,
       round(sqrt(r.mu_sq), 6) AS refined_norm,
       round(r.mu_dot_seed / (sqrt(r.mu_sq) * r.c_nrm), 6) AS seed_cos
FROM refined r JOIN counts cnt ON r.c_id = cnt.c_id
ORDER BY r.c_id
"""


_REFINE_CELL_SPARK = """
  SELECT c_id, i, CAST(element_at(embedding, i) AS DOUBLE) AS x
  FROM cell LATERAL VIEW explode(sequence(1, size(embedding))) t AS i"""
_REFINE_SEED_SPARK = """
  SELECT c_id, c_nrm, i, CAST(element_at(c_emb, i) AS DOUBLE) AS sv
  FROM c LATERAL VIEW explode(sequence(1, size(c_emb))) t AS i"""
_REFINE_CELL_DUCK = """
  SELECT c_id, i, CAST(embedding[i] AS DOUBLE) AS x
  FROM (SELECT c_id, embedding,
               unnest(range(1, len(embedding) + 1)) AS i FROM cell)"""
_REFINE_SEED_DUCK = """
  SELECT c_id, c_nrm, i, CAST(c_emb[i] AS DOUBLE) AS sv
  FROM (SELECT c_id, c_nrm, c_emb,
               unnest(range(1, len(c_emb) + 1)) AS i FROM c)"""


def _ivf_refine_spark_staged(spark: SparkSession) -> DataFrame:
    """Spark execution of :func:`_ivf_refine_sql`, staged at the two
    relations CTE inlining otherwise re-executes (round 12, guide
    §2.4/§5): ``cell`` (the corpus→centroid assignment) feeds the
    element sums, the member counts AND the final count join — three
    full re-runs of the broadcast-assign window — and ``c`` (the 16
    seed centroids) feeds both the assignment and the seed expansion.
    Pinning c (16 rows) and cell (the assignment — exactly the IVF
    index artifact a real build materializes) cuts the plan from 7
    embeddings scans to 2, the floor (one to cut seeds, one to
    assign). Values identical: the pin is a materialization barrier;
    all reductions keep the exact-DECIMAL pattern."""
    from sparksql_server_spark.operators.scratch import pin_view

    n_body = f"SELECT vec_id, embedding, {spark_norm('embedding')} AS nrm FROM embeddings"
    c = spark.sql(
        f"SELECT vec_id AS c_id, embedding AS c_emb, nrm AS c_nrm "
        f"FROM ({n_body}) WHERE vec_id >= 100 AND vec_id < {100 + _N_CELLS}"
    )
    pin_view(spark, c, "ivf_c")
    cell = spark.sql(
        f"""
WITH n AS ({n_body}),
assign AS (
  SELECT vec_id, embedding, c_id,
         row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, c_id) AS rn
  FROM (SELECT n.vec_id, n.embedding, c.c_id,
               round({spark_dot('n.embedding', 'c_emb')} / (n.nrm * c_nrm), 6) AS cos
        FROM n CROSS JOIN ivf_c c))
SELECT vec_id, embedding, c_id FROM assign WHERE rn = 1"""
    )
    pin_view(spark, cell, "ivf_cell")
    return spark.sql(
        """
WITH counts AS (SELECT c_id, count(*) AS n_members FROM ivf_cell GROUP BY c_id),
elems AS (
  SELECT c_id, i, CAST(element_at(embedding, i) AS DOUBLE) AS x
  FROM ivf_cell LATERAL VIEW explode(sequence(1, size(embedding))) t AS i),
sums AS (SELECT c_id, i, CAST(sum(CAST(x AS DECIMAL(18,12))) AS DOUBLE) AS sx
         FROM elems GROUP BY c_id, i),
means AS (SELECT s.c_id, s.i, s.sx / cnt.n_members AS mu
          FROM sums s JOIN counts cnt ON s.c_id = cnt.c_id),
seed AS (
  SELECT c_id, c_nrm, i, CAST(element_at(c_emb, i) AS DOUBLE) AS sv
  FROM ivf_c LATERAL VIEW explode(sequence(1, size(c_emb))) t AS i),
refined AS (
  SELECT m.c_id,
         CAST(sum(CAST(m.mu * m.mu AS DECIMAL(18,12))) AS DOUBLE) AS mu_sq,
         CAST(sum(CAST(m.mu * sd.sv AS DECIMAL(18,12))) AS DOUBLE) AS mu_dot_seed,
         max(sd.c_nrm) AS c_nrm
  FROM means m JOIN seed sd ON m.c_id = sd.c_id AND m.i = sd.i
  GROUP BY m.c_id)
SELECT r.c_id, cnt.n_members,
       round(sqrt(r.mu_sq), 6) AS refined_norm,
       round(r.mu_dot_seed / (sqrt(r.mu_sq) * r.c_nrm), 6) AS seed_cos
FROM refined r JOIN counts cnt ON r.c_id = cnt.c_id
ORDER BY r.c_id"""
    )


@query(
    "sim_ivf_kmeans_refine",
    oracle=_ivf_refine_sql(duck_dot, duck_norm, _REFINE_CELL_DUCK, _REFINE_SEED_DUCK),
)
def sim_ivf_kmeans_refine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One Lloyd iteration of the IVF coarse-quantizer build, fully
    distributed: assign every corpus vector to its nearest seed
    centroid, recompute each cell's mean element-wise, and report per
    cell its member count, the refined centroid's norm, and the cosine
    between refined and seed centroid (the convergence signal a
    k-means driver loop would watch). Upgrades sim_topk_ivf's fixed
    seed centroids into a real training step.

    Scale: assignment is a broadcast (16 centroids) map-only pass; the
    mean recompute is ONE shuffle keyed by (cell, dimension) — fine
    granularity that spreads evenly; nothing is ever collected per
    vector. Iterating = re-running with the refined table as the new
    seed (same plan shape per round, like dedup's connected
    components).

    Round 12: Spark executes the SAME algebra staged at the pinned
    seed/assignment relations (:func:`_ivf_refine_spark_staged` — the
    one-statement form re-inlined them into 7 embeddings scans; staged
    is the 2-scan floor). The oracle keeps the one-statement text.
    """
    register_tables(spark, sf_dir, ("embeddings",))
    return _ivf_refine_spark_staged(spark)


@query("sim_topk_lsh", oracle=_lsh_duck())
def sim_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k: random-hyperplane LSH (8 planes → 256 buckets),
    probing only the query's own bucket.

    Scale: bucket assignment is map-only; the probe is an equi-join on
    bucket id (broadcastable query side). Recall/cost trades via plane
    count and multi-probe (sim_topk_lsh_multiprobe below) — both
    plan-shape preserving.
    """
    # r12: small-input spread (guide §2.5) — interleaved steady A/B -0.25/-0.18 s
    register_tables(spark, sf_dir, ("embeddings",), spread=("embeddings",))
    return spark.sql(_lsh_spark())


def _lsh_multiprobe_sql(base_sql: str, q_clause: str) -> str:
    """Rewrite the single-bucket LSH query into 1+8 probe buckets: the
    query's own bucket plus every one-bit flip. A query-side explode
    multiplies only the tiny probe set (8 rows → 72); each corpus
    vector still has exactly one bucket, so a (query, neighbor) pair
    matches through at most one probe value and needs no dedup."""
    original_q = (
        "q AS (SELECT vec_id AS q_id, embedding AS q_emb, nrm AS q_nrm, bucket FROM n\n"
        f"      WHERE vec_id < {_N_QUERIES}),"
    )
    assert original_q in base_sql, "LSH base query shape changed"
    return base_sql.replace(
        original_q,
        "q0 AS (SELECT vec_id AS q_id, embedding AS q_emb, nrm AS q_nrm, bucket FROM n\n"
        f"      WHERE vec_id < {_N_QUERIES}),\n"
        f"q AS ({q_clause}),",
    )


_FLIPS_SPARK = ", ".join(f"bucket ^ {1 << p}" for p in range(_LSH_PLANES))
_FLIPS_DUCK = ", ".join(f"xor(bucket, {1 << p})" for p in range(_LSH_PLANES))
_Q_MULTI_SPARK = (
    "SELECT q_id, q_emb, q_nrm, probe AS bucket FROM q0 "
    f"LATERAL VIEW explode(array(bucket, {_FLIPS_SPARK})) t AS probe"
)
_Q_MULTI_DUCK = (
    f"SELECT q_id, q_emb, q_nrm, unnest([bucket, {_FLIPS_DUCK}]) AS bucket FROM q0"
)


@query("sim_topk_lsh_multiprobe", oracle=_lsh_multiprobe_sql(_lsh_duck(), _Q_MULTI_DUCK))
def sim_topk_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe LSH: each query searches its own bucket plus the 8
    one-bit-flip neighbors (the planes most likely to have misassigned
    a near point). Standard recall booster: ~9× the candidates of
    single-probe at the same plane count, with the same plan shape —
    the explode touches only the 8-row query side, the corpus is still
    scanned once and joined on bucket id.
    """
    # r12: small-input spread (guide §2.5) — interleaved steady A/B -0.20 s
    register_tables(spark, sf_dir, ("embeddings",), spread=("embeddings",))
    return spark.sql(_lsh_multiprobe_sql(_lsh_spark(), _Q_MULTI_SPARK))


def _centroid_stats_sql(elems: str) -> str:
    """Per-LABEL centroid norm and intra-class dispersion, shared
    across dialects. ``elems`` is the dialect's 1-row-per-(vector,
    dimension) expansion of the embeddings table.

    Dispersion uses the one-pass identity E||x - c||^2 =
    E||x||^2 - ||c||^2 — no second join of vectors against their
    centroid. Double determinism: per-dimension and per-label sums go
    through the exact-DECIMAL pattern; the remaining float ops
    (division, multiply, sqrt, subtract) are IEEE-identical.
    """
    return f"""
WITH dims AS ({elems}),
per_dim AS (
  SELECT label, i,
         CAST(sum(CAST(x AS DECIMAL(18,12))) AS DOUBLE) AS sx,
         count(*) AS n
  FROM dims GROUP BY label, i),
cent AS (
  SELECT label,
         CAST(max(n) AS BIGINT) AS n_vecs,
         CAST(sum(CAST((sx / n) * (sx / n) AS DECIMAL(28,20))) AS DOUBLE) AS c_sq
  FROM per_dim GROUP BY label),
sq AS (
  SELECT label,
         CAST(sum(CAST(x * x AS DECIMAL(28,20))) AS DOUBLE) AS sxx
  FROM dims GROUP BY label)
SELECT c.label, c.n_vecs,
       sqrt(c.c_sq)                  AS centroid_norm,
       s.sxx / c.n_vecs              AS mean_sq_norm,
       s.sxx / c.n_vecs - c.c_sq     AS dispersion
FROM cent c JOIN sq s ON c.label = s.label
ORDER BY c.label
"""


_CENTROID_ELEMS_SPARK = """
  SELECT label, i, CAST(element_at(embedding, i) AS DOUBLE) AS x
  FROM embeddings LATERAL VIEW explode(sequence(1, size(embedding))) t AS i"""
_CENTROID_ELEMS_DUCK = """
  SELECT label, i, CAST(embedding[i] AS DOUBLE) AS x
  FROM (SELECT label, embedding,
               unnest(range(1, len(embedding) + 1)) AS i FROM embeddings)"""


@query("emb_centroid_stats", oracle=_centroid_stats_sql(_CENTROID_ELEMS_DUCK))
def emb_centroid_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroid norm and intra-class dispersion
    (mean squared distance to the centroid) — the cluster-quality /
    class-separability report a training-data pipeline runs over its
    embedding space before and after filtering.

    Scale: one (label, dimension)-keyed shuffle for the centroid (the
    same fine-grained key as the k-means refine — spreads evenly, no
    hot label dominates a partition) and one label-keyed shuffle for
    the second moment; both are map-side-combinable partial
    aggregates. The dispersion identity avoids re-joining N vectors
    against centroids entirely.
    """
    register_tables(spark, sf_dir, ("embeddings",))
    return spark.sql(_centroid_stats_sql(_CENTROID_ELEMS_SPARK))


def _range_search_sql(dialect: str) -> str:
    """Cosine range search, shared SQL shape: every corpus vector within
    cosine >= threshold of any probe (vec_id < 8), self excluded."""
    dot = spark_dot if dialect == "spark" else duck_dot
    norm = spark_norm if dialect == "spark" else duck_norm
    return f"""
WITH n AS (SELECT vec_id, embedding, {norm('embedding')} AS nrm FROM embeddings),
q AS (SELECT vec_id AS q_id, embedding AS q_emb, nrm AS q_nrm FROM n
      WHERE vec_id < {_N_QUERIES}),
scored AS (
  SELECT q_id, n.vec_id AS neighbor_id,
         round({dot('q_emb', 'n.embedding')} / (q_nrm * n.nrm), 6) AS cos
  FROM q CROSS JOIN n WHERE q_id <> n.vec_id)
SELECT q_id, neighbor_id, cos
FROM scored WHERE cos >= {_RANGE_TAU}
ORDER BY q_id, neighbor_id
"""


_RANGE_TAU = 0.3  # calibrated: a handful of true neighbors per probe at test SFs


@query("sim_range_search", oracle=_range_search_sql("duck"))
def sim_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine RANGE search (all neighbors with cos >= tau), the other
    standard ANN API next to top-k: dedup thresholds, near-duplicate
    retrieval, and radius queries use this shape.

    Scale: identical posture to sim_topk_bruteforce — the 8-row probe
    side broadcasts, the corpus never shuffles, and the threshold
    filter drops pairs map-side before any exchange; the LSH bucketed
    variant (sim_range_search_lsh below) bounds the candidate set when
    |Q| grows. Thresholding on the ROUNDED cosine keeps the boundary
    decision identical in both engines.
    """
    # r12: small-input spread (guide §2.5) — interleaved steady A/B -0.18/-0.14 s
    register_tables(spark, sf_dir, ("embeddings",), spread=("embeddings",))
    return spark.sql(_range_search_sql("spark"))


def _range_lsh_sql(base_sql: str, q_clause: str) -> str:
    """Rewrite the multi-probe LSH top-k query into a RANGE search:
    same bucketed candidate generation (own bucket + one-bit flips),
    but the tail keeps every candidate with cos >= tau instead of
    ranking — no window stage at all."""
    s = _lsh_multiprobe_sql(base_sql, q_clause)
    head, _, _ = s.partition("ranked AS")
    head = head.rstrip().rstrip(",")
    return (
        head
        + f"\nSELECT q_id, neighbor_id, cos FROM scored"
        + f" WHERE cos >= {_RANGE_TAU} ORDER BY q_id, neighbor_id"
    )


@query("sim_range_search_lsh", oracle=_range_lsh_sql(_lsh_duck(), _Q_MULTI_DUCK))
def sim_range_search_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed cosine range search — the scale path for radius
    queries: candidates come only from each probe's own bucket plus
    its 8 one-bit-flip neighbors, then the exact cosine threshold
    filters map-side. This turns the brute-force |Q|x|C| cross join
    into a bucket equi-join whose pair work is the sum of probed
    bucket sizes — the same candidate-bounding sim_topk_lsh uses, now
    exercised for the range API (VERDICT r3 polish #6: the docstring
    claim becomes a registered, oracle-paired query).

    Scale: bucket assignment is a map-only expression over the corpus
    (computed once per scan); the probe side explodes 8 rows x 9
    buckets; the join broadcasts that 72-row side, so the corpus
    never shuffles and no window stage runs (unlike top-k, range
    needs no per-query ranking). Recall tuning = plane count and
    probe radius, both plan-shape preserving.
    """
    register_tables(spark, sf_dir, ("embeddings",))
    return spark.sql(_range_lsh_sql(_lsh_spark(), _Q_MULTI_SPARK))


# ---------------------------------------------------------------------------
# Matryoshka-style truncation audit: recall@k of half-dimension cosine
# ---------------------------------------------------------------------------


def _trunc_recall_sql(dialect: str, fused: bool = False) -> str:
    """Per probe: how much of the exact full-dim (64) top-k survives
    when cosine runs on the first 32 dimensions only. ``fused`` as in
    :func:`_quant_recall_sql`."""
    if dialect == "spark":
        dot, norm = spark_dot, spark_norm
        half = "slice(embedding, 1, 32)"
    else:
        dot, norm = duck_dot, duck_norm
        half = "embedding[1:32]"
    return f"""
WITH n AS (
  SELECT vec_id, embedding, {norm('embedding')} AS nrm,
         {half} AS emb_h
  FROM embeddings),
nh AS (SELECT vec_id, embedding, nrm, emb_h, {norm('emb_h')} AS nrm_h FROM n),
q AS (SELECT vec_id AS q_id, embedding AS q_emb, nrm AS q_nrm,
             emb_h AS q_emb_h, nrm_h AS q_nrm_h
      FROM nh WHERE vec_id < {_N_QUERIES}),
scored AS (
  SELECT q_id, nh.vec_id AS neighbor_id,
         round({dot('q_emb', 'nh.embedding')} / (q_nrm * nh.nrm), 6) AS cos_full,
         round({dot('q_emb_h', 'nh.emb_h')} / (q_nrm_h * nh.nrm_h), 6) AS cos_half
  FROM q CROSS JOIN nh WHERE q_id <> nh.vec_id),
{_recall_tail("cos_half") if fused else _RECALL_JOIN_TAIL.format(alt="cos_half")}"""


_RECALL_JOIN_TAIL = f"""
rf AS (SELECT q_id, neighbor_id,
              row_number() OVER (PARTITION BY q_id ORDER BY cos_full DESC, neighbor_id) AS r
       FROM scored),
rq AS (SELECT q_id, neighbor_id,
              row_number() OVER (PARTITION BY q_id ORDER BY {{alt}} DESC, neighbor_id) AS r
       FROM scored)
SELECT f.q_id,
       CAST(count(h.neighbor_id) AS BIGINT) AS n_kept,
       CAST(count(h.neighbor_id) AS DOUBLE) / {_TOP_K} AS recall_at_{_TOP_K}
FROM rf f
LEFT JOIN rq h ON h.q_id = f.q_id AND h.neighbor_id = f.neighbor_id
              AND h.r <= {_TOP_K}
WHERE f.r <= {_TOP_K}
GROUP BY f.q_id
ORDER BY f.q_id
"""


def _recall_tail(alt: str) -> str:
    """Fused recall readout (round 12, guide §2.4): the two rankings
    are per-row attributes of the SAME scored row, so one projection
    with two row_numbers over the SAME partition key (one shuffle, two
    sorts) replaces the rf/rq self-join — which, as two CTE consumers,
    made Spark re-execute the whole scored cross-join for each side.
    count(CASE WHEN r_alt <= k) over the r_full <= k rows is exactly
    the old LEFT-JOIN match count: each (q_id, neighbor) pair has one
    row, so the join matched 0 or 1 rows per f-row."""
    return f"""
ranked AS (
  SELECT q_id,
         row_number() OVER (PARTITION BY q_id ORDER BY cos_full DESC, neighbor_id)
           AS r_full,
         row_number() OVER (PARTITION BY q_id ORDER BY {alt} DESC, neighbor_id)
           AS r_alt
  FROM scored)
SELECT q_id,
       CAST(count(CASE WHEN r_alt <= {_TOP_K} THEN 1 END) AS BIGINT) AS n_kept,
       CAST(count(CASE WHEN r_alt <= {_TOP_K} THEN 1 END) AS DOUBLE) / {_TOP_K}
         AS recall_at_{_TOP_K}
FROM ranked
WHERE r_full <= {_TOP_K}
GROUP BY q_id
ORDER BY q_id
"""


def _quant_recall_sql(dialect: str, fused: bool = False) -> str:
    """Per probe: how much of the exact float top-k survives when the
    index is int8 (normalize, scale by 127, round) and candidates rank
    by the INTEGER dot product of the codes. ``fused`` switches the
    readout to :func:`_recall_tail` (Spark side only; the oracle keeps
    the join form)."""
    if dialect == "spark":
        dot, norm = spark_dot, spark_norm
        q8 = "transform(embedding, v -> bigint(round(v * 127.0D / nrm)))"
        idot = (
            "aggregate(zip_with(q_q8, nh.q8, (a, b) -> a * b), 0L,"
            " (acc, v) -> acc + v)"
        )
    else:
        dot, norm = duck_dot, duck_norm
        q8 = "list_transform(embedding, v -> round(v * 127.0 / nrm)::BIGINT)"
        idot = (
            "list_reduce(list_prepend(0::BIGINT,"
            " list_transform(range(1, len(q_q8) + 1), i -> q_q8[i] * nh.q8[i])),"
            " (acc, v) -> acc + v)"
        )
    return f"""
WITH n AS (
  SELECT vec_id, embedding, {norm('embedding')} AS nrm FROM embeddings),
nh AS (SELECT vec_id, embedding, nrm, {q8} AS q8 FROM n),
q AS (SELECT vec_id AS q_id, embedding AS q_emb, nrm AS q_nrm, q8 AS q_q8
      FROM nh WHERE vec_id < {_N_QUERIES}),
scored AS (
  SELECT q_id, nh.vec_id AS neighbor_id,
         round({dot('q_emb', 'nh.embedding')} / (q_nrm * nh.nrm), 6) AS cos_full,
         {idot} AS dot_q8
  FROM q CROSS JOIN nh WHERE q_id <> nh.vec_id),
{_recall_tail("dot_q8") if fused else _RECALL_JOIN_TAIL.format(alt="dot_q8")}"""


@query("sim_quantized_recall", oracle=_quant_recall_sql("duck"))
def sim_quantized_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8-quantization audit: recall@10 when the ANN index stores
    codes q_i = round(127·x_i/‖x‖) and ranks by the integer dot of the
    codes — the 4×-smaller (and SIMD-friendlier) index every 100 TB
    vector deployment ends up running, priced here per probe against
    the exact float top-10 (companion to sim_truncation_recall, which
    prices cutting DIMENSIONS instead of PRECISION).

    Determinism: the quantized ranking key is an exact INTEGER dot
    (ties on neighbor_id); the float ranking rounds to 6 dp as usual;
    both rankings come from one scored pass. Quantization itself is
    round-half-away-from-zero in both engines, and a ratio landing
    exactly on .5 is measure-zero for float inputs.

    Scale: same broadcast shape as sim_topk_bruteforce — the 8-row
    probe side broadcasts, the corpus is scanned once and never
    shuffles; at deployment the q8 column is the materialized index
    and the float column stays in cold storage for re-ranking only.
    """
    # r12: small-input spread (guide §2.5) — interleaved steady A/B -0.64/-0.51 s
    register_tables(spark, sf_dir, ("embeddings",), spread=("embeddings",))
    # r12: fused two-window readout — see _recall_tail (scored cross-
    # join executes once instead of twice; rf/rq join removed)
    return spark.sql(_quant_recall_sql("spark", fused=True))


@query("sim_truncation_recall", oracle=_trunc_recall_sql("duck"))
def sim_truncation_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style truncation audit: recall@10 of half-dimension
    (32 of 64) cosine against the exact full-dimension top-10, per
    probe — the number that says whether you can cut your ANN index
    (and its shuffle volume) in half before you rebuild it at 100 TB.

    Scale: same broadcast shape as sim_topk_bruteforce (8-row probe
    side, corpus never shuffles); both rankings come from ONE scored
    pass (full + half cosine computed together), and the recall join
    operates on two k-bounded rank tables. Ties break on neighbor_id
    in both rankings, so the k-cut is engine-identical.
    """
    register_tables(spark, sf_dir, ("embeddings",))
    # r12: fused two-window readout — see _recall_tail
    return spark.sql(_trunc_recall_sql("spark", fused=True))


_PCA_ELEMS_SPARK = """
  SELECT vec_id, i, CAST(element_at(embedding, i) AS DOUBLE) AS x
  FROM embeddings LATERAL VIEW explode(sequence(1, size(embedding))) t AS i"""
_PCA_ELEMS_DUCK = """
  SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
  FROM (SELECT vec_id, embedding,
               unnest(range(1, len(embedding) + 1)) AS i FROM embeddings)"""


def _pca_sql(elems: str) -> str:
    """Two matrix-free power iterations for the top principal
    direction, shared across dialects. Every cross-row reduction goes
    through the exact-DECIMAL pattern (emb_centroid_stats precedent),
    so both engines compute identical iterates bit-for-bit; v0 is the
    uniform direction with 1/8 = 2^-3 exact."""
    return f"""
WITH dims AS ({elems}),
s1 AS (  -- per-row projection onto v0 = (0.125, ..., 0.125)
  SELECT vec_id,
         CAST(sum(CAST(x * 0.125 AS DECIMAL(28,18))) AS DOUBLE) AS s
  FROM dims GROUP BY vec_id),
t1 AS (  -- t1 = X^T (X v0), exact per-dimension accumulation
  SELECT d.i,
         CAST(sum(CAST(d.x * s1.s AS DECIMAL(28,18))) AS DOUBLE) AS t
  FROM dims d JOIN s1 ON d.vec_id = s1.vec_id
  GROUP BY d.i),
n1 AS (SELECT CAST(sum(CAST(t * t AS DECIMAL(38,24))) AS DOUBLE) AS nsq FROM t1),
v1 AS (SELECT i, t / sqrt(nsq) AS v FROM t1 CROSS JOIN n1),
s2 AS (  -- per-row projection onto v1
  SELECT d.vec_id,
         CAST(sum(CAST(d.x * v1.v AS DECIMAL(28,18))) AS DOUBLE) AS s
  FROM dims d JOIN v1 ON d.i = v1.i
  GROUP BY d.vec_id),
t2 AS (
  SELECT d.i,
         CAST(sum(CAST(d.x * s2.s AS DECIMAL(28,18))) AS DOUBLE) AS t
  FROM dims d JOIN s2 ON d.vec_id = s2.vec_id
  GROUP BY d.i),
n2 AS (SELECT CAST(sum(CAST(t * t AS DECIMAL(38,24))) AS DOUBLE) AS nsq FROM t2)
SELECT t2.i AS dim,
       CAST(round(t2.t / sqrt(n2.nsq), 6) AS DOUBLE) AS loading,
       CAST(round(sqrt(n2.nsq), 6) AS DOUBLE) AS rayleigh_norm
FROM t2 CROSS JOIN n2
ORDER BY dim
"""


def _pca_spark_staged(spark: SparkSession, elems: str) -> DataFrame:
    """The Spark execution of :func:`_pca_sql`, staged at the two
    64-row iterates (round 12, guide §2.4/§5). As ONE statement,
    Spark's CTE inlining re-expands every reference, and the chain
    v0→t1→v1→t2 makes that EXPONENTIAL: the final SELECT's two t2
    references each inline s2, which inlines v1, which inlines t1
    twice (t1 + n1), which inlines dims... — 12 scans of embeddings
    and 12 explodes in the physical plan for a 2-iteration power
    method whose floor is 4 passes (2 per iteration). Pinning each
    iterate (64 rows — an instant eager localCheckpoint) cuts the
    chain: dims is re-derived exactly twice per iteration and nothing
    else re-executes. Values are bit-identical: every cross-row
    reduction is the exact-DECIMAL pattern (order-free), and the pin
    is a materialization barrier, not a semantic change. pin_view
    releases the previous run's blocks (at most one live copy per
    view; hygiene gated in tests/test_cache_hygiene.py)."""
    from sparksql_server_spark.operators.scratch import pin_view

    t1 = spark.sql(f"""
WITH dims AS ({elems}),
s1 AS (  -- per-row projection onto v0 = (0.125, ..., 0.125)
  SELECT vec_id,
         CAST(sum(CAST(x * 0.125 AS DECIMAL(28,18))) AS DOUBLE) AS s
  FROM dims GROUP BY vec_id)
SELECT d.i,
       CAST(sum(CAST(d.x * s1.s AS DECIMAL(28,18))) AS DOUBLE) AS t
FROM dims d JOIN s1 ON d.vec_id = s1.vec_id
GROUP BY d.i""")
    pin_view(spark, t1, "pca_t1")
    t2 = spark.sql(f"""
WITH n1 AS (SELECT CAST(sum(CAST(t * t AS DECIMAL(38,24))) AS DOUBLE) AS nsq
            FROM pca_t1),
v1 AS (SELECT i, t / sqrt(nsq) AS v FROM pca_t1 CROSS JOIN n1),
dims AS ({elems}),
s2 AS (  -- per-row projection onto v1
  SELECT d.vec_id,
         CAST(sum(CAST(d.x * v1.v AS DECIMAL(28,18))) AS DOUBLE) AS s
  FROM dims d JOIN v1 ON d.i = v1.i
  GROUP BY d.vec_id)
SELECT d.i,
       CAST(sum(CAST(d.x * s2.s AS DECIMAL(28,18))) AS DOUBLE) AS t
FROM dims d JOIN s2 ON d.vec_id = s2.vec_id
GROUP BY d.i""")
    pin_view(spark, t2, "pca_t2")
    return spark.sql("""
WITH n2 AS (SELECT CAST(sum(CAST(t * t AS DECIMAL(38,24))) AS DOUBLE) AS nsq
            FROM pca_t2)
SELECT i AS dim,
       CAST(round(t / sqrt(nsq), 6) AS DOUBLE) AS loading,
       CAST(round(sqrt(nsq), 6) AS DOUBLE) AS rayleigh_norm
FROM pca_t2 CROSS JOIN n2
ORDER BY dim""")


@query("emb_pca_power_iteration", oracle=_pca_sql(_PCA_ELEMS_DUCK))
def emb_pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal direction of the embedding cloud by TWO matrix-
    free power iterations — v <- X^T(Xv), normalize — entirely as
    dataflow: the iterate is a 64-row relation, the data is touched
    as (vec_id, dim, x) triples, and no Gram matrix is ever formed.
    Output: the 64 loadings of the second iterate plus its Rayleigh
    norm (the dominant-eigenvalue estimate the driver loop of a full
    PCA would watch for convergence). The variance-dominant direction
    is the embedding-curation primitive behind whitening, outlier
    scoring, and the 'dominant cluster' diagnostics of SemDeDup-style
    pipelines.

    Determinism: every cross-row reduction (projections, per-dim
    accumulations, norms) goes through the exact-DECIMAL cast-sum
    pattern, so iteration order cannot perturb the iterate; remaining
    float ops (divide, sqrt, one rounded output) are IEEE-identical.
    v0 = uniform/8 with 0.125 exact in binary.

    Scale: per iteration — one (vec_id)-keyed aggregation (the
    projection), one (dim)-keyed aggregation (the accumulation), and
    a broadcast of the 64-row iterate; cost is 2 passes over the
    triples per iteration with combinable partial aggregates, the
    textbook distributed power method. Fixed 2 iterations keep the
    plan straight-line for the oracle (graph_pagerank_entities
    convention); a production loop adds localCheckpoint rounds, not a
    new shape.

    Round 12: Spark executes the SAME algebra staged at the pinned
    64-row iterates (:func:`_pca_spark_staged` — the one-statement
    form re-inlined the chain exponentially into 12 embedding scans;
    staged is the 4-pass floor). The oracle keeps the one-statement
    text.
    """
    register_tables(spark, sf_dir, ("embeddings",))
    return _pca_spark_staged(spark, _PCA_ELEMS_SPARK)
