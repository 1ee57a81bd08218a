"""Dataset-curation operators: split assignment, length histograms,
language-ID evaluation, hard-negative mining, churn cohorts.

The ops a training-data pipeline runs AFTER filtering/dedup to turn a
corpus into training artifacts: deterministic train/val/test splits,
length-distribution audits, a confusion matrix for the language-ID
heuristic, and contrastive hard negatives from the embedding space.
All map-only or single-shuffle shapes; the split/bucket assignments
use the portable multiplicative hash (sampling.py convention) so a
re-run — on either engine — reproduces membership exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparksql_server_spark.catalog import register_tables, table
from sparksql_server_spark.functions.portable import (
    duck_words,
    spark_words,
)
from sparksql_server_spark.functions.vector import (
    duck_dot,
    duck_norm,
    spark_dot,
    spark_norm,
)
from sparksql_server_spark.operators.registry import query
from sparksql_server_spark.operators.text_analysis import _langid_sql

# sampling.py's Knuth multiplicative mix — max key × 2654435761 stays
# far inside BIGINT on both engines
_MIX = "((({k}) * 2654435761) % 2147483648)"


def _split_sql(dialect: str) -> str:
    words = spark_words("text") if dialect == "spark" else duck_words("text")
    size_w = "size(w)" if dialect == "spark" else "len(w)"
    band = _MIX.format(k="doc_id") + " % 100"
    return f"""
WITH w AS (SELECT doc_id, lang, {words} AS w FROM documents),
assigned AS (
  SELECT doc_id, lang, CAST({size_w} AS BIGINT) AS n_tokens,
         CASE WHEN {band} < 80 THEN 'train'
              WHEN {band} < 90 THEN 'val'
              ELSE 'test' END AS split
  FROM w),
grouped AS (
  SELECT lang, split,
         CAST(count(*) AS BIGINT)      AS n_docs,
         CAST(sum(n_tokens) AS BIGINT) AS total_tokens
  FROM assigned GROUP BY lang, split),
lang_tot AS (
  SELECT lang, CAST(sum(n_docs) AS DOUBLE) AS lang_docs
  FROM grouped GROUP BY lang)
SELECT g.lang, g.split, g.n_docs, g.total_tokens,
       g.n_docs / t.lang_docs AS share_within_lang
FROM grouped g JOIN lang_tot t ON g.lang = t.lang
ORDER BY g.lang, g.split
"""


@query("pipeline_train_val_test_split", oracle=_split_sql("duck"))
def pipeline_train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment by
    multiplicative hash of doc_id, audited per language: document and
    token counts per (lang, split) plus the realized within-language
    share (the number an eval-leakage review checks against the
    declared proportions).

    Scale: split assignment is row-local (map-only, reproducible
    across engines and reruns — no RNG, no TABLESAMPLE); the audit is
    one combinable aggregation over ≤ |langs|×3 groups, then a join
    against the |langs|-row totals (broadcast). The actual export
    reuses the same column: ``.write.partitionBy("split")`` — one
    shuffle, membership identical to this audit.
    """
    register_tables(spark, sf_dir, ("documents",))
    return spark.sql(_split_sql("spark"))


# power-of-two char-length buckets: integer compares only — no float
# log2 whose boundary could diverge between engines
_LEN_BUCKETS = (128, 256, 512, 1024, 2048)


def _len_hist_sql() -> str:
    cases = " ".join(
        f"WHEN n_chars < {b} THEN {prev}"
        for prev, b in zip((0,) + _LEN_BUCKETS, _LEN_BUCKETS)
    )
    return f"""
WITH bucketed AS (
  SELECT lang, n_chars,
         CAST(CASE {cases} ELSE {_LEN_BUCKETS[-1]} END AS BIGINT) AS bucket_lo
  FROM documents)
SELECT lang, bucket_lo,
       CAST(count(*) AS BIGINT)     AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM bucketed
GROUP BY lang, bucket_lo
ORDER BY lang, bucket_lo
"""


@query("text_length_histogram", oracle=_len_hist_sql())
def text_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language document-length histogram over power-of-two char
    buckets (the length-distribution panel of a dataset audit; the
    same buckets drive sequence-packing bin choices).

    Scale: bucket assignment is an integer CASE chain (map-only,
    no float log2 — bucket boundaries cannot diverge between
    engines); the histogram is one combinable aggregation over
    |langs| × |buckets| groups. Identical SQL text runs on both
    engines.
    """
    register_tables(spark, sf_dir, ("documents",))
    return spark.sql(_len_hist_sql())


def _confusion_sql(dialect: str, words_expr: str) -> str:
    pred = _langid_sql(dialect, words_expr).replace("ORDER BY doc_id", "")
    return f"""
WITH pred AS ({pred}),
joined AS (
  SELECT d.lang, p.pred_lang
  FROM documents d JOIN pred p ON d.doc_id = p.doc_id),
cells AS (
  SELECT lang, pred_lang, CAST(count(*) AS BIGINT) AS n
  FROM joined GROUP BY lang, pred_lang),
row_tot AS (SELECT lang, CAST(sum(n) AS DOUBLE) AS total FROM cells GROUP BY lang)
SELECT c.lang, c.pred_lang, c.n, c.n / t.total AS row_share
FROM cells c JOIN row_tot t ON c.lang = t.lang
ORDER BY c.lang, c.pred_lang
"""


@query(
    "text_langid_confusion",
    oracle=_confusion_sql("duck", duck_words("text")),
)
def text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the stopword language-ID heuristic against
    the labeled ``lang`` column: per (true, predicted) cell count and
    row share — the precision/recall audit a pipeline publishes before
    trusting a classifier to route 100 TB.

    Scale: prediction is the same map-only scoring pass as
    text_langid; the join is on doc_id (co-partitioned single
    shuffle), and the matrix itself is |langs|² rows. The heuristic's
    honest weakness shows in the matrix: zh has no Latin stopword
    lexicon, so its row concentrates in 'unk' — exactly what the
    audit exists to reveal.
    """
    register_tables(spark, sf_dir, ("documents",))
    return spark.sql(_confusion_sql("spark", spark_words("text")))


_N_QUERIES = 8  # probe vectors, similarity.py convention
_NEG_LO, _NEG_HI = 0.05, 0.35  # the hard-negative cosine band
_NEG_K = 5


def _hard_neg_sql(dialect: str) -> str:
    dot = spark_dot if dialect == "spark" else duck_dot
    norm = spark_norm if dialect == "spark" else duck_norm
    cast_rank = (
        "CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id) AS BIGINT)"
        if dialect == "spark"
        else "row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id)"
    )
    return f"""
WITH n AS (SELECT vec_id, embedding, {norm('embedding')} AS nrm FROM embeddings),
q AS (SELECT vec_id AS q_id, embedding AS q_emb, nrm AS q_nrm FROM n
      WHERE vec_id < {_N_QUERIES}),
banded AS (
  SELECT q_id, n.vec_id AS neighbor_id,
         round({dot('q_emb', 'n.embedding')} / (q_nrm * n.nrm), 6) AS cos
  FROM q CROSS JOIN n WHERE q_id <> n.vec_id),
ranked AS (
  SELECT q_id, neighbor_id, cos, {cast_rank} AS rank
  FROM banded WHERE cos >= {_NEG_LO} AND cos < {_NEG_HI})
SELECT q_id, neighbor_id, cos, rank FROM ranked
WHERE rank <= {_NEG_K}
ORDER BY q_id, rank
"""


@query("emb_hard_negatives", oracle=_hard_neg_sql("duck"))
def emb_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: per probe, the
    top-5 corpus vectors inside the cosine band [0.05, 0.35) — close
    enough to be informative negatives, far enough to not be
    paraphrases (the band edges are the knobs a retrieval-training
    pipeline tunes).

    Scale: same posture as sim_topk_bruteforce — the 8-row probe side
    broadcasts and the band filter runs map-side BEFORE the ranking
    window, so the window input is only the in-band sliver, not
    |Q|×|C|. Banding on the ROUNDED cosine keeps both band edges and
    rank ties engine-identical. At larger |Q| the candidate pass
    swaps to the LSH/IVF bucketed join (similarity.py) unchanged.
    """
    register_tables(spark, sf_dir, ("embeddings",))
    return spark.sql(_hard_neg_sql("spark"))


_CHURN_HOURS = 24  # calibrated: a real cohort exists at every test SF


def _churn_sql(dsum_expr: str) -> str:
    return f"""
WITH bounds AS (SELECT max(ts) AS max_ts FROM events),
per_user AS (
  SELECT user_id, max(ts) AS last_ts,
         CAST(count(*) AS BIGINT) AS n_events,
         {dsum_expr} AS total_value
  FROM events GROUP BY user_id)
SELECT u.user_id, u.last_ts, u.n_events, u.total_value
FROM per_user u CROSS JOIN bounds b
WHERE u.last_ts < b.max_ts - INTERVAL {_CHURN_HOURS} HOUR
ORDER BY u.user_id
"""


@query(
    "events_churned_users",
    oracle=_churn_sql("CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)"),
)
def events_churned_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Churn cohort: users with no activity in the trailing 24 hours
    of the observation window, with their lifetime event count and
    total value — the retention counterpart of events_dau_wau (who
    LEFT, not who stayed).

    Scale: one user_id-keyed combinable aggregation (the same single
    shuffle every behavioral query here shares), then a broadcast of
    the 1-row max-ts bound; no second pass over raw events. The value
    total goes through the exact-DECIMAL pattern so both engines
    report identical doubles.
    """
    register_tables(spark, sf_dir, ("events",))
    return spark.sql(_churn_sql("CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)"))


def _tok_pct_sql(dialect: str) -> str:
    words = spark_words("text") if dialect == "spark" else duck_words("text")
    size_w = "size(w)" if dialect == "spark" else "len(w)"
    intdiv = "div" if dialect == "spark" else "//"
    p50 = f"(50 * cnt + 99) {intdiv} 100"
    p90 = f"(90 * cnt + 99) {intdiv} 100"
    return f"""
WITH w AS (SELECT doc_id, lang, CAST({size_w} AS BIGINT) AS n_tokens
           FROM (SELECT doc_id, lang, {words} AS w FROM documents)),
ranked AS (
  SELECT lang, n_tokens,
         row_number() OVER (PARTITION BY lang ORDER BY n_tokens, doc_id) AS rn,
         count(*) OVER (PARTITION BY lang) AS cnt
  FROM w)
SELECT lang,
       CAST(max(cnt) AS BIGINT)                                    AS n_docs,
       CAST(max(CASE WHEN rn = {p50} THEN n_tokens END) AS BIGINT) AS p50_tokens,
       CAST(max(CASE WHEN rn = {p90} THEN n_tokens END) AS BIGINT) AS p90_tokens,
       CAST(max(CASE WHEN rn = cnt THEN n_tokens END) AS BIGINT)   AS max_tokens
FROM ranked GROUP BY lang
ORDER BY lang
"""


@query("text_token_percentiles", oracle=_tok_pct_sql("duck"))
def text_token_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-language token-count percentiles (p50/p90/max) via
    type-1 (ceiling) quantile ranks — the length panel a context-
    window budget review reads. Exact by construction: the target rank
    is integer arithmetic ((p*cnt + 99) intdiv 100), never a float
    interpolation whose midpoint could diverge between engines (the
    percentile_cont trap).

    Scale: one lang-keyed shuffle for the ranking window (combinable
    count rides the same partition), one tiny aggregation over ranked
    rows. At petabyte scale swap the exact window for the same rank
    math over per-partition histograms — the integer target-rank
    definition carries over unchanged.
    """
    register_tables(spark, sf_dir, ("documents",))
    return spark.sql(_tok_pct_sql("spark"))
