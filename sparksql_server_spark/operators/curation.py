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
    duck_char_hash,
    duck_words,
    spark_char_hash,
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
    pred = _langid_sql(dialect, words_expr)
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


_DSIR_TARGET = "src0"  # the high-quality target domain
_DSIR_TOP = 30


def _dsir_sql(dialect: str) -> str:
    """Shared shape: unigram counts for the target domain vs the raw
    pool, add-one-smoothed log-likelihood ratio per term, and each raw
    document's mean per-token LLR (its DSIR importance weight)."""
    if dialect == "spark":
        words = spark_words("text")
        ex = "SELECT doc_id, source, term FROM w LATERAL VIEW explode(w) t AS term"
    else:
        words = duck_words("text")
        ex = "SELECT doc_id, source, unnest(w) AS term FROM w"
    return f"""
WITH w AS (SELECT doc_id, source, {words} AS w FROM documents),
terms AS ({ex}),
tf AS (SELECT doc_id, source, term, CAST(count(*) AS BIGINT) AS n
       FROM terms GROUP BY doc_id, source, term),
lm AS (SELECT term,
              CAST(sum(CASE WHEN source = '{_DSIR_TARGET}' THEN n ELSE 0 END)
                   AS BIGINT) AS t_cnt,
              CAST(sum(CASE WHEN source <> '{_DSIR_TARGET}' THEN n ELSE 0 END)
                   AS BIGINT) AS r_cnt
       FROM tf GROUP BY term),
tot AS (SELECT CAST(sum(t_cnt) AS BIGINT) AS t_tot,
               CAST(sum(r_cnt) AS BIGINT) AS r_tot,
               CAST(count(*) AS BIGINT) AS v
        FROM lm),
llr AS (SELECT term,
               ln((CAST(t_cnt AS DOUBLE) + 1) / (t_tot + v))
                 - ln((CAST(r_cnt AS DOUBLE) + 1) / (r_tot + v)) AS lam
        FROM lm CROSS JOIN tot)
SELECT tf.doc_id,
       CAST(sum(tf.n) AS BIGINT) AS n_tokens,
       CAST(round(sum(tf.n * llr.lam) / sum(tf.n), 6) AS DOUBLE)
         AS importance_llr
FROM tf JOIN llr ON tf.term = llr.term
WHERE tf.source <> '{_DSIR_TARGET}'
GROUP BY tf.doc_id
ORDER BY importance_llr DESC, doc_id
LIMIT {_DSIR_TOP}
"""


@query("pipeline_dsir_importance", oracle=_dsir_sql("duck"))
def pipeline_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection (Xie et al. 2023): score every raw
    document by the log-likelihood ratio of its tokens under a TARGET
    domain's unigram model vs the RAW pool's model (add-one smoothed),
    normalize by length, and keep the top scorers — importance
    resampling that shifts the pretraining mixture toward the target
    distribution without a trained classifier. Target here is the
    'src0' source; the top 30 most-target-like raw documents surface.

    Determinism: counts are exact integers; lam is ln() of exact
    ratios; the per-doc reduction sums dozens of O(1) doubles (error
    ~1e-15, far under the 6-dp round) — the text_unigram_surprisal
    precedent, driver-green since round 4.

    Scale: tf is one explode + (doc, term) groupBy; the two LMs are
    ONE combinable aggregate over tf keyed by term (not a pass per
    domain); tot is a 1-row cross join; scoring joins tf against the
    term-keyed LLR table — at 100 TB the llr relation is the persisted
    importance model (vocabulary-sized, broadcast), and new raw
    batches score against it map-side without touching the corpus
    again, the same incremental shape as dedup_incremental_lsh.
    """
    register_tables(spark, sf_dir, ("documents",))
    return spark.sql(_dsir_sql("spark"))


_CHUNK_W = 32  # chunk width (words)
_CHUNK_S = 24  # stride => 8-word overlap between consecutive chunks


def _chunk_sql(dialect: str) -> str:
    """Shared shape: per doc, chunk starts 1, 1+S, 1+2S, ... covering
    every word (last chunk may be short); each chunk row carries its
    word span and a portable rolling hash of its text."""
    n_chunks = f"CASE WHEN nw <= {_CHUNK_W} THEN 1 ELSE CAST(ceil(CAST(nw - {_CHUNK_W} AS DOUBLE) / {_CHUNK_S}) AS INT) + 1 END"
    if dialect == "spark":
        words = spark_words("text")
        gen = (
            f"SELECT doc_id, nw, k FROM w "
            f"LATERAL VIEW explode(sequence(1, {n_chunks})) t AS k"
        )
        slice_ = f"slice(w, ({_CHUNK_S} * (k - 1)) + 1, {_CHUNK_W})"
        joined = "array_join(cw, ' ')"
    else:
        words = duck_words("text")
        gen = f"SELECT doc_id, nw, unnest(range(1, ({n_chunks}) + 1)) AS k FROM w"
        slice_ = f"list_slice(w, ({_CHUNK_S} * (k - 1)) + 1, ({_CHUNK_S} * (k - 1)) + {_CHUNK_W})"
        joined = "array_to_string(cw, ' ')"
    hash_fn = spark_char_hash if dialect == "spark" else duck_char_hash
    return f"""
WITH w0 AS (SELECT doc_id, {words} AS w FROM documents),
w AS (SELECT doc_id, w, CAST({'size(w)' if dialect == 'spark' else 'len(w)'} AS INT) AS nw FROM w0),
ks AS ({gen}),
chunks AS (
  SELECT ks.doc_id, ks.k, {slice_} AS cw
  FROM ks JOIN w ON ks.doc_id = w.doc_id),
txt AS (SELECT doc_id, k, {joined} AS chunk_text,
               CAST({'size(cw)' if dialect == 'spark' else 'len(cw)'} AS BIGINT) AS n_words
        FROM chunks)
SELECT doc_id, CAST(k AS INT) AS chunk_idx, n_words,
       CAST({hash_fn('chunk_text')} AS BIGINT) AS chunk_hash
FROM txt
"""


@query("pipeline_chunk_overlap", oracle=_chunk_sql("duck"))
def pipeline_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping-window chunking — the RAG / context-packing
    primitive: split each document into 32-word chunks with stride 24
    (8-word overlap so no boundary sentence is lost), emitting stable
    (doc_id, chunk_idx) ids, per-chunk lengths, and a portable content
    hash (the chunk-level dedup / index key). Every word lands in at
    least one chunk; the last chunk may run short.

    Determinism: pure integer pipeline — chunk count from integer
    ceil, slices, counts, and the polynomial rolling hash; zero float
    columns in the output.

    Scale: map-only modulo the self-equi-join on doc_id that pairs
    each chunk index with its word array (Catalyst keeps it a local
    join since both sides share the w CTE's partitioning; at 100 TB
    this is the one shape where mapInPandas wins — one pass, no join —
    and the swap is local to this operator). Chunk explosion is
    bounded at ~nw/24 rows per doc — linear inflation, no shuffle
    keyed on anything coarser than doc_id.
    """
    # r12: small-input spread (guide §2.5) — interleaved steady A/B -0.38/-0.43 s
    register_tables(spark, sf_dir, ("documents",), spread=("documents",))
    return spark.sql(_chunk_sql("spark"))


def _manifest_sql(dialect: str) -> str:
    """Shared shape: per-(source, lang) order-insensitive content
    address (xor + modular sum of per-doc content hashes) and corpus
    totals; a global manifest row rides along via GROUPING SETS."""
    h = spark_char_hash("text") if dialect == "spark" else duck_char_hash("text")
    return f"""
WITH d AS (
  SELECT source, lang,
         {h} AS content_hash,
         n_chars
  FROM documents),
m AS (
  SELECT source, lang,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_chars) AS BIGINT) AS n_chars,
         CAST(bit_xor(content_hash) AS BIGINT) AS xor_hash,
         CAST(CAST(sum(CAST(content_hash AS DECIMAL(38,0))) AS DECIMAL(38,0))
              % 1000000007 AS BIGINT) AS sum_hash,
         CAST(grouping(source) AS INT) AS is_total
  FROM d
  GROUP BY GROUPING SETS ((source, lang), ()))
SELECT CASE WHEN is_total = 1 THEN '*' ELSE source END AS source,
       CASE WHEN is_total = 1 THEN '*' ELSE lang END AS lang,
       n_docs, n_chars, xor_hash, sum_hash
FROM m
"""


@query("pipeline_corpus_manifest", oracle=_manifest_sql("duck"))
def pipeline_corpus_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-addressed corpus manifest — the provenance primitive a
    training pipeline versions datasets by: per (source, lang) and for
    the whole corpus (the GROUPING SETS total row), the doc count,
    byte count, and TWO order-insensitive content addresses (xor and
    modular sum of per-document content hashes — two independent
    folds so a swapped pair of edits cannot collide both). Two corpus
    snapshots are byte-identical in content iff their manifests match,
    with no ordering or partitioning sensitivity; a changed partition
    is localized by its (source, lang) row. The corpus-total row is
    marked by GROUPING(), not a NULL-coalesce, so a genuine NULL
    source can never impersonate it; the modular sum accumulates in
    DECIMAL(38,0) (exact past 1e29 documents) before the fold, so
    ANSI BIGINT can never overflow mid-aggregate and both engines
    agree at any corpus size.

    Determinism: the portable rolling hash and integer folds — xor
    and modular sum are associative-commutative, so ANY aggregation
    order gives the same address (the point of the design).

    Scale: one map-only hash pass + one combinable aggregation; the
    per-group addresses fold across shards/days by xor/sum-mod, so
    incremental ingestion updates the manifest from partials — the
    same mergeable-state shape as the sketch set, applied to
    provenance. GROUPING SETS shares the scan between the group rows
    and the corpus row.
    """
    register_tables(spark, sf_dir, ("documents",))
    return spark.sql(_manifest_sql("spark"))
