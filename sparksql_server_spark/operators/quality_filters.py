"""Pre-training corpus quality filters beyond the basic ratios in
``text_analysis`` — repetition statistics (the Gopher-rules family),
PII redaction, and TF-IDF salient-term extraction.

All three are documents-table pipelines whose only shuffles are keyed
on (doc_id, gram) / term — high-cardinality, well-distributed keys —
so they hold at 100 TB; the scoring arithmetic is integer counts and
single IEEE divisions/multiplications, which are bit-identical across
engines (no order-dependent double sums anywhere).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparksql_server_spark.catalog import register_tables
from sparksql_server_spark.operators.registry import query
from sparksql_server_spark.functions.portable import (
    duck_shingles,
    duck_words,
    spark_shingles,
    spark_words,
)


def _repetition_sql(dialect: str) -> str:
    """Shared shape: explode word 2-grams and 3-grams per document,
    count occurrences, then fold back to per-document repetition
    fractions. Fractions are double divisions of exact BIGINT counts
    — cross-engine deterministic."""
    if dialect == "spark":
        words = spark_words("text")
        bi = (
            "SELECT doc_id, gram FROM w "
            f"LATERAL VIEW explode({spark_shingles('w', 2)}) t AS gram"
        )
        tri = (
            "SELECT doc_id, gram FROM w "
            f"LATERAL VIEW explode({spark_shingles('w', 3)}) t AS gram"
        )
    else:
        words = duck_words("text")
        bi = (
            "SELECT doc_id, unnest("
            f"{duck_shingles('w', 2)}) AS gram FROM w"
        )
        tri = (
            "SELECT doc_id, unnest("
            f"{duck_shingles('w', 3)}) AS gram FROM w"
        )
    return f"""
WITH w AS (SELECT doc_id, {words} AS w FROM documents),
bi AS (SELECT doc_id, gram, count(*) AS n
       FROM ({bi}) g GROUP BY doc_id, gram),
tri AS (SELECT doc_id, gram, count(*) AS n
        FROM ({tri}) g GROUP BY doc_id, gram),
bi_doc AS (SELECT doc_id,
                  CAST(sum(n) AS BIGINT) AS n_bigrams,
                  CAST(max(n) AS BIGINT) AS top_bigram_n
           FROM bi GROUP BY doc_id),
tri_doc AS (SELECT doc_id,
                   CAST(sum(n) AS BIGINT) AS n_trigrams,
                   CAST(sum(CASE WHEN n > 1 THEN n ELSE 0 END) AS BIGINT)
                     AS dup_trigram_n
            FROM tri GROUP BY doc_id)
SELECT b.doc_id,
       b.n_bigrams,
       CAST(b.top_bigram_n AS DOUBLE) / CAST(b.n_bigrams AS DOUBLE)
         AS top_bigram_frac,
       t.n_trigrams,
       CAST(t.dup_trigram_n AS DOUBLE) / CAST(t.n_trigrams AS DOUBLE)
         AS dup_trigram_frac,
       b.top_bigram_n >= 3 OR
         CAST(t.dup_trigram_n AS DOUBLE) / CAST(t.n_trigrams AS DOUBLE) > 0.5
         AS flagged_repetitive
FROM bi_doc b JOIN tri_doc t ON b.doc_id = t.doc_id
"""


@query("text_repetition_stats", oracle=_repetition_sql("duck"))
def text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality signals in the Gopher-rules style:
    per-document top-bigram fraction (mass of the single most frequent
    word 2-gram) and duplicated-3-gram fraction (mass of 3-grams that
    occur more than once), plus a combined repetitive flag.

    Scale: two explode → groupBy(doc_id, gram) passes. The grams of a
    document are produced colocated, so the per-(doc, gram) count is a
    well-distributed shuffle (no hot keys — the key includes doc_id);
    the fold back to per-document stats shuffles on doc_id only. Both
    aggregations are map-side combinable. No double sums — the
    fractions divide exact BIGINT counts once.
    """
    register_tables(spark, sf_dir, ("documents",))
    return spark.sql(_repetition_sql("spark"))


# Deterministic synthetic PII: the corpus itself is PII-free, so the
# query plants a contact line derived from doc_id, then scrubs it —
# oracle-checkable end to end while exercising the real redaction
# expressions a production scrubber runs over raw text.
_EMAIL_RE = "[a-z0-9]+@[a-z0-9]+[.]com"
_PHONE_RE = "555-[0-9]{4}"
_IP_RE = "10[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}"


def _pii_sql(dialect: str) -> str:
    g = ", 'g'" if dialect == "duck" else ""
    substr = "substr" if dialect == "duck" else "substring"
    count_m = (
        (lambda pat: f"len(regexp_extract_all(raw, '{pat}'))")
        if dialect == "duck"
        else (lambda pat: f"size(regexp_extract_all(raw, '{pat}', 0))")
    )
    return f"""
WITH planted AS (
  SELECT doc_id,
         concat('contact user', CAST(doc_id AS BIGINT), '@mail',
                CAST(doc_id % 7 AS BIGINT), '.com or 555-',
                CAST(1000 + doc_id % 9000 AS BIGINT), ' at 10.0.',
                CAST(doc_id % 256 AS BIGINT), '.',
                CAST((doc_id * 37) % 256 AS BIGINT), ' :: ',
                {substr}(text, 1, 80)) AS raw
  FROM documents)
SELECT doc_id,
       regexp_replace(regexp_replace(regexp_replace(raw,
           '{_EMAIL_RE}', '<EMAIL>'{g}),
           '{_IP_RE}', '<IP>'{g}),
           '{_PHONE_RE}', '<PHONE>'{g}) AS scrubbed,
       CAST({count_m(_EMAIL_RE)} AS BIGINT) AS n_emails,
       CAST({count_m(_PHONE_RE)} AS BIGINT) AS n_phones,
       CAST({count_m(_IP_RE)} AS BIGINT)    AS n_ips
FROM planted
"""


@query("text_pii_scrub", oracle=_pii_sql("duck"))
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction: regex-replace emails, phone numbers, and IPv4
    addresses with typed placeholders, and count redactions per class
    (regexp_extract_all, so the audit trail is exact). The corpus has
    no real PII, so a deterministic contact line derived from doc_id
    is planted first — the scrub expressions are the production ones.

    Scale: pure map-only string expressions, whole-stage codegen, no
    shuffle, no Python. IP is scrubbed before phone so the overlap
    class (a phone-like suffix inside an address) is owned by one rule
    deterministically.
    """
    register_tables(spark, sf_dir, ("documents",))
    return spark.sql(_pii_sql("spark"))


_TOP_TERMS = 3


def _tfidf_sql(dialect: str, tf_from: str | None = None) -> str:
    """Shared shape: term frequencies per (doc, term), document
    frequencies per term, linear-idf score tf * (N / df), top-k terms
    per document by (score DESC, term ASC). ``tf_from`` names a
    pre-materialized (doc_id, term, tf) relation (see
    text_tfidf_topterms); None inlines the canonical build (the
    oracle's form).

    Linear idf (N/df, no log) keeps the score a product of one exact
    int→double division and one multiplication — bit-identical across
    engines, unlike ln() whose last-ulp rounding is not guaranteed to
    agree. Ranking is order-isomorphic to log idf for fixed N.
    """
    if dialect == "spark":
        words = spark_words("text")
        ex = "SELECT doc_id, term FROM w LATERAL VIEW explode(w) t AS term"
    else:
        words = duck_words("text")
        ex = "SELECT doc_id, unnest(w) AS term FROM w"
    if tf_from is not None:
        # pre-materialized (doc_id, term, tf) relation — the barrier
        # that stops Spark re-expanding the explode chain per consumer
        tf_ctes = f"tf AS (SELECT doc_id, term, tf FROM {tf_from})"
    else:
        tf_ctes = f"""w AS (SELECT doc_id, {words} AS w FROM documents),
terms AS ({ex}),
tf AS (SELECT doc_id, term, count(*) AS tf
       FROM terms GROUP BY doc_id, term)"""
    return f"""
WITH {tf_ctes},
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term,
         CAST(tf.tf AS BIGINT) AS tf,
         CAST(df.df AS BIGINT) AS df,
         CAST(tf.tf AS DOUBLE) *
           (CAST(n.n_docs AS DOUBLE) / CAST(df.df AS DOUBLE)) AS score
  FROM tf JOIN df ON tf.term = df.term CROSS JOIN n),
ranked AS (
  SELECT doc_id, term, tf, df, score,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, term) AS rnk
  FROM scored)
SELECT doc_id, CAST(rnk AS INT) AS rnk, term, tf, df, score
FROM ranked WHERE rnk <= {_TOP_TERMS}
"""


def _surprisal_sql(dialect: str, tf_from: str | None = None) -> str:
    """``tf_from`` as in :func:`_tfidf_sql` — tf feeds both the vocab
    aggregation (twice, transitively, through tot) and the final join,
    so the inline form re-runs the explode+groupBy per consumer (3
    documents scans); the Spark side pins tf once (round 12,
    interleaved A/B first-exec 5.0 → 2.3 s, steady a wash, 50 rows
    equal)."""
    if dialect == "spark":
        words = spark_words("text")
        ex = "SELECT doc_id, term FROM w LATERAL VIEW explode(w) t AS term"
    else:
        words = duck_words("text")
        ex = "SELECT doc_id, unnest(w) AS term FROM w"
    if tf_from is not None:
        tf_ctes = f"tf AS (SELECT doc_id, term, n FROM {tf_from})"
    else:
        tf_ctes = f"""w AS (SELECT doc_id, {words} AS w FROM documents),
terms AS ({ex}),
tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS n
       FROM terms GROUP BY doc_id, term)"""
    return f"""
WITH {tf_ctes},
vocab AS (SELECT term, CAST(sum(n) AS BIGINT) AS cnt FROM tf GROUP BY term),
tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_corpus FROM vocab)
SELECT tf.doc_id,
       CAST(sum(tf.n) AS BIGINT) AS n_tokens,
       CAST(round(sum(tf.n * -ln(CAST(vocab.cnt AS DOUBLE) / tot.n_corpus))
                  / sum(tf.n), 6) AS DOUBLE) AS mean_surprisal_nats
FROM tf JOIN vocab ON tf.term = vocab.term CROSS JOIN tot
GROUP BY tf.doc_id
ORDER BY mean_surprisal_nats DESC, tf.doc_id
LIMIT 50
"""


@query("text_unigram_surprisal", oracle=_surprisal_sql("duck"))
def text_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean token surprisal under the corpus's own
    unigram language model (-mean ln p(token)) — the cheap stand-in
    for the CCNet/KenLM perplexity quality filter: documents whose
    tokens are collectively improbable under the corpus distribution
    (gibberish, wrong-language, boilerplate-free noise) surface at the
    top of the cut list. Reported: top-50 most surprising documents.

    Determinism: counts are exact integers end-to-end; the only float
    work is ln() of exact ratios and one division, with the per-doc
    sum rounded to 6 dp before the ordering cut and doc_id breaking
    rounded ties (the events_user_entropy_topk precedent).

    Scale: tf is one explode + (doc_id, term) groupBy; vocab aggregates
    tf's combinable output to vocabulary size and joins back BROADCAST
    (vocabulary ≪ corpus); tot is a 1-row cross join. In production
    the vocab relation is the persisted LM — new batches score against
    it without re-counting the corpus (same incremental shape as
    dedup_lsh_incremental).

    Round 12: the Spark side pins tf once (text_tfidf_topterms's
    pattern) — CTE inlining re-ran the explode+groupBy for vocab, tot
    and the final join (3 documents scans → 1; see _surprisal_sql).
    """
    from sparksql_server_spark.operators.scratch import pin_view

    register_tables(spark, sf_dir, ("documents",))
    docs = spark.table("documents")
    w = docs.select("doc_id", F.expr(spark_words("text")).alias("w"))
    terms = w.select("doc_id", F.explode("w").alias("term"))
    pin_view(
        spark,
        terms.groupBy("doc_id", "term").agg(F.count("*").cast("bigint").alias("n")),
        "surprisal_tf_mat",
    )
    return spark.sql(_surprisal_sql("spark", tf_from="surprisal_tf_mat"))


_BM25_TERMS = ("scan", "hash", "merge")
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOP = 20


def _bm25_sql(dialect: str) -> str:
    """BM25 retrieval of the top documents for a fixed query-term set,
    with a LINEAR idf — (N - df + 0.5)/(df + 0.5), no ln() — so every
    per-term score is a chain of exact-input IEEE mul/div both engines
    compute bit-identically (same reasoning as _tfidf_sql; ln()'s
    last-ulp rounding is the one op with no cross-engine guarantee).
    The per-document sum over query terms goes through the
    exact-DECIMAL pattern to pin association order, and ranking sorts
    the ROUNDED score so a sub-6dp divergence can never flip the cut.
    """
    terms = ", ".join(f"'{t}'" for t in _BM25_TERMS)
    if dialect == "spark":
        words = spark_words("text")
        ex = "SELECT doc_id, term FROM w LATERAL VIEW explode(w) t AS term"
        dlen = "size(w)"
    else:
        words = duck_words("text")
        ex = "SELECT doc_id, unnest(w) AS term FROM w"
        dlen = "len(w)"
    return f"""
WITH w AS (SELECT doc_id, {words} AS w FROM documents),
dl AS (SELECT doc_id, CAST({dlen} AS DOUBLE) AS dl FROM w),
stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
                 CAST(sum(CAST(dl AS DECIMAL(18,6))) AS DOUBLE)
                   / count(*) AS avgdl
          FROM dl),
terms AS ({ex}),
tf AS (SELECT doc_id, term, count(*) AS tf
       FROM terms WHERE term IN ({terms}) GROUP BY doc_id, term),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
contrib AS (
  SELECT tf.doc_id,
         ((s.n_docs - df.df + 0.5) / (df.df + 0.5)) *
         ((tf.tf * ({_BM25_K1} + 1.0)) /
          (tf.tf + {_BM25_K1} * (1.0 - {_BM25_B}
                                 + {_BM25_B} * dl.dl / s.avgdl))) AS c
  FROM tf JOIN df ON tf.term = df.term
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats s),
scored AS (
  SELECT doc_id,
         round(CAST(sum(CAST(c AS DECIMAL(28,12))) AS DOUBLE), 6) AS bm25
  FROM contrib GROUP BY doc_id)
SELECT doc_id, bm25,
       CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS BIGINT) AS rnk
FROM (SELECT doc_id, bm25 FROM scored
      ORDER BY bm25 DESC, doc_id LIMIT {_BM25_TOP}) top
ORDER BY bm25 DESC, doc_id
"""


@query("text_bm25_retrieval", oracle=_bm25_sql("duck"))
def text_bm25_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 documents for a fixed keyword query under BM25 scoring
    (k1=1.2, b=0.75; linear idf for cross-engine exactness — the
    ranking-relevant monotonicity in df is preserved per term). The
    retrieval primitive a training-data pipeline uses for targeted
    corpus slicing ("pull documents about X") and for decontamination
    lookups.

    Scale: tokenize → tf is one explode + groupBy keyed by (doc_id,
    term) with the IN-list predicate pushed below the aggregation, so
    only query-term postings ever shuffle (the classic inverted-index
    access path, expressed relationally); df aggregates tf's tiny
    output; dl/stats are document-count-sized; the final top-k is a
    TakeOrdered over |matching docs| — the rank column is computed by
    a window AFTER the LIMIT, over 20 rows, never a global
    single-partition window over every scored document (r7: the
    pre-LIMIT global row_number was the one serial construct here).
    At 100 TB the only large shuffle is the postings aggregation,
    proportional to query-term frequency, not corpus size.
    """
    register_tables(spark, sf_dir, ("documents",))
    return spark.sql(_bm25_sql("spark"))


@query("text_tfidf_topterms", oracle=_tfidf_sql("duck"))
def text_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salient-term extraction: top-3 terms per document by TF-IDF
    with a linear idf (tf * N/df) and a deterministic (score, term)
    tie-break.

    Scale: tf is an explode → groupBy(doc_id, term) (key includes
    doc_id — well distributed); df aggregates tf's output (map-side
    combinable, vocabulary-sized result) and joins back broadcast
    (vocabulary ≪ corpus); the top-k window partitions by doc_id and
    runs under WindowGroupLimit (Partial before the exchange, Final
    after — gated in tests/test_plans.py). The `n` side is a 1-row
    broadcast cross join.

    Round-8 plan rework (VERDICT r7 ask #7 — ×10 exponent 0.64, the
    corpus's second-worst): as pure CTE text Spark re-expanded the
    explode → groupBy(doc_id, term) chain for BOTH consumers (tf and
    df each got their own Generate + exchange in the physical plan).
    The tf relation now materializes ONCE behind an eager
    localCheckpoint (scratch.pin) and df aggregates the materialized
    rows — one explode pass and one (doc_id, term) shuffle total.
    A/B at sf0.1: first-exec 0.77 s vs 1.14, steady 0.71 vs 0.87,
    results identical. Same one-live-copy-per-session pin hygiene as
    dedup_lsh_eval_pr (the view replaces per run).
    """
    from sparksql_server_spark.operators.scratch import pin_view

    register_tables(spark, sf_dir, ("documents",))
    docs = spark.table("documents")
    w = docs.select("doc_id", F.expr(spark_words("text")).alias("w"))
    terms = w.select("doc_id", F.explode("w").alias("term"))
    pin_view(
        spark,
        terms.groupBy("doc_id", "term").agg(F.count("*").alias("tf")),
        "tfidf_tf_mat",
    )
    return spark.sql(_tfidf_sql("spark", tf_from="tfidf_tf_mat"))


_BOILER_N = 4  # shingle width (words)
_BOILER_DF = 2  # a shingle is boilerplate when >= this many docs contain it
_BOILER_TOP = 50


def _boiler_sql(dialect: str) -> str:
    """Shared shape: distinct word 4-grams per doc, shingle document
    frequency, per-doc fraction of shingles that are corpus-frequent.
    The one float is a single division of exact BIGINTs."""
    if dialect == "spark":
        words, sh = spark_words("text"), spark_shingles("w", _BOILER_N)
        ex = f"SELECT DISTINCT doc_id, s FROM w LATERAL VIEW explode({sh}) t AS s"
    else:
        words, sh = duck_words("text"), duck_shingles("w", _BOILER_N)
        ex = f"SELECT DISTINCT doc_id, unnest({sh}) AS s FROM w"
    return f"""
WITH w AS (SELECT doc_id, {words} AS w FROM documents),
sh AS ({ex}),
df AS (SELECT s, CAST(count(*) AS BIGINT) AS df FROM sh GROUP BY s),
perdoc AS (
  SELECT sh.doc_id,
         CAST(count(*) AS BIGINT) AS n_shingles,
         CAST(sum(CASE WHEN df.df >= {_BOILER_DF} THEN 1 ELSE 0 END) AS BIGINT)
           AS n_boiler
  FROM sh JOIN df ON sh.s = df.s
  GROUP BY sh.doc_id)
SELECT doc_id, n_shingles, n_boiler,
       CAST(round(CAST(n_boiler AS DOUBLE) / n_shingles, 6) AS DOUBLE)
         AS boiler_frac
FROM perdoc
ORDER BY boiler_frac DESC, doc_id
LIMIT {_BOILER_TOP}
"""


@query("quality_boilerplate_density", oracle=_boiler_sql("duck"))
def quality_boilerplate_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-frequent-span density — the C4/RefinedWeb boilerplate
    screen re-expressed relationally: a word 4-gram that appears in
    >= 2 distinct documents is 'boilerplate' (navigation chrome,
    license headers, templated spans); each document reports what
    fraction of its distinct 4-grams are boilerplate, and the top 50
    most templated documents surface for removal. Differs from
    dedup_shingle_containment (pairwise A-subset-of-B) by scoring each
    doc against the WHOLE corpus's span frequency — catching documents
    stitched from many sources' boilerplate, which no single pair
    reveals.

    Determinism: integer counts end-to-end; one exact-input division
    rounded to 6 dp; total ORDER BY with doc_id tiebreak.

    Scale: explode-distinct shuffles on (doc_id, shingle); DF is a
    combinable count keyed by shingle (the production pipeline
    persists it — the span-frequency table IS the boilerplate model,
    reusable per batch like dedup_incremental_lsh's index); the
    join-back is keyed by shingle and 1:1 (each sh row meets exactly
    its own span's count row — Σ df, never Σ df²). Rollup is a per-doc
    combinable aggregate; LIMIT is a TakeOrdered top-k, no global
    sort materialized.

    Round 11: the ``sh`` relation feeds BOTH the span-frequency count
    and the join-back; as inlined CTE text Spark re-ran the
    explode+DISTINCT per consumer (the ×100 sweep measured 78 s,
    exponent 0.76, after first exposing an OOM at the old 8g heap), so
    it materializes once behind a CacheScope spill — the same
    pattern/artifact as the dedup shingle table.
    """
    # r12: small-input spread (guide §2.5) — interleaved steady A/B -0.20/-0.13 s
    register_tables(spark, sf_dir, ("documents",), spread=("documents",))
    from sparksql_server_spark.operators.scratch import CacheScope

    words, shexpr = spark_words("text"), spark_shingles("w", _BOILER_N)
    sh = CacheScope(spark).finish_pin(
        spark.sql(
            f"WITH w AS (SELECT doc_id, {words} AS w FROM documents) "
            f"SELECT DISTINCT doc_id, s FROM w LATERAL VIEW explode({shexpr}) t AS s"
        ),
        "boiler_sh_mat",
    )
    df = sh.groupBy("s").agg(F.count("*").cast("bigint").alias("df"))
    perdoc = (
        sh.join(df, "s")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_shingles"),
            F.sum(F.when(F.col("df") >= _BOILER_DF, 1).otherwise(0))
            .cast("bigint")
            .alias("n_boiler"),
        )
    )
    return (
        perdoc.select(
            "doc_id",
            "n_shingles",
            "n_boiler",
            F.round(
                F.col("n_boiler").cast("double") / F.col("n_shingles"), 6
            )
            .cast("double")
            .alias("boiler_frac"),
        )
        .orderBy(F.desc("boiler_frac"), "doc_id")
        .limit(_BOILER_TOP)
    )
