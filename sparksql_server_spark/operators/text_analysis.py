"""Text-analysis operators — language ID, quality scoring, token
counting, document fingerprinting (north-star set).

All map-only expressions over documents (no shuffle except the final
presentation sort) — at 100 TB these run at scan speed, pipelined into
whatever consumes them. Everything is JVM-side built-ins / higher-order
functions; no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from sparksql_server_spark.catalog import register_tables
from sparksql_server_spark.operators.registry import query
from sparksql_server_spark.functions.portable import (
    duck_char_hash,
    duck_shingles,
    duck_words,
    spark_char_hash,
    spark_shingles,
    spark_words,
)

# tiny stopword lexicons for the n-gram/stopword language heuristic
_LEX = {
    "en": ("the", "a", "of", "and", "is", "to"),
    "es": ("el", "la", "de", "los", "que"),
    "de": ("der", "die", "das", "und", "ein"),
    "fr": ("le", "les", "des", "et", "une"),
}


def _score(dialect: str, lang: str) -> str:
    terms = ", ".join(f"'{t}'" for t in _LEX[lang])
    if dialect == "spark":
        return f"size(filter(w, t -> t IN ({terms})))"
    return f"len(list_filter(w, t -> t IN ({terms})))"


def _langid_sql(dialect: str, words_expr: str) -> str:
    s = {lang: _score(dialect, lang) for lang in _LEX}
    cast_int = "CAST({} AS INT)".format
    return f"""
WITH w AS (SELECT doc_id, {words_expr} AS w FROM documents),
scores AS (SELECT doc_id,
                  {cast_int(s['en'])} AS s_en,
                  {cast_int(s['es'])} AS s_es,
                  {cast_int(s['de'])} AS s_de,
                  {cast_int(s['fr'])} AS s_fr
           FROM w)
SELECT doc_id,
       CASE WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr AND s_en > 0 THEN 'en'
            WHEN s_es >= s_de AND s_es >= s_fr AND s_es > 0 THEN 'es'
            WHEN s_de >= s_fr AND s_de > 0 THEN 'de'
            WHEN s_fr > 0 THEN 'fr'
            ELSE 'unk' END AS pred_lang,
       s_en, s_es, s_de, s_fr
FROM scores
"""


@query("text_langid", oracle=_langid_sql("duck", duck_words("text")))
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language ID via stopword-hit scoring with a fixed priority
    tie-break (en > es > de > fr > unk). A real deployment swaps the
    lexicons for char-n-gram profiles; the plan shape (map-only
    scoring, no shuffle) is the same."""
    register_tables(spark, sf_dir, ("documents",))
    return spark.sql(_langid_sql("spark", spark_words("text")))


def _quality_sql(dialect: str) -> str:
    if dialect == "spark":
        words = spark_words("text")
        sum_len = "aggregate(transform(w, t -> bigint(length(t))), 0L, (a, v) -> a + v)"
        n_stop = _score("spark", "en")
    else:
        words = duck_words("text")
        sum_len = (
            "list_reduce(list_prepend(0::BIGINT, "
            "list_transform(w, t -> length(t)::BIGINT)), (a, v) -> a + v)"
        )
        n_stop = _score("duck", "en")
    size_w = "size(w)" if dialect == "spark" else "len(w)"
    return f"""
WITH w AS (SELECT doc_id, text, n_chars, {words} AS w FROM documents)
SELECT doc_id,
       CAST({size_w} AS BIGINT)                          AS n_words,
       round({sum_len} / {size_w}, 4)                    AS avg_word_len,
       round({n_stop} / {size_w}, 4)                     AS stopword_ratio,
       CAST(length(text) AS BIGINT)                      AS n_chars_measured,
       length(text) = n_chars                            AS n_chars_ok
FROM w
WHERE {size_w} > 0
"""


@query("text_quality", oracle=_quality_sql("duck"))
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: word count, mean word length, stopword ratio,
    char-count consistency — the standard pre-training filter features."""
    register_tables(spark, sf_dir, ("documents",))
    return spark.sql(_quality_sql("spark"))


def _tokens_sql(dialect: str) -> str:
    if dialect == "spark":
        ws = f"size({spark_words('text')})"
        bpe = "size(filter(split(lower(text), '[^a-z0-9]+'), t -> t <> ''))"
    else:
        ws = f"len({duck_words('text')})"
        bpe = "len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> ''))"
    return f"""
SELECT doc_id,
       CAST({ws} AS BIGINT)  AS n_ws_tokens,
       CAST({bpe} AS BIGINT) AS n_re_tokens
FROM documents
"""


@query("text_token_count", oracle=_tokens_sql("duck"))
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + a BPE-ish alnum-run
    tokenizer (regex split) — the cheap token-budget estimator."""
    register_tables(spark, sf_dir, ("documents",))
    return spark.sql(_tokens_sql("spark"))


def _fingerprint_sql(dialect: str) -> str:
    ch = spark_char_hash if dialect == "spark" else duck_char_hash
    prefix = "substring(text, 1, 64)" if dialect == "spark" else "substr(text, 1, 64)"
    return f"""
SELECT doc_id,
       {ch('text')} AS fingerprint,
       {ch(prefix)} AS prefix_fingerprint
FROM documents
"""


@query("text_fingerprint", oracle=_fingerprint_sql("duck"))
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: rolling polynomial hash of the full text
    plus a 64-char-prefix fingerprint (cheap near-head dedup key)."""
    register_tables(spark, sf_dir, ("documents",))
    return spark.sql(_fingerprint_sql("spark"))


def _pipeline_sql(dialect: str) -> str:
    """The capstone composite: quality gate -> language gate ->
    exact dedup (keep min doc_id per text) -> token budget."""
    if dialect == "spark":
        words = spark_words("text")
        size_w = "size(w)"
        n_stop = _score("spark", "en")
        re_tokens = "size(filter(split(lower(text), '[^a-z0-9]+'), t -> t <> ''))"
    else:
        words = duck_words("text")
        size_w = "len(w)"
        n_stop = _score("duck", "en")
        re_tokens = "len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> ''))"
    return f"""
WITH w AS (SELECT doc_id, text, source, lang, {words} AS w FROM documents),
feat AS (SELECT doc_id, text, source, lang,
                CAST({size_w} AS BIGINT)              AS n_words,
                round({n_stop} / {size_w}, 4)         AS stopword_ratio,
                CAST({re_tokens} AS BIGINT)           AS n_re_tokens
         FROM w
         WHERE {size_w} > 0),
gated AS (SELECT * FROM feat
          WHERE n_words >= 5 AND stopword_ratio >= 0.05),
canon AS (SELECT text, min(doc_id) AS keep_id FROM gated GROUP BY text)
SELECT g.doc_id, g.source, g.lang, g.n_words, g.stopword_ratio, g.n_re_tokens
FROM gated g JOIN canon c ON g.doc_id = c.keep_id
"""


@query("pipeline_training_data", oracle=_pipeline_sql("duck"))
def pipeline_training_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-data pipeline composite: quality features →
    gate (min length, stopword ratio) → exact dedup keeping the
    canonical (min doc_id) copy → per-doc token budget. One pass over
    documents + one groupBy on text for the canonical choice — at
    100 TB the dedup groupBy is the only shuffle, keyed on full text
    (swap in the fingerprint column to shuffle 8 bytes instead of
    documents when texts are large; same plan shape)."""
    register_tables(spark, sf_dir, ("documents",))
    return spark.sql(_pipeline_sql("spark"))


def _decontaminate_sql(dialect: str) -> str:
    """Benchmark decontamination, shared shape: flag training docs
    whose 3-gram shingles overlap a held-out benchmark set. Distinct
    from dedup — the relation is asymmetric (train vs benchmark) and
    the output is a removal list, not canonical-copy clusters."""
    if dialect == "spark":
        words = spark_words("text")
        explode = (
            "SELECT DISTINCT doc_id, shingle FROM w "
            f"LATERAL VIEW explode({spark_shingles('w')}) t AS shingle"
        )
    else:
        words = duck_words("text")
        explode = (
            "SELECT DISTINCT doc_id, shingle FROM "
            f"(SELECT doc_id, unnest({duck_shingles('w')}) AS shingle FROM w)"
        )
    return f"""
WITH w AS (SELECT doc_id, {words} AS w FROM documents),
sh AS ({explode}),
bench AS (SELECT doc_id, shingle FROM sh WHERE doc_id < {_N_BENCH}),
train AS (SELECT doc_id, shingle FROM sh WHERE doc_id >= {_N_BENCH}),
hits AS (SELECT t.doc_id AS doc_id, b.doc_id AS bench_id, count(*) AS n_shared
         FROM train t JOIN bench b ON t.shingle = b.shingle
         GROUP BY t.doc_id, b.doc_id
         HAVING count(*) >= {_MIN_SHARED})
SELECT doc_id,
       CAST(count(*) AS BIGINT)     AS n_bench_hits,
       CAST(max(n_shared) AS BIGINT) AS worst_overlap,
       min(bench_id)                AS first_bench_id
FROM hits GROUP BY doc_id ORDER BY doc_id
"""


_N_BENCH = 20  # doc_id < 20 stands in for the held-out benchmark set
_MIN_SHARED = 2  # shingles shared with one benchmark doc to flag


@query("pipeline_decontaminate", oracle=_decontaminate_sql("duck"))
def pipeline_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: training documents sharing >= 2
    3-gram shingles with any held-out benchmark document (here:
    doc_id < 20 standing in for the eval set) are flagged with their
    hit count and worst single-benchmark overlap.

    Scale: one shuffle on shingle, join work is sum of per-shingle
    bucket(train) x bucket(bench) — the benchmark side is tiny, so at
    100 TB the planner broadcasts it and the pass is map-side; a
    document-frequency cutoff on ultra-common shingles bounds the
    worst bucket exactly as in dedup_ngram_jaccard.
    """
    register_tables(spark, sf_dir, ("documents",))
    return spark.sql(_decontaminate_sql("spark"))


_PACK_BUDGET = 256  # tokens per training context (demo-sized)


def _pack_sql(dialect: str) -> str:
    """Context packing, shared shape: assign documents (per language,
    in doc_id order) to fixed token-budget packs by cumulative token
    count. 256 divides binary-exactly, so the double division is safe
    cross-engine."""
    size_w = "size(w)" if dialect == "spark" else "len(w)"
    words = spark_words("text") if dialect == "spark" else duck_words("text")
    return f"""
WITH t AS (SELECT doc_id, lang, CAST({size_w} AS BIGINT) AS n_tokens
           FROM (SELECT doc_id, lang, {words} AS w FROM documents)),
c AS (SELECT doc_id, lang, n_tokens,
             coalesce(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS before_tokens
      FROM t),
packs AS (SELECT lang,
                 CAST(floor(before_tokens / {_PACK_BUDGET}.0) AS INT) AS pack_id,
                 doc_id, n_tokens
          FROM c)
SELECT lang, pack_id,
       CAST(count(*) AS BIGINT)      AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS pack_tokens,
       min(doc_id) AS first_doc,
       max(doc_id) AS last_doc
FROM packs GROUP BY lang, pack_id
ORDER BY lang, pack_id
"""


@query("pipeline_pack_contexts", oracle=_pack_sql("duck"))
def pipeline_pack_contexts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context packing for training batches: per language, documents
    are laid out in doc_id order and assigned to fixed token-budget
    packs (256 tokens) by cumulative token count; the output audits
    each pack's document count and token load. Documents may straddle
    a boundary (fractional packing) — production splits the straddler
    into the next pack, which changes per-pack loads but not the plan.

    Scale: one window over (lang) — in production the partition key
    becomes (lang, shard) so window state stays bounded — plus one
    aggregation; both shuffle on the same key, and AQE coalesces the
    tiny pack partitions.
    """
    register_tables(spark, sf_dir, ("documents",))
    return spark.sql(_pack_sql("spark"))


def _domain_mix_sql(dialect: str) -> str:
    """Curriculum domain mixing, shared shape: per-source keep rates
    applied via the deterministic hash-Bernoulli gate (the same Knuth
    mix as operators/sampling.py, so mixes are reproducible and
    re-runnable), audited per source."""
    from sparksql_server_spark.operators.sampling import _MIX

    suffix = (
        "CAST(substring(source, 4) AS INT)"
        if dialect == "spark"
        else "CAST(substr(source, 4) AS INT)"
    )
    return f"""
WITH rated AS (
  SELECT doc_id, source,
         CASE WHEN {suffix} % 2 = 0 THEN 100 ELSE 25 END AS rate_pct,
         {_MIX.format(k='doc_id')} % 100                 AS band
  FROM documents)
SELECT source,
       CAST(count(*) AS BIGINT)                               AS n_total,
       CAST(count(CASE WHEN band < rate_pct THEN 1 END) AS BIGINT) AS n_kept,
       round(CAST(count(CASE WHEN band < rate_pct THEN 1 END) AS DOUBLE)
             / count(*), 4)                                   AS realized_rate,
       CAST(min(rate_pct) AS INT)                             AS target_pct
FROM rated GROUP BY source ORDER BY source
"""


@query("pipeline_domain_mix", oracle=_domain_mix_sql("duck"))
def pipeline_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum / domain mixing: each source gets a target keep rate
    (here even-numbered sources 100%, odd 25% — the stand-in for a
    configured mixture) enforced by the deterministic hash-Bernoulli
    gate, with a per-source audit of target vs realized rate.

    Scale: the keep decision is a row-local pushed-down predicate
    (map-only, reproducible across reruns and repartitions); the audit
    is one map-side-combinable aggregation. Changing the mixture only
    changes literals — no new plan shape.
    """
    register_tables(spark, sf_dir, ("documents",))
    return spark.sql(_domain_mix_sql("spark"))


def _ngram_counts_sql(dialect: str) -> str:
    """Corpus bigram counts — the n-gram language-model / contamination
    table every training-data pipeline keeps. Tokens are the module's
    whitespace words over lower(text); bigrams via the shared shingle
    helpers (dedup's MinHash uses the same ones at n=3)."""
    if dialect == "spark":
        return f"""
        WITH words AS (
          SELECT {spark_words("lower(text)")} AS w FROM documents)
        SELECT bigram, CAST(count(*) AS BIGINT) AS cnt
        FROM words LATERAL VIEW explode({spark_shingles("w", 2)}) t AS bigram
        GROUP BY bigram
        ORDER BY cnt DESC, bigram
        LIMIT 20
        """
    return f"""
    WITH words AS (
      SELECT {duck_words("lower(text)")} AS w FROM documents),
    bi AS (SELECT unnest({duck_shingles("w", 2)}) AS bigram FROM words)
    SELECT bigram, CAST(count(*) AS BIGINT) AS cnt
    FROM bi
    GROUP BY bigram
    ORDER BY cnt DESC, bigram
    LIMIT 20
    """


@query("text_ngram_counts", oracle=_ngram_counts_sql("duck"))
def text_ngram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 corpus bigrams with counts (deterministic cnt-then-term
    tiebreak so the LIMIT boundary is stable across engines).

    Scale: explode is map-only (no pre-shuffle); the count is one
    hash aggregation with map-side partials over (corpus tokens)
    rows, and the top-20 is a TakeOrdered — no global sort of the
    full n-gram table. Vocabulary skew ("the the") is bounded by the
    partial aggregation: each task emits one row per distinct bigram.
    """
    register_tables(spark, sf_dir, ("documents",))
    return spark.sql(_ngram_counts_sql("spark"))


def _dataset_card_sql(dialect: str) -> str:
    """Per-(source, lang) corpus audit, shared SQL shape."""
    words = spark_words("text") if dialect == "spark" else duck_words("text")
    size_w = "size(w)" if dialect == "spark" else "len(w)"
    return f"""
WITH w AS (SELECT doc_id, source, lang, n_chars, {words} AS w FROM documents),
per_doc AS (SELECT doc_id, source, lang, n_chars,
                   CAST({size_w} AS BIGINT) AS n_tokens FROM w),
grouped AS (
  SELECT source, lang,
         CAST(count(*) AS BIGINT)       AS n_docs,
         CAST(sum(n_tokens) AS BIGINT)  AS total_tokens,
         CAST(sum(n_chars) AS BIGINT)   AS total_chars
  FROM per_doc GROUP BY source, lang),
tot AS (SELECT CAST(sum(n_docs) AS DOUBLE) AS all_docs FROM grouped)
SELECT g.source, g.lang, g.n_docs, g.total_tokens,
       CAST(g.total_chars AS DOUBLE) / g.n_docs AS avg_chars,
       g.n_docs / t.all_docs                    AS doc_share
FROM grouped g CROSS JOIN tot t
ORDER BY g.source, g.lang
"""


@query("text_dataset_card", oracle=_dataset_card_sql("duck"))
def text_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-card audit: per (source, lang) document count, token and
    char totals, and share of the corpus — the summary table a training
    run publishes next to its data mix.

    Scale: one combinable aggregation over documents; the grand total
    is a broadcast 1-row relation (no driver collect). Integer totals
    divide as doubles only at the end, so every engine-visible value is
    exact until the final two columns.
    """
    register_tables(spark, sf_dir, ("documents",))
    return spark.sql(_dataset_card_sql("spark"))


def _bpe_pair_sql(dialect: str) -> str:
    """BPE merge-candidate statistics, shared SQL shape: corpus-weighted
    adjacent character-pair counts within words — the argmax of this
    table is byte-pair encoding's first merge."""
    if dialect == "spark":
        words = spark_words("lower(text)")
        tok_explode = "SELECT tok FROM w LATERAL VIEW explode(w) t AS tok"
        pair_explode = (
            "SELECT tok, n_occ, transform(sequence(1, length(tok) - 1),"
            " i -> substring(tok, i, 2)) AS pairs FROM wc WHERE length(tok) >= 2"
        )
        unnest = "SELECT n_occ, explode(pairs) AS pair FROM p"
    else:
        words = duck_words("lower(text)")
        tok_explode = "SELECT unnest(w) AS tok FROM w"
        pair_explode = (
            "SELECT tok, n_occ, list_transform(range(1, length(tok)),"
            " i -> substring(tok, i, 2)) AS pairs FROM wc WHERE length(tok) >= 2"
        )
        unnest = "SELECT n_occ, unnest(pairs) AS pair FROM p"
    return f"""
WITH w AS (SELECT {words} AS w FROM documents),
toks AS ({tok_explode}),
wc AS (SELECT tok, CAST(count(*) AS BIGINT) AS n_occ FROM toks GROUP BY tok),
p AS ({pair_explode}),
pairs AS ({unnest})
SELECT pair, CAST(sum(n_occ) AS BIGINT) AS n
FROM pairs GROUP BY pair
ORDER BY n DESC, pair
LIMIT 20
"""


@query("text_bpe_pair_stats", oracle=_bpe_pair_sql("duck"))
def text_bpe_pair_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-training statistics: corpus-weighted adjacent char-pair
    frequencies (BPE's iteration-0 merge table), top-20 with a
    deterministic (count, pair) tiebreak.

    Scale: the trick is aggregating to the WORD vocabulary first (one
    combinable count) and exploding pairs only over distinct words —
    corpus size drops out of the pair-explosion entirely; this is
    exactly how production BPE trainers batch their pair counts. Full
    iterative training is a driver loop re-running this aggregate on a
    re-segmented vocab; each round stays one shuffle.
    """
    register_tables(spark, sf_dir, ("documents",))
    return spark.sql(_bpe_pair_sql("spark"))


_SOURCE_ENTROPY_SQL = """
WITH counts AS (
  SELECT source, lang, CAST(count(*) AS DOUBLE) AS n
  FROM documents GROUP BY source, lang),
tot AS (
  SELECT source, sum(n) AS total, count(*) AS n_langs FROM counts GROUP BY source)
SELECT c.source,
       CAST(t.n_langs AS BIGINT)                    AS n_langs,
       CAST(t.total AS BIGINT)                      AS n_docs,
       -sum((c.n / t.total) * ln(c.n / t.total))    AS lang_entropy
FROM counts c JOIN tot t ON c.source = t.source
GROUP BY c.source, t.n_langs, t.total
ORDER BY c.source
"""


@query("text_source_entropy", oracle=_SOURCE_ENTROPY_SQL)
def text_source_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Shannon entropy of the language mix — the diversity
    metric a data-mix audit reports next to the dataset card (0 =
    monolingual source, ln(k) = uniform over k languages).

    Scale: two combinable aggregations over (source, lang) — the
    entropy sums over the tiny rollup, not the corpus. ln on identical
    doubles is IEEE-deterministic in both engines; the comparator's
    6-decimal rounding absorbs any last-ulp libm difference.
    """
    register_tables(spark, sf_dir, ("documents",))
    return spark.sql(_SOURCE_ENTROPY_SQL)
