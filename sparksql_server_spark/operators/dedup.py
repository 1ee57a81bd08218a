"""Deduplication operators — exact, MinHash+LSH, SimHash, n-gram
Jaccard, embedding-cosine near-dup (north-star set, BASELINE.json).

Every variant is a *relational* pipeline (explode → hash → group →
self-join) rather than nested driver loops, so each one distributes:
the only shuffles are on (shingle) / (doc_id, j) / (band, band_sig) —
all fine-grained keys that spread evenly at 100 TB. Hashing uses the
engine-portable polynomial hash (functions/portable.py) so the DuckDB
oracle verifies values exactly; swapping in Spark's native ``hash()``
/ pyspark.ml MinHashLSH is a one-line change where oracle parity is
not required.

Scale notes per operator are in each docstring.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparksql_server_spark.catalog import register_tables
from sparksql_server_spark.operators.registry import query
from sparksql_server_spark.functions.portable import (
    MOD_P,
    duck_char_hash,
    duck_shingles,
    duck_words,
    spark_char_hash,
    spark_shingles,
    spark_words,
)
from sparksql_server_spark.functions.vector import (
    duck_dot,
    duck_norm,
    exact_numpy_dots,
    spark_dot,
    spark_norm,
)

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

_EXACT_DUCK = """
SELECT md5(text) AS text_md5,
       CAST(count(*) AS BIGINT) AS n_copies,
       min(doc_id) AS keep_id
FROM documents
GROUP BY text
"""

_EXACT_SPARK = """
SELECT md5(cast(text AS BINARY)) AS text_md5,
       count(*) AS n_copies,
       min(doc_id) AS keep_id
FROM documents
GROUP BY text
"""


@query("dedup_exact", oracle=_EXACT_DUCK)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on full text, keep min doc_id.

    Scale: one shuffle keyed by text hash; with pre-hashing
    (md5 before the shuffle) the shuffled key is 16 bytes, not the
    document body. Spark's partial aggregation handles the group-by.
    """
    register_tables(spark, sf_dir, ("documents",))
    return spark.sql(_EXACT_SPARK)


# ---------------------------------------------------------------------------
# MinHash + LSH banding
# ---------------------------------------------------------------------------

_MH_K = 16  # signature length
_MH_R = 4  # rows per band -> 4 bands
# one min() aggregate per permutation j, computed in a single GROUP BY
# pass (the explode-by-j formulation inflates the shingle-hash table
# K× before aggregating; this computes identical values with zero row
# blowup). Band signatures combine each band's 4 minima polynomially.
_MH_MINS = ", ".join(
    f"min(((2 * {j} + 1) * h + (7 + 13 * {j})) % {MOD_P}) AS m{j}"
    for j in range(_MH_K)
)
_W31 = (1, 31, 961, 29791)


def _band_sig(b: int) -> str:
    terms = " + ".join(f"m{b * _MH_R + r} * {_W31[r]}" for r in range(_MH_R))
    return f"({terms}) % {MOD_P}"


_STACK_ARGS = ", ".join(
    f"{b}, {_band_sig(b)}" for b in range(_MH_K // _MH_R)
)
_DUCK_BANDS = " UNION ALL ".join(
    f"SELECT doc_id, {b} AS band, CAST({_band_sig(b)} AS BIGINT) AS band_sig FROM mh"
    for b in range(_MH_K // _MH_R)
)


def _sh_canonical_sql(dialect: str) -> tuple[str, str]:
    """(w_cte_body, sh_select) — the canonical word-array + distinct
    3-gram shingle relation, the ONE text every consumer embeds."""
    if dialect == "spark":
        words, shingles = spark_words("text"), spark_shingles("w")
        ex = f"SELECT DISTINCT doc_id, shingle FROM w LATERAL VIEW explode({shingles}) t AS shingle"
    else:
        words, shingles = duck_words("text"), duck_shingles("w")
        ex = (
            "SELECT DISTINCT doc_id, shingle FROM "
            f"(SELECT doc_id, unnest({shingles}) AS shingle FROM w)"
        )
    return f"SELECT doc_id, {words} AS w FROM documents", ex


def _mh_candidate_ctes(dialect: str, sh_from: str | None = None) -> str:
    """The canonical MinHash->banding candidate pipeline as CTE text —
    w (word arrays), sh (distinct shingles), h (shingle hashes), mh
    (signatures), bs (band rows), cand (candidate pairs). ONE
    definition consumed by dedup_minhash_lsh AND dedup_lsh_eval_pr, so
    the eval provably scores the exact production pipeline — the
    shared-text discipline of _hll_regs_ctes/prime_mix.

    ``sh_from``: name of a pre-materialized relation holding the
    canonical (doc_id, shingle) rows — built by executing THIS
    function's own w/sh text and materializing it (scratch.pin), so
    the pipeline scored is still the canonical one. Callers whose
    query consumes sh from several DIFFERENTLY-KEYED branches pass it
    to stop Spark's CTE inlining from re-running the explode+DISTINCT
    per branch. (cand's symmetric bs self-join needs no such barrier:
    ReuseExchange computes the identical subtree once at runtime.)"""
    w_body, ex = _sh_canonical_sql(dialect)
    if dialect == "spark":
        hash_ = spark_char_hash("shingle")
        bands = (
            f"SELECT doc_id, band, band_sig FROM mh "
            f"LATERAL VIEW stack({_MH_K // _MH_R}, {_STACK_ARGS}) s AS band, band_sig"
        )
    else:
        hash_ = duck_char_hash("shingle")
        bands = _DUCK_BANDS
    # only emit the `w` CTE when sh is built inline — with sh_from set
    # nothing references it (ADVICE r12 on the calibration twin)
    w_cte = f"w AS ({w_body}),\n"
    if sh_from is not None:
        ex = f"SELECT doc_id, shingle FROM {sh_from}"
        w_cte = ""
    return f"""{w_cte}sh AS ({ex}),
h AS (SELECT doc_id, {hash_} AS h FROM sh),
mh AS (SELECT doc_id, {_MH_MINS} FROM h GROUP BY doc_id),
bs AS ({bands}),
cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
         FROM bs a JOIN bs b
           ON a.band = b.band AND a.band_sig = b.band_sig
          AND a.doc_id < b.doc_id)"""


def _minhash_spark() -> str:
    return f"""
WITH {_mh_candidate_ctes('spark')}
SELECT d1, d2 FROM cand ORDER BY d1, d2 LIMIT 1000
"""


def _minhash_duck() -> str:
    return f"""
WITH {_mh_candidate_ctes('duck')}
SELECT d1, d2 FROM cand ORDER BY d1, d2 LIMIT 1000
"""


@query("dedup_minhash_lsh", oracle=_minhash_duck())
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup candidates: shingle → K=16 minhashes →
    4-row bands → bucket-join on (band, band_sig).

    Scale: no all-pairs work anywhere — the self-join is on band
    signatures, so cost is Σ bucket², concentrated only on genuinely
    similar docs. All K=16 minhash permutations are computed as
    parallel min() aggregates in one pass over the shingle hashes —
    no row inflation anywhere. The band self-join needs NO barrier:
    its two sides are the identical bs subtree exchanged on the same
    (band, band_sig) key, so Spark's ReuseExchange computes the chain
    once at runtime — a spill barrier here was measured SLOWER
    (parquet round-trip for work the reuse already deduped); contrast
    dedup_lsh_eval_pr, whose four differently-keyed sh consumers
    defeat exchange reuse and do need the spill.
    """
    # r12: small-input spread (guide §2.5) — interleaved steady A/B -0.52/-0.63 s
    register_tables(spark, sf_dir, ("documents",), spread=("documents",))
    return spark.sql(_minhash_spark())


# ---------------------------------------------------------------------------
# SimHash (60-bit portable, four 15-bit lanes)
# ---------------------------------------------------------------------------

# 60 bits from FOUR 15-bit lanes: two independent rolling char hashes
# (bases 31 and 131, both mod 1e9+7) plus a multiplicative remix of
# each; bits 15b..15b+14 come from lane b's LOW 15 bits. r6 used a
# single lane (28 bits → 4x7-bit blocks = only 512 retrieval buckets —
# a hard Σ bucket² ≈ N²/512 ceiling, the worst ×10 scaling exponent in
# the corpus at 0.76). 60 bits gives the pair retriever 4 x 15-bit
# blocks = 4x32768 buckets, so bucket width tracks genuine similarity
# instead of signature-space exhaustion.
_SH_BITS = 60
_SH_LANE = 15  # bits taken per lane — LOW bits only: a mod-(1e9+7)
# hash is uniform on [0, 1e9+6], so its TOP bits are biased (bit 29:
# P(1) = 463129095/1e9+7 ≈ 0.463, likewise bit 28) and a biased
# signature bit degenerates toward 0 under the majority vote for
# long documents, shrinking the banding retriever's effective bucket
# count (review r7). Low-15 bits carry bias ≤ 2^15/1e9 ≈ 3e-5 —
# negligible — so the 60 bits come from FOUR 15-bit lanes: the two
# base-31/131 char hashes plus one Knuth multiplicative remix of
# each ((h * 2654435761) % P, product ≤ 2.7e18, int64-safe).

# per-bit signed sums as parallel aggregates (single GROUP BY pass; the
# explode-by-bit form inflates the token-hash table 60x), then combine
# the 60 signs into the signature integer. The hash lanes are computed
# ONCE per token in the projection below the partial aggregate (plan
# verified: the sums reference bound columns h1..h4, not inlined hash
# expressions).
_SH_REMIX = 2654435761  # Knuth's 2^32 / golden ratio


def _sh_bit(b: int, shr) -> str:
    lane, off = ("h1", "h2", "h3", "h4")[b // _SH_LANE], b % _SH_LANE
    return f"{shr(lane, off)} & 1 = 1"


_SH_SUMS_SPARK = ", ".join(
    f"sum(CASE WHEN {_sh_bit(b, lambda h, n: f'shiftright({h}, {n})')} "
    f"THEN 1 ELSE -1 END) AS w{b}"
    for b in range(_SH_BITS)
)
_SH_SUMS_DUCK = ", ".join(
    f"sum(CASE WHEN {_sh_bit(b, lambda h, n: f'({h} >> {n})')} "
    f"THEN 1 ELSE -1 END) AS w{b}"
    for b in range(_SH_BITS)
)
_SH_COMBINE = " + ".join(
    f"(CASE WHEN w{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(_SH_BITS)
)


def _simhash_spark() -> str:
    return f"""
WITH w AS (SELECT doc_id, {spark_words('text')} AS w FROM documents),
tok AS (SELECT DISTINCT doc_id, tok FROM w LATERAL VIEW explode(w) t AS tok),
th0 AS (SELECT doc_id, {spark_char_hash('tok')} AS h1,
               {spark_char_hash('tok', base=131)} AS h2 FROM tok),
th AS (SELECT doc_id, h1, h2,
              (h1 * {_SH_REMIX}) % {MOD_P} AS h3,
              (h2 * {_SH_REMIX}) % {MOD_P} AS h4 FROM th0),
bits AS (SELECT doc_id, {_SH_SUMS_SPARK} FROM th GROUP BY doc_id)
SELECT doc_id, CAST({_SH_COMBINE} AS BIGINT) AS simhash
FROM bits
"""


def _simhash_duck() -> str:
    return f"""
WITH w AS (SELECT doc_id, {duck_words('text')} AS w FROM documents),
tok AS (SELECT DISTINCT doc_id, tok FROM
          (SELECT doc_id, unnest(w) AS tok FROM w)),
th0 AS (SELECT doc_id, {duck_char_hash('tok')} AS h1,
               {duck_char_hash('tok', base=131)} AS h2 FROM tok),
th AS (SELECT doc_id, h1, h2,
              (h1 * {_SH_REMIX}) % {MOD_P} AS h3,
              (h2 * {_SH_REMIX}) % {MOD_P} AS h4 FROM th0),
bits AS (SELECT doc_id, {_SH_SUMS_DUCK} FROM th GROUP BY doc_id)
SELECT doc_id, CAST({_SH_COMBINE} AS BIGINT) AS simhash
FROM bits
"""


@query("dedup_simhash", oracle=_simhash_duck())
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash signature per document — 60-bit portable variant from
    four 15-bit lanes (rolling hashes base 31/131 mod 1e9+7 plus a
    multiplicative remix of each — low bits only, see the lane note;
    engine-native 64-bit hashes can't cross-check against the oracle).

    Scale: token explode → two keyed aggregations; near-dup candidates
    then group by simhash value (hamming-0) or by block banding for
    hamming<=k — never all-pairs (dedup_simhash_pairs below).
    """
    register_tables(spark, sf_dir, ("documents",))
    return spark.sql(_simhash_spark())


# hamming<=3 retrieval: split the 60-bit signature into 4 blocks of 15
# bits; by pigeonhole, any pair within hamming 3 agrees EXACTLY on at
# least one block, so candidates come from equi-joining on
# (block index, block value) — never an all-pairs cross join.
_SH_K = 3
_SH_NBLOCKS = _SH_K + 1
_SH_BLOCK_BITS = _SH_BITS // _SH_NBLOCKS


def _emit_once(block_expr_fmt: str) -> str:
    """Join predicate implementing the LSH emit-once trick: a pair is
    emitted only from its FIRST agreeing block, so no two bands
    produce the same pair and no dedup shuffle is needed downstream.
    ``block_expr_fmt`` formats a (signature expr, block index) pair to
    the block value in the dialect."""
    clauses = []
    for e in range(_SH_NBLOCKS - 1):
        a_blk = block_expr_fmt.format(sig="a.simhash", shift=e * _SH_BLOCK_BITS)
        b_blk = block_expr_fmt.format(sig="b.simhash", shift=e * _SH_BLOCK_BITS)
        clauses.append(f"(a.band <= {e} OR ({a_blk}) <> ({b_blk}))")
    return "\n   AND ".join(clauses)


_MASK = (1 << _SH_BLOCK_BITS) - 1


def _simhash_pairs_spark(sig_from: str | None = None) -> str:
    """``sig_from``: relation already holding the (doc_id, simhash)
    signatures. The blocks CTE feeds BOTH pair-join sides, and Spark's
    CTE inlining re-executes the whole signature pipeline (token
    explode + two keyed aggregations, with CodegenFallback HOF lambdas
    in the scan filter) once per side — the r13 pin halves that."""
    sig = (
        f"SELECT doc_id, simhash FROM {sig_from}"
        if sig_from
        else _simhash_spark()
    )
    return f"""
WITH sig AS ({sig}),
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


def _simhash_pairs_duck() -> str:
    sig = _simhash_duck()
    return f"""
WITH sig AS ({sig}),
blocks AS (
  SELECT doc_id, simhash, band,
         (simhash >> (band * {_SH_BLOCK_BITS})) & {_MASK} AS blk
  FROM sig CROSS JOIN range(0, {_SH_NBLOCKS}) t(band))
SELECT d1, d2, hamming FROM (
  SELECT a.doc_id AS d1, b.doc_id AS d2,
         CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
  FROM blocks a JOIN blocks b
    ON a.band = b.band AND a.blk = b.blk AND a.doc_id < b.doc_id
   AND {_emit_once(f"(({{sig}} >> {{shift}}) & {_MASK})")})
WHERE hamming <= {_SH_K}
"""


@query("dedup_simhash_pairs", oracle=_simhash_pairs_duck())
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-duplicate retrieval: all pairs within hamming
    distance 3, via 4-way block banding over the 60-bit signature
    (reference behavior target: near-dup detection over the shared
    corpus; completes the signature-only dedup_simhash into a
    retriever).

    Scale: candidates come from an equi-join on (block index, block
    value) — cost Σ bucket², never N²; block entropy decides bucket
    width. The r6 28-bit signature's 7-bit blocks gave only 4x128=512
    bucket values — a constant ceiling that made candidate cost trend
    toward N²/512 (×10 exponent 0.76, the corpus's worst); 15-bit
    blocks give 4x32768 buckets, so bucket width tracks genuine
    similarity, not signature-space exhaustion. The emit-once
    predicate (pair emitted only from its FIRST agreeing block,
    checked bitwise from the two signatures in the join condition)
    removes the dedup DISTINCT entirely, and there is no presentation
    sort (a global sort would re-execute the plan for range sampling).
    After the (broadcastable) block join the query is one codegen map:
    xor → bit_count → filter.

    Round 13 (guide §2.4/§5): the signature relation is pinned once —
    as inline CTE text both block-join sides re-executed the full
    signature pipeline (2 documents scans, 4 shuffles; the scan filter
    carries interpreted HOF lambdas, so the duplication was doubly
    expensive). Plan: 2 scans → 1 RDD scan + its build
    (plans/r13/dedup_simhash_pairs_*.txt). Interleaved same-JVM A/B at
    sf0.1, both arm orders (tools/specs/simhash_lsheval.py): steady-min
    1.58/1.64 → 1.27/1.27 s, first(2nd position) 2.64 → 2.60 s;
    194,580 rows bit-equal in all runs. Same one-live-pin hygiene as
    the other pin_view operators.
    """
    from sparksql_server_spark.operators.scratch import pin_view

    register_tables(spark, sf_dir, ("documents",))
    pin_view(spark, spark.sql(_simhash_spark()), "simhash_sig_mat")
    return spark.sql(_simhash_pairs_spark(sig_from="simhash_sig_mat"))


# ---------------------------------------------------------------------------
# n-gram Jaccard
# ---------------------------------------------------------------------------

_SHINGLE_MAX_DF = 100  # shingles present in more docs than this are dropped
# BEFORE the pair self-join (same boilerplate-suppression cutoff as
# winnowing's _WIN_MAX_DF below): a corpus-frequent 3-gram ("terms of
# service") otherwise generates df^2 pair rows before any HAVING prunes.
# Post-cutoff every join bucket is <= _SHINGLE_MAX_DF wide, so the join is
# bounded by |shingles| * maxDF instead of the hottest shingle's df^2.
# The denominators (per-doc shingle counts) are computed over the SURVIVING
# shingles so jaccard/containment stay internally consistent (<= 1.0); this
# is the standard semantics — similarity over the discriminative shingle
# set, with non-discriminative boilerplate excluded from both numerator and
# denominator. The DuckDB oracle applies the identical cutoff.


def _shingle_kept_spark() -> str:
    """Spark side of the shingle-set build, through the DF cutoff —
    materialized ONCE behind a cache because counts and both pair-join
    sides consume it (as a CTE Spark re-expands the whole
    regexp/split/explode/distinct pipeline per consumer; measured 3×
    the work at sf0.1). The cutoff is a count() window over shingle,
    not a groupBy+join, so the shingle-set pipeline has exactly one
    consumer chain inside this statement."""
    return f"""
WITH w AS (SELECT doc_id, {spark_words('text')} AS w FROM documents),
sh AS (SELECT DISTINCT doc_id, shingle
       FROM w LATERAL VIEW explode({spark_shingles('w')}) t AS shingle),
dfc AS (SELECT doc_id, shingle,
               count(*) OVER (PARTITION BY shingle) AS c
        FROM sh)
SELECT doc_id, shingle FROM dfc WHERE c <= {_SHINGLE_MAX_DF}
"""


def _doc_shingle_sets(it):
    """mapInPandas: (doc_id, text) batches → exploded (doc_id, shingle)
    rows with per-doc DISTINCT applied in Python (a set per document).
    One Arrow UDF replaces the filter/split + transform/sequence/concat
    HOF cascade (interpreted lambdas, no codegen) AND the post-explode
    DISTINCT shuffle — per-doc dedup needs no cluster pass. Semantics
    are byte-identical to the SQL pipeline: split on single spaces,
    drop empties, space-join word triples (the DuckDB oracle keeps the
    SQL form).

    Bench note: whichever corpus query executes Python FIRST in a
    session pays the ~2-3 s python-daemon spawn for all 32 workers —
    with this rework that became dedup_ngram_jaccard (alphabetically
    the first Python user; r8's payer, dedup_winnowing, got the same
    amount faster). A/B'd a closure variant to rule out worker-side
    module import: no difference — the cost is the spawn itself, so
    bench.py now warms the worker pool in its session warmup and no
    corpus query carries it."""
    import pandas as pd

    for batch in it:
        rows_doc: list = []
        rows_sh: list = []
        for doc_id, text in zip(batch["doc_id"], batch["text"]):
            if text is None:
                continue
            w = [t for t in text.split(" ") if t]
            if len(w) < 3:
                continue
            seen = {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}
            rows_doc.extend([doc_id] * len(seen))
            rows_sh.extend(seen)
        yield pd.DataFrame({"doc_id": rows_doc, "shingle": rows_sh})


def _shingle_kept_materialized(spark: SparkSession, view: str) -> DataFrame:
    """Build the DF-cutoff shingle table once and pin it (eager
    localCheckpoint via scratch.pin_view under ``view``). Three
    consumers (per-doc counts + both pair-join sides) read the pinned
    rows instead of re-running the text pipeline, and the final
    orderBy+limit stays a TakeOrderedAndProject (no full-result
    materialization).

    Round 13 (guide §5): the r9 parquet spill became a pin — the pin
    skips the parquet encode+listing+decode round trip every call (the
    lsh_eval r7 pin-vs-spill result, reproduced here; the r10 note
    above measured spill-vs-CACHE as a wash, but the eager-checkpoint
    pin is the variant that wins). Plan delta: Scan parquet (spill) →
    Scan ExistingRDD at all three consumers; join strategy and
    exchange count unchanged (plans/r13/dedup_ngram_jaccard_*.txt).
    Interleaved same-JVM A/B at sf0.1, both arm orders
    (tools/specs/shingle_pin.py): ngram_jaccard steady-min 1.76/1.90 →
    1.48/1.88 s, first(2nd-position) 3.06 → 2.27 s;
    shingle_containment steady-min 1.62/2.10 → 1.45/1.77 s, first
    3.84 → 2.15 s; 500 rows bit-equal in all four runs. Block
    hygiene: one live pin per view via pin_view's deterministic
    predecessor release (gated in tests/test_cache_hygiene.py). At
    100 TB the same relation is written once to the object-store
    checkpoint dir (df.checkpoint()) and IS the persistent dedup
    artifact — the pin is the single-node bench-regime analogue.

    The shingle rows come from ONE Arrow mapInPandas pass
    (_doc_shingle_sets) instead of the SQL HOF pipeline
    (_shingle_kept_spark, kept as the oracle's reference semantics):
    the winnowing lesson again — HOF lambdas are CodegenFallback — plus
    a whole DISTINCT shuffle removed (per-doc dedup is a Python set).

    Round-9 floor measurement (VERDICT r8 ask #5; sf0.1, fresh session
    with warmed Arrow workers, tools/firstexec_ab.py, 3 trials/arm):
    dedup_shingle_containment first-exec 7.17/5.62/8.80 s (this build)
    vs 7.85/7.01/7.72 s (HOF build) — a noise-dominated WASH (means
    7.19 vs 7.53); steady 2.33 vs 2.36 — also a wash, the Arrow batch
    tax offsetting the saved shuffle at this scale. Kept for the plan:
    one fewer cluster-wide shuffle is strictly less work at 100 TB,
    where |doc_shingles| dwarfs the Arrow transfer. The remaining
    first-exec floor is the pair-join + window codegen and the scratch
    spill, not this pipeline. Both engines' shingle SETS are
    byte-identical (oracle-green for jaccard + containment)."""
    from pyspark.sql.window import Window

    from sparksql_server_spark.operators.scratch import pin_view

    docs = spark.table("documents").select("doc_id", "text")
    # doc_id keeps the SOURCE dtype (bigint in the driver corpus, but
    # any key type a caller registers — hardcoding bigint broke the
    # skew-corpus scale test, which keys documents by string)
    id_type = docs.schema["doc_id"].dataType.simpleString()
    sh = docs.mapInPandas(_doc_shingle_sets, f"doc_id {id_type}, shingle string")
    kept = (
        sh.withColumn("c", F.count("*").over(Window.partitionBy("shingle")))
        .filter(F.col("c") <= _SHINGLE_MAX_DF)
        .select("doc_id", "shingle")
    )
    return pin_view(spark, kept, view)


def _jaccard_duck() -> str:
    return f"""
WITH w AS (SELECT doc_id, {duck_words('text')} AS w FROM documents),
sh AS (SELECT DISTINCT doc_id, shingle FROM
         (SELECT doc_id, unnest({duck_shingles('w')}) AS shingle FROM w)),
df AS (SELECT shingle, count(*) AS c FROM sh GROUP BY shingle),
kept AS (SELECT s.doc_id, s.shingle
         FROM sh s JOIN df ON s.shingle = df.shingle
         WHERE df.c <= {_SHINGLE_MAX_DF}),
counts AS (SELECT doc_id, count(*) AS n FROM kept GROUP BY doc_id),
inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS shared
          FROM kept a JOIN kept b
            ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id
          HAVING count(*) >= 2)
SELECT d1, d2,
       round(shared / (ca.n + cb.n - shared), 6) AS jaccard
FROM inter
JOIN counts ca ON d1 = ca.doc_id
JOIN counts cb ON d2 = cb.doc_id
ORDER BY jaccard DESC, d1, d2
LIMIT 500
"""


@query("dedup_ngram_jaccard", oracle=_jaccard_duck())
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram (3-word shingle) Jaccard over candidate pairs that
    share ≥2 shingles — top pairs by similarity.

    Scale: the shingle self-join is blocked by shingle value with a
    document-frequency cutoff applied BEFORE the join (df <=
    _SHINGLE_MAX_DF, the winnowing _WIN_MAX_DF machinery): every join
    bucket is capped, so pair-row work is Σ bucket² bounded by
    |shingles| · maxDF instead of the hottest boilerplate shingle's
    df². The MinHash variant above is the preferred 100 TB first pass;
    this is the exact verifier run on its candidates. (Pre-hashing the
    shingle to an 8-byte key inside this single statement is a net
    loss: the CTE inlines and the hash evaluates once per reference;
    the kept-shingle table is therefore materialized once behind a
    pin_view — counts and both join sides consume it — and at 100 TB
    the same table is the persistent artifact, checkpointed to object
    store and reused for incremental screening.)

    Round-10 first-exec floor measurement (VERDICT r9 ask #5; sf0.1,
    warmed fresh sessions, tools/firstexec_ab.py regime): first
    6.71/6.56/7.47 s vs steady-min 2.65/2.57/2.53. Stage-isolated, the
    gap splits ~2.6 s in the shingle build+spill (4.69 first / 2.09
    steady alone) and ~1.2 s in the pair-join + count-join rest (4.64
    first with stage 1 precompiled / 3.46 steady) — both whole-stage-
    codegen compile, not data work. Candidate A/B'd: replacing the
    scratch-parquet spill with a block-manager cache is a WASH (first
    6.65 vs ~6.9 mean, steady ~3.0 both arms), so the spill is not the
    floor and stays for the 100 TB persistent-artifact plan. No plan
    change found that beats compile cost; floor documented.
    """
    # r12: small-input spread (guide §2.5) — interleaved steady A/B +0.05/-0.36 s
    register_tables(spark, sf_dir, ("documents",), spread=("documents",))
    kept = _shingle_kept_materialized(spark, "jacc_kept_mat")
    counts = kept.groupBy("doc_id").agg(F.count("*").alias("n"))
    a, b = kept.alias("a"), kept.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .agg(F.count("*").alias("shared"))
        .filter(F.col("shared") >= 2)
    )
    return (
        inter.join(counts.alias("ca"), F.col("d1") == F.col("ca.doc_id"))
        .join(counts.alias("cb"), F.col("d2") == F.col("cb.doc_id"))
        .select(
            "d1",
            "d2",
            F.round(
                F.col("shared")
                / (F.col("ca.n") + F.col("cb.n") - F.col("shared")),
                6,
            ).alias("jaccard"),
        )
        .orderBy(F.desc("jaccard"), "d1", "d2")
        .limit(500)
    )


def _containment_duck() -> str:
    return f"""
WITH w AS (SELECT doc_id, {duck_words('text')} AS w FROM documents),
sh AS (SELECT DISTINCT doc_id, shingle FROM
         (SELECT doc_id, unnest({duck_shingles('w')}) AS shingle FROM w)),
df AS (SELECT shingle, count(*) AS c FROM sh GROUP BY shingle),
kept AS (SELECT s.doc_id, s.shingle
         FROM sh s JOIN df ON s.shingle = df.shingle
         WHERE df.c <= {_SHINGLE_MAX_DF}),
counts AS (SELECT doc_id, count(*) AS n FROM kept GROUP BY doc_id),
inter AS (SELECT a.doc_id AS lo, b.doc_id AS hi, count(*) AS shared
          FROM kept a JOIN kept b
            ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id
          HAVING count(*) >= 2),
sized AS (SELECT i.lo, i.hi, i.shared, ca.n AS n_lo, cb.n AS n_hi
          FROM inter i JOIN counts ca ON i.lo = ca.doc_id
                       JOIN counts cb ON i.hi = cb.doc_id),
directed AS (
  SELECT lo AS d1, hi AS d2, shared, n_lo AS n_d1 FROM sized
  UNION ALL
  SELECT hi AS d1, lo AS d2, shared, n_hi AS n_d1 FROM sized)
SELECT d1, d2, CAST(shared AS BIGINT) AS shared, CAST(n_d1 AS BIGINT) AS n_d1,
       round(shared / n_d1, 6) AS containment
FROM directed
WHERE 4 * shared >= n_d1
ORDER BY containment DESC, d1, d2
LIMIT 500
"""


@query("dedup_shingle_containment", oracle=_containment_duck())
def dedup_shingle_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directional shingle containment |A∩B| / |A| ≥ 0.25 over ordered
    candidate pairs — the asymmetric complement of Jaccard: a short
    document quoted inside a long one scores near 1.0 on containment
    while its Jaccard stays tiny (the union is dominated by the long
    side), so symmetric dedup misses exactly the
    quotation/boilerplate-absorption case this catches.

    Determinism: intersection and set sizes are exact integers; the
    threshold compares integers (4*shared >= n ≡ containment >= 0.25);
    the only float op is one division, rounded to 6 dp on both engines.

    Scale: same blocked shingle self-join as dedup_ngram_jaccard, with
    the same pre-join DF cutoff (df <= _SHINGLE_MAX_DF) capping every
    join bucket — Σ bucket² bounded by |shingles| · maxDF. Direction
    is DERIVED, not joined: |A∩B| is symmetric, so the pair join and
    its aggregation run once over unordered (lo < hi) pairs and each
    aggregated pair explodes into its two directed rows against the
    broadcast size table — half the join output and half the
    pair-shuffle of the ordered (<>) formulation for the identical
    result set. The kept-shingle table builds once behind a pin_view
    (counts + both join sides consume it), same as
    dedup_ngram_jaccard.
    """
    register_tables(spark, sf_dir, ("documents",))
    kept = _shingle_kept_materialized(spark, "cont_kept_mat")
    counts = kept.groupBy("doc_id").agg(F.count("*").alias("n"))
    a, b = kept.alias("a"), kept.alias("b")
    # UNORDERED pair aggregation (doc_id <), then both directed rows
    # explode from each aggregated pair: |A∩B| is symmetric, so the
    # ordered (<>) join aggregated every intersection twice — half the
    # join output and half the pair-shuffle for the same result set
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("lo"), F.col("b.doc_id").alias("hi"))
        .agg(F.count("*").alias("shared"))
        .filter(F.col("shared") >= 2)
    )
    ca = counts.select(F.col("doc_id").alias("lo"), F.col("n").alias("n_lo"))
    cb = counts.select(F.col("doc_id").alias("hi"), F.col("n").alias("n_hi"))
    directed = (
        inter.join(F.broadcast(ca), "lo")
        .join(F.broadcast(cb), "hi")
        .select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("lo").alias("d1"),
                        F.col("hi").alias("d2"),
                        F.col("shared").alias("shared"),
                        F.col("n_lo").alias("n_d1"),
                    ),
                    F.struct(
                        F.col("hi").alias("d1"),
                        F.col("lo").alias("d2"),
                        F.col("shared").alias("shared"),
                        F.col("n_hi").alias("n_d1"),
                    ),
                )
            ).alias("r")
        )
        .select("r.*")
    )
    return (
        directed.filter(4 * F.col("shared") >= F.col("n_d1"))
        .select(
            "d1",
            "d2",
            F.col("shared").cast("bigint").alias("shared"),
            F.col("n_d1").cast("bigint").alias("n_d1"),
            F.round(F.col("shared") / F.col("n_d1"), 6).alias("containment"),
        )
        .orderBy(F.desc("containment"), "d1", "d2")
        .limit(500)
    )


# winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD 2003 — the
# MOSS algorithm): guarantee-bearing selection of k-gram hashes
_WIN_K = 7  # char k-gram width
_WIN_W = 4  # winnowing window (guarantee threshold t = W + K - 1 = 10)
_WIN_MIN_SHARED = 3
_WIN_MAX_DF = 100  # fingerprints in more docs than this are dropped (MOSS's
# common-code suppression): they carry no discriminative signal and their
# join buckets cost df^2 — at sf0.1 the hottest fingerprint alone generated
# 3816^2 ≈ 14.6M of the 266M pre-cutoff pair rows


def _win_kgram(elem) -> str:
    """Straight-line base-31 polynomial over the K=7 chars at window
    position i, NO modular reduction: 7 codepoints ≤ 0x10FFFF give a
    maximum value of ~1.0e15 — comfortably inside int64 — so the
    per-step ``% MOD_P`` (and the nested aggregate-over-sequence HOF
    machinery that carried it) is pure overhead. Higher-order-function
    lambdas are interpreted, not codegen'd; collapsing the inner
    aggregate to one flat arithmetic expression removes a per-position
    array allocation plus 7 lambda dispatches and 7 mods over every
    char of the corpus (measured on the sf0.1 build — see
    dedup_winnowing's docstring). ``elem(j)`` renders the char
    expression at offset j in the host dialect."""
    e = f"{elem(0)} * 31"
    for j in range(1, _WIN_K - 1):
        e = f"({e} + {elem(j)}) * 31"
    return f"({e} + {elem(_WIN_K - 1)})"


def _win_minexpr(elem) -> str:
    """least() over the W=4 hashes at window position i — replaces
    array_min(slice(...)), which allocated a W-element array per
    position."""
    return "least(" + ", ".join(elem(j) for j in range(_WIN_W)) + ")"


def _winnow_fp_frame(spark: SparkSession):
    """Surviving-fingerprint relation (doc_id, fp) through the DF
    cutoff. The per-document fingerprint selection runs in ONE
    Arrow-vectorized pandas UDF (numpy sliding windows) rather than the
    r7 SQL higher-order-function chain: HOF lambdas are
    CodegenFallback — interpreted per element, never fused into
    whole-stage codegen — and their giant generated plan also dominated
    the query's first-execution compile. A/B at sf0.1 (bench regime,
    2 runs each): full query first-exec 4.4 s (this build) vs
    6.0-6.4 s (HOF build, cache or pin barrier alike — barrier choice
    measured within noise), steady state 1.3 vs 1.0-1.1 s — the Arrow
    round trip costs ~0.3 s steady, the interpreted HOF + codegen
    costs ~1.7 s first; the gateway's one-shot regime is first-exec,
    so the vectorized build wins where it counts (VERDICT r7 ask #6).
    Value parity with the SQL pipeline is exact (same base-31 integer
    polynomial; asserted in the A/B and by the DuckDB oracle, which
    still runs the reference HOF formulation).

    100 TB note: the UDF is map-only over text (no state, no shuffle);
    numpy does ~10 ops/char in C vs an interpreted JVM lambda per
    element — the vectorized build is the formulation you'd keep on a
    cluster, with the DF cutoff and pair join unchanged."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    pow_vec = (31 ** np.arange(_WIN_K - 1, -1, -1)).astype(np.int64)

    @pandas_udf("array<long>")
    def winnow_fps(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            if t is None:
                out.append([])
                continue
            # exact codepoints (== Spark/DuckDB ascii() on this corpus)
            c = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32).astype(
                np.int64
            )
            n = c.shape[0]
            if n < _WIN_K + _WIN_W - 1:  # no full window of hashes
                out.append([])
                continue
            # base-31 7-gram polynomial at every position (max ~1e15,
            # inside int64 — same no-modulus argument as _win_kgram)
            h = np.lib.stride_tricks.sliding_window_view(c, _WIN_K) @ pow_vec
            # winnowing min over each W-window of consecutive hashes
            m = np.minimum.reduce(
                [h[j : h.shape[0] - (_WIN_W - 1) + j] for j in range(_WIN_W)]
            )
            out.append(np.unique(m).tolist())
        return pd.Series(out)

    fp = spark.table("documents").select(
        F.col("doc_id"), F.explode(winnow_fps("text")).alias("fp")
    )
    dfc = fp.groupBy("fp").agg(F.count("*").alias("c"))
    return fp.join(dfc.filter(F.col("c") <= _WIN_MAX_DF), "fp").select(
        "doc_id", "fp"
    )


def _winnow_duck() -> str:
    kgram = _win_kgram(lambda j: f"ascii(cs[i + {j}])::BIGINT")
    wmin = _win_minexpr(lambda j: f"hs[i + {j}]")
    return f"""
WITH chars AS (SELECT doc_id, string_split(text, '') AS cs FROM documents),
hs AS (
  SELECT doc_id,
         CASE WHEN len(cs) >= {_WIN_K} THEN
           list_transform(range(1, len(cs) - {_WIN_K} + 2), i -> {kgram})
         ELSE [] END AS hs
  FROM chars),
fp AS (
  SELECT DISTINCT doc_id, fp FROM (
    SELECT doc_id, unnest(
      CASE WHEN len(hs) >= {_WIN_W} THEN
        list_transform(range(1, len(hs) - {_WIN_W} + 2), i -> {wmin})
      ELSE [] END) AS fp
    FROM hs)),
df AS (SELECT fp, count(*) AS c FROM fp GROUP BY fp),
kept AS (SELECT f.doc_id, f.fp FROM fp f JOIN df ON f.fp = df.fp
         WHERE df.c <= {_WIN_MAX_DF})
SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS shared
FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id HAVING count(*) >= {_WIN_MIN_SHARED}
ORDER BY shared DESC, d1, d2 LIMIT 300
"""


@query("dedup_winnowing", oracle=_winnow_duck())
def dedup_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD 2003 —
    the MOSS plagiarism-detection selector): hash every char 7-gram,
    keep the MIN hash of each sliding window of 4 consecutive hashes,
    dedupe — the selected set carries the algorithm's guarantee that
    any shared substring of length ≥ w+k-1 = 10 chars yields at least
    one shared fingerprint, with expected density 2/(w+1) of positions.
    Candidate pairs = docs sharing ≥3 SURVIVING fingerprints, where a
    fingerprint in more than 100 documents is suppressed first (MOSS's
    common-code/boilerplate filter). Complements MinHash
    (whole-document resemblance) and containment (set asymmetry) with
    POSITIONAL overlap detection — copied passages, not just shared
    vocabulary.

    Determinism: pure integer pipeline (exact base-31 7-gram
    polynomial — no modulus needed, 7 codepoints fit int64; window
    min, DF counts, the cutoff comparison) until zero float ops;
    ORDER BY is total. The fingerprint selection runs in a vectorized
    pandas UDF computing the SAME integers as the oracle's SQL
    formulation (see _winnow_fp_frame for the measured rationale).

    Scale: per-document work is map-only higher-order-function math
    (no explode until the selected ~2/(w+1) density fingerprints);
    the pair join is blocked by fingerprint value — Σ bucket² with
    every bucket capped at the DF cutoff, so join work is bounded by
    |fp| · maxDF instead of the hottest fingerprint's df² (pre-cutoff
    the sf0.1 corpus cost 266M pair rows, post-cutoff 1.4M — a 190×
    reduction measured). The surviving-fingerprint table builds once
    behind a CacheScope because both join sides consume it; it is
    also the persistent artifact a production pipeline keeps:
    incremental screening joins a new batch's fingerprints against
    it, never re-fingerprinting the corpus (same shape as
    dedup_lsh_incremental).
    """
    from sparksql_server_spark.operators.scratch import CacheScope

    # r12: small-input spread (guide §2.5) — interleaved steady A/B -0.05/-0.39 s
    register_tables(spark, sf_dir, ("documents",), spread=("documents",))
    scope = CacheScope(spark)
    kept = _winnow_fp_frame(spark).cache()
    a, b = kept.alias("a"), kept.alias("b")
    pairs = (
        a.join(b, (F.col("a.fp") == F.col("b.fp")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .agg(F.count("*").alias("shared"))
        .filter(F.col("shared") >= _WIN_MIN_SHARED)
    )
    return (
        scope.finish_pin(pairs, "winnowing_mat")
        .orderBy(F.desc("shared"), "d1", "d2")
        .limit(300)
    )


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------


def _embdup_spark() -> str:
    from sparksql_server_spark.operators.similarity import spark_lsh_bucket

    return f"""
WITH n AS (SELECT vec_id, embedding, {spark_norm('embedding')} AS nrm,
                  {spark_lsh_bucket('embedding')} AS bucket
           FROM embeddings)
SELECT a.vec_id AS d1, b.vec_id AS d2,
       round({spark_dot('a.embedding', 'b.embedding')} / (a.nrm * b.nrm), 6) AS cos
FROM n a JOIN n b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
ORDER BY cos DESC, d1, d2
LIMIT 500
"""


def _embdup_duck() -> str:
    from sparksql_server_spark.operators.similarity import duck_lsh_bucket

    return f"""
WITH n AS (SELECT vec_id, embedding, {duck_norm('embedding')} AS nrm,
                  {duck_lsh_bucket('embedding')} AS bucket
           FROM embeddings)
SELECT a.vec_id AS d1, b.vec_id AS d2,
       round({duck_dot('a.embedding', 'b.embedding')} / (a.nrm * b.nrm), 6) AS cos
FROM n a JOIN n b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
ORDER BY cos DESC, d1, d2
LIMIT 500
"""


@query("dedup_embedding_cosine", oracle=_embdup_duck())
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup: LSH-bucket-blocked pairwise cosine,
    top pairs. The blocking key is the same random-hyperplane bucket
    the ANN operators use (similarity.spark_lsh_bucket — 8 planes, 256
    buckets, integer-derived coefficients reproduced exactly by the
    DuckDB oracle), so the dedup needs NO semantic label to exist:
    near-duplicate vectors land in the same bucket with high
    probability, pair work is Σ bucket² instead of N², and the
    pairwise join shuffles once on bucket id. (Rounds 1-4 blocked on
    the dataset's label column — a crutch real corpora lack; VERDICT
    r4 next-round #5.) Recall tuning at scale: fewer planes → bigger
    buckets → higher recall and cost; multi-probe (one-bit flips, as in
    sim_topk_lsh_multiprobe) recovers pairs split by a near-zero
    hyperplane margin without re-bucketing.

    Round 11 (the ×100 sweep measured the SQL pairwise join at 434 s,
    exponent 1.218 — interpreted-HOF dot products over Σ bucket²
    pairs, the semdedup diagnosis exactly): the within-bucket pairwise
    runs as ``applyInPandas`` over (bucket, slice-of-8) groups with
    the bit-exact numpy fold (float32 products, +0.0-seeded sequential
    float64 ``np.add.accumulate`` — semdedup's verified kernel). Each
    group emits its top-500 pairs by RAW cosine plus every pair within
    1e-6 of the 500th's raw value: rounding moves a double by at most
    5e-7, so any pair dropped under that margin rounds STRICTLY below
    ≥500 kept group-mates and can never reach the global top 500 —
    the final round/ORDER/LIMIT stays in SQL on bit-identical raw
    values, so the result is exactly the oracle's. Bucket assignment
    stays the shared SQL expression (N×planes work, one row each).
    Measured ×100: 434 s → 46.7 s, exponent 1.218 → 0.67 (the
    remaining term is Σ bucket² over the FIXED 256-bucket grid — at a
    real 100 TB the plane count grows with log2(N/target_bucket), the
    documented recall/cost dial).
    """
    register_tables(spark, sf_dir, ("embeddings",))
    import numpy as np
    import pandas as pd

    from sparksql_server_spark.operators.similarity import spark_lsh_bucket

    _exact_dots = exact_numpy_dots  # the shared bit-exact fold kernel

    top = 500
    # r12 (guide §2.5/§4): the slice-of-8 bucket split exists for the
    # ×100 regime's fat LSH buckets; at a tiny corpus it only
    # 8×-duplicates the embedding payload through the shuffle and
    # turns 256 Arrow groups into 2048 (session-alternated A/B ×2 at
    # sf0.1's 2k vectors / 0.8 MB: salt 8 → 1 is ~2.6-3.1 → 1.2-1.5 s
    # steady, first-exec ~4.7-5.8 → 3.1-3.3 s). Sized from
    # the input's on-disk bytes — free to read driver-side, and the
    # ×100 rig (~80 MB) keeps the full split. The per-group top-500 +
    # rounding-margin proof in the docstring is grouping-independent,
    # so the result is bit-identical under any salt.
    from sparksql_server_spark.catalog import _dir_bytes
    import os as _os

    emb_bytes = _dir_bytes(_os.path.join(sf_dir, "embeddings.parquet"))
    salt = 8 if emb_bytes >= 16 * 1024 * 1024 else 1
    n = spark.sql(
        f"""SELECT vec_id, embedding, {spark_norm('embedding')} AS nrm,
               {spark_lsh_bucket('embedding')} AS bucket FROM embeddings"""
    )

    def _bucket_pairs(key, pdf):
        sl = int(key[1])
        pdf = pdf.sort_values("vec_id")
        vecs = np.stack(pdf["embedding"].to_numpy()).astype(
            np.float32, copy=False
        )
        nrm = pdf["nrm"].to_numpy()
        vids = pdf["vec_id"].to_numpy()
        d1s, d2s, coss = [], [], []
        for j in range(1, len(pdf)):
            if vids[j] % salt != sl:
                continue
            dots = _exact_dots(vecs[:j], vecs[j])
            cos = dots / (nrm[:j] * nrm[j])
            d1s.append(vids[:j])
            d2s.append(np.full(j, vids[j]))
            coss.append(cos)
        if not coss:
            return pd.DataFrame(
                {
                    "d1": pd.Series([], dtype="int64"),
                    "d2": pd.Series([], dtype="int64"),
                    "cos": pd.Series([], dtype="float64"),
                }
            )
        d1 = np.concatenate(d1s)
        d2 = np.concatenate(d2s)
        cos = np.concatenate(coss)
        if len(cos) > top:
            kth = np.partition(cos, len(cos) - top)[len(cos) - top]
            keep = cos >= kth - 1e-6  # rounding-safe margin (docstring)
            d1, d2, cos = d1[keep], d2[keep], cos[keep]
        return pd.DataFrame({"d1": d1, "d2": d2, "cos": cos})

    pairs = (
        n.withColumn("sl", F.explode(F.expr(f"sequence(0, {salt - 1})")))
        .groupBy("bucket", "sl")
        .applyInPandas(_bucket_pairs, "d1 bigint, d2 bigint, cos double")
    )
    return (
        pairs.select("d1", "d2", F.round("cos", 6).alias("cos"))
        .orderBy(F.desc("cos"), "d1", "d2")
        .limit(top)
    )


# ---------------------------------------------------------------------------
# duplicate clustering: connected components over the near-dup graph
# ---------------------------------------------------------------------------

# the MinHash chain through the band rows — executed standalone and
# spilled before the edge self-join. NOT for dedup of the join sides
# (ReuseExchange computes the symmetric bs subtree once either way):
# splitting the plan at the natural LSH-index boundary nearly halves
# the query's FIRST execution (4.1 -> 2.4 s at sf0.1 — analysis +
# codegen of one giant plan costs more than two small ones), which is
# the regime a one-shot gateway query lives in; steady-state repeats
# pay ~0.15 s for the parquet round-trip. The spilled band relation
# is also the artifact a production pipeline persists as its LSH
# index. Composed from the CANONICAL chain text (_mh_candidate_ctes)
# so the cluster graph can never drift from the LSH pipeline it is
# documented to share; the unreferenced cand CTE is pruned at
# analysis.
_CC_BANDS_SPARK = f"""
WITH {_mh_candidate_ctes('spark')}
SELECT doc_id, band, band_sig FROM bs
"""

# both directions off the spilled band relation, one pass
_CC_EDGE_FROM_BANDS = """
SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
FROM {bands} a JOIN {bands} b
  ON a.band = b.band AND a.band_sig = b.band_sig AND a.doc_id <> b.doc_id
"""

_CC_DUCK = f"""
WITH RECURSIVE
w AS (SELECT doc_id, {duck_words('text')} AS w FROM documents),
sh AS (SELECT DISTINCT doc_id, shingle FROM
         (SELECT doc_id, unnest({duck_shingles('w')}) AS shingle FROM w)),
h AS (SELECT doc_id, {duck_char_hash('shingle')} AS h FROM sh),
mh AS (SELECT doc_id, {_MH_MINS} FROM h GROUP BY doc_id),
bs AS ({_DUCK_BANDS}),
edges AS (SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
          FROM bs a JOIN bs b
            ON a.band = b.band AND a.band_sig = b.band_sig
           AND a.doc_id <> b.doc_id),
reach(node, r) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.node)
SELECT node AS doc_id, min(r) AS cluster_id
FROM reach GROUP BY node
"""


@query("dedup_clusters", oracle=_CC_DUCK)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster resolution: connected components over the
    MinHash-band near-dup graph, labeling every document with the min
    doc_id of its component (the canonical copy a training pipeline
    keeps).

    Pair queries (above) only emit *edges*; real dedup needs the
    transitive closure — A~B and B~C must collapse A,B,C together
    even when A,C never share a bucket. Spark side: iterative min-
    label propagation (the dataframe form of large-star/small-star),
    one shuffle per round, lineage cut with localCheckpoint each
    round, terminating when a round changes nothing — rounds taken =
    graph diameter, not size. Oracle: recursive-CTE transitive
    closure computing the same min-reachable label.

    Round-9 floor measurement (VERDICT r8 ask #5; sf0.1, fresh
    session, tools/firstexec_ab.py): first-exec 8.06 s vs steady
    2.98 s. The delta is compile, split across the shared MinHash band
    pipeline (_mh_candidate_ctes — the same expression the whole LSH
    family compiles, already barrier-optimized with pin() in r8) and
    one small plan per propagation round; the per-round plans are
    already minimal (join + union + min-agg over a LogicalRDD), and
    the r8 A/B showed pin beating the parquet spill here in both
    regimes. No further structural lever short of caching Janino
    output across sessions, which Spark does not expose — the floor
    stands as measured.
    """
    from pyspark.sql import functions as F

    from sparksql_server_spark.operators.scratch import (
        CacheScope,
        persistent_rdd_ids,
        unpersist_ids,
    )

    from sparksql_server_spark.operators.scratch import pin

    # r12: small-input spread (guide §2.5) — interleaved steady A/B -0.39/-0.57 s
    register_tables(spark, sf_dir, ("documents",), spread=("documents",))
    scope = CacheScope(spark)
    # materialize the edge set ONCE — the loop must iterate over rows,
    # not re-run the MinHash pipeline every round; the band relation
    # materializes first (see _CC_BANDS_SPARK: first-execution plan
    # split, and the persisted-LSH-index shape). Barrier choice
    # (r8 A/B at sf0.1, 2 runs each): pin (eager localCheckpoint)
    # beats the r7 parquet spill in both regimes — first-exec 4.7/4.9
    # vs 5.0/5.2 s, steady 2.7 vs 2.9 s — and the pin lives inside
    # this CacheScope, so scope.finish still releases it (hygiene
    # gate unchanged, leftover RDDs 0 in the A/B harness).
    pin(spark.sql(_CC_BANDS_SPARK)).createOrReplaceTempView("cc_bands_mat")
    edges = spark.sql(
        _CC_EDGE_FROM_BANDS.format(bands="cc_bands_mat")
    ).localCheckpoint(eager=True)
    # only nodes with edges need propagation; isolated docs are their
    # own cluster and skip the loop entirely (at 100 TB the duplicate
    # subgraph is a small fraction of the corpus)
    ids_pre_labels = persistent_rdd_ids(spark)
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("cluster_id", F.col("doc_id"))
        .localCheckpoint(eager=True)
    )
    # ids backing the CURRENT labels checkpoint — each round releases
    # the predecessor's blocks once the successor is materialized (the
    # loop holds exactly edges + one labels generation, not 20)
    labels_ids = persistent_rdd_ids(spark) - ids_pre_labels
    prev_sum = labels.agg(F.sum("cluster_id")).collect()[0][0] or 0
    for _ in range(20):  # cap >> any real duplicate-graph diameter
        msgs = (
            edges.join(labels, edges.dst == labels.doc_id)
            .select(F.col("src").alias("doc_id"), "cluster_id")
        )
        before = persistent_rdd_ids(spark)
        labels = (
            labels.unionByName(msgs)
            .groupBy("doc_id")
            .agg(F.min("cluster_id").alias("cluster_id"))
            .localCheckpoint(eager=True)  # cut lineage between rounds
        )
        new_ids = persistent_rdd_ids(spark) - before
        # eager=True above means the new generation is fully built from
        # the old one — the predecessor's blocks are now dead weight
        unpersist_ids(spark, labels_ids)
        labels_ids = new_ids
        # min-label sums decrease monotonically; a stable sum == fixpoint
        # (one aggregate action per round, no join-and-compare pass)
        cur_sum = labels.agg(F.sum("cluster_id")).collect()[0][0] or 0
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    singletons = (
        spark.table("documents")
        .select("doc_id")
        .join(labels.select("doc_id"), "doc_id", "left_anti")
        .withColumn("cluster_id", F.col("doc_id"))
    )
    result = labels.unionByName(singletons)
    # spill the |documents|-sized label table, release edges + the last
    # labels generation — no scoped block survives the return
    return scope.finish_pin(result, "dedup_clusters_mat")


def _prefix_filter_sql() -> str:
    """PPJoin-style prefix-filtered set-similarity join — DuckDB oracle.

    Jaccard >= 0.6 over 3-gram shingle sets. All threshold math is
    integer-exact (tau = 6/10): prefix length sz - ceil(0.6*sz) + 1 via
    (6*sz + 9) intdiv 10, length filter 10*min >= 6*max, positional
    filter 1 + min(sz-pos) >= alpha with alpha = ceil(6*(sa+sb)/16) via
    (6*(sa+sb) + 15) intdiv 16, verification 16*i >= 6*(sa+sb) — no
    float boundary can diverge between engines.
    """
    words, shingles = duck_words("text"), duck_shingles("w")
    return f"""
WITH w AS (SELECT doc_id, {shingles} AS sh
           FROM (SELECT doc_id, {words} AS w FROM documents)),
sh AS (SELECT DISTINCT doc_id, shingle FROM
       (SELECT doc_id, unnest(sh) AS shingle FROM w)),
df AS (SELECT shingle, count(*) AS freq FROM sh GROUP BY shingle),
sized AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
pos AS (
  SELECT s.doc_id, s.shingle, z.sz,
         row_number() OVER (PARTITION BY s.doc_id
                            ORDER BY d.freq, s.shingle) AS pos
  FROM sh s JOIN df d ON s.shingle = d.shingle
            JOIN sized z ON s.doc_id = z.doc_id),
pref AS (SELECT doc_id, shingle, sz, pos FROM pos
         WHERE pos <= sz - ((6 * sz + 9) // 10) + 1),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM pref a JOIN pref b
    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
   AND 10 * least(a.sz, b.sz) >= 6 * greatest(a.sz, b.sz)
   AND 1 + least(a.sz - a.pos, b.sz - b.pos)
       >= (6 * (a.sz + b.sz) + 15) // 16),
arrs AS (SELECT doc_id, list(shingle) AS arr, count(*) AS sz
         FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, za.sz AS sza, zb.sz AS szb,
         len(list_intersect(za.arr, zb.arr)) AS i
  FROM cand c
  JOIN arrs za ON za.doc_id = c.doc_a
  JOIN arrs zb ON zb.doc_id = c.doc_b)
SELECT doc_a, doc_b,
       round(CAST(i AS DOUBLE) / (sza + szb - i), 6) AS jaccard
FROM inter
WHERE 16 * i >= 6 * (sza + szb)
"""


@query("dedup_prefix_filter_join", oracle=_prefix_filter_sql())
def dedup_prefix_filter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-similarity self-join with PREFIX FILTERING (PPJoin family):
    exact Jaccard >= 0.6 pairs over 3-gram shingle sets, but candidate
    generation touches only each document's rarest-token prefix.

    Order every doc's shingles by global document frequency (rarest
    first); if J(x, y) >= tau, the first sz - ceil(tau*sz) + 1 tokens of
    each side must intersect — so the candidate join runs on the short
    rare prefix, not the full set. Pair work is sum of per-prefix-token
    bucket squared, and because prefixes hold the RAREST tokens those
    buckets are the smallest available: the frequent-shingle blowup an
    unfiltered shingle join suffers never happens. Two more exact
    prunes before any pair materializes: the length filter
    (10*min >= 6*max) and PPJoin's positional filter — a match at
    prefix positions (pa, pb) caps the overlap at
    1 + min(sa-pa, sb-pb), which must reach the Jaccard overlap bound
    alpha = ceil(tau/(1+tau)*(sa+sb)); any true pair keeps its
    earliest prefix match, so no false negatives.

    The shingle relation feeds every plan branch (frequency table, both
    candidate sides, the per-doc array build); as SQL text Spark would
    inline and recompute the explode+DISTINCT each time, so the
    DataFrame build CACHES it once — the same single-materialization a
    production PPJoin gets from writing its token index to storage.
    Verification never re-explodes: each doc's shingle set rides as ONE
    array row (|docs| rows, broadcast here; a keyed join at 100 TB),
    and the intersection is a JVM array_intersect per candidate —
    map-side, no per-token shuffle. All threshold arithmetic is
    integer-exact; verification is 16*i >= 6*(sa+sb) — no float
    boundary divergence between engines.

    First-execution floor (VERDICT r7 ask #6, measured at sf0.1): the
    bench-regime cost is compile-dominated, not data-dominated —
    steady-state runs are 1.3-1.4 s while first-exec is ~7 s, and
    swapping every .cache() barrier for an eager localCheckpoint
    (scratch.pin, the lever that paid on lsh_eval/clusters) measured
    WITHIN NOISE here (first 6.8-7.2 vs 7.0-7.5 s over 2 runs each):
    the three-window ranking pipeline + two-phase join plan costs its
    analysis/codegen once regardless of where the barriers sit. The
    per-token work itself is already minimal (each relation builds
    once behind a barrier, the candidate join touches only rare
    prefixes), so the remaining first-exec cost is Catalyst/Janino,
    which amortizes in any session that runs the query more than
    once.
    """
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from sparksql_server_spark.operators.scratch import CacheScope

    # r12: small-input spread (guide §2.5) — interleaved steady A/B -0.08/-0.25 s
    register_tables(spark, sf_dir, ("documents",), spread=("documents",))
    scope = CacheScope(spark)
    docs = spark.table("documents")
    w = docs.select("doc_id", F.expr(spark_words("text")).alias("w"))
    sh = (
        w.select("doc_id", F.explode(F.expr(spark_shingles("w"))).alias("shingle"))
        .distinct()
        .cache()
    )
    # document frequency and set size as unbounded-frame window counts:
    # two shuffles (by shingle, by doc) and NO join stages — the doc
    # partition is then reused by the ranking window
    pos = (
        sh.withColumn("freq", F.count("*").over(W.partitionBy("shingle")))
        .withColumn("sz", F.count("*").over(W.partitionBy("doc_id")))
        .withColumn(
            "pos",
            F.row_number().over(W.partitionBy("doc_id").orderBy("freq", "shingle")),
        )
    )
    # cached: feeds BOTH sides of the candidate self-join (inlined, the
    # window pipeline would compute twice)
    pref = (
        pos.filter(F.col("pos") <= F.col("sz") - F.expr("(6 * sz + 9) div 10") + 1)
        .select("doc_id", "shingle", "sz", "pos")
        .cache()
    )
    a = pref.select(
        F.col("doc_id").alias("doc_a"),
        F.col("shingle"),
        F.col("sz").alias("sa"),
        F.col("pos").alias("pa"),
    )
    b = pref.select(
        F.col("doc_id").alias("doc_b"),
        F.col("shingle"),
        F.col("sz").alias("sb"),
        F.col("pos").alias("pb"),
    )
    cand = (
        a.join(b, "shingle")
        .filter(
            (F.col("doc_a") < F.col("doc_b"))
            & (10 * F.least("sa", "sb") >= 6 * F.greatest("sa", "sb"))
            & (
                1 + F.least(F.col("sa") - F.col("pa"), F.col("sb") - F.col("pb"))
                >= F.expr("(6 * (sa + sb) + 15) div 16")
            )
        )
        .select("doc_a", "doc_b")
        .distinct()
    )
    # cached: za and zb are DIFFERENTLY-ALIASED projections of this
    # aggregate, so exchange reuse does not kick in — uncached, each
    # broadcast build re-runs the collect_list shuffle over the shingle
    # relation (measured: the verify stage halves with the cache)
    arrs = sh.groupBy("doc_id").agg(
        F.collect_list("shingle").alias("arr"), F.count("*").alias("sz")
    ).cache()
    za = arrs.select(
        F.col("doc_id").alias("doc_a"), F.col("arr").alias("arr_a"), F.col("sz").alias("sza")
    )
    zb = arrs.select(
        F.col("doc_id").alias("doc_b"), F.col("arr").alias("arr_b"), F.col("sz").alias("szb")
    )
    inter = (
        cand.join(F.broadcast(za), "doc_a")
        .join(F.broadcast(zb), "doc_b")
        .withColumn("i", F.size(F.array_intersect("arr_a", "arr_b")))
    )
    result = inter.filter(16 * F.col("i") >= 6 * (F.col("sza") + F.col("szb"))).select(
        "doc_a",
        "doc_b",
        F.round(
            F.col("i").cast("double") / (F.col("sza") + F.col("szb") - F.col("i")),
            6,
        ).alias("jaccard"),
    )
    # materialize the (matched-pairs-sized) result while sh/pref are
    # cached, then drop both — no scoped block survives the return
    return scope.finish_pin(result, "dedup_ppjoin_mat").orderBy("doc_a", "doc_b")


# ---------------------------------------------------------------------------
# MinHash calibration: estimated vs exact Jaccard on LSH candidates
# ---------------------------------------------------------------------------


def _mh_calibration_sql(dialect: str, sh_from: str | None = None) -> str:
    """Sketch-quality audit: for every LSH candidate pair, the
    K=16-component MinHash Jaccard estimate vs the EXACT shingle-set
    Jaccard — measure the sketch, don't trust it.

    ``sh_from``: as in _mh_candidate_ctes — the name of a relation
    already holding the canonical (doc_id, shingle) rows; the sh CTE
    here has FOUR consumers (hash chain, sizes, both inter sides), so
    without a barrier Spark's CTE inlining re-runs the
    explode+DISTINCT per consumer."""
    if dialect == "spark":
        words, shing, chash = spark_words("text"), spark_shingles("w"), spark_char_hash("shingle")
        explode = f"FROM w LATERAL VIEW explode({shing}) t AS shingle"
        bands = f"SELECT doc_id, band, band_sig FROM mh LATERAL VIEW stack({_MH_K // _MH_R}, {_STACK_ARGS}) s AS band, band_sig"
    else:
        words, chash = duck_words("text"), duck_char_hash("shingle")
        explode = f"FROM (SELECT doc_id, unnest({duck_shingles('w')}) AS shingle FROM w)"
        bands = _DUCK_BANDS
    eq_terms = " + ".join(
        f"(CASE WHEN a.m{j} = b.m{j} THEN 1 ELSE 0 END)" for j in range(_MH_K)
    )
    # ADVICE r12: only emit the `w` CTE in the inline branch — with
    # sh_from set, nothing references it (dead SQL in every plan and a
    # drift trap if it ever diverged from _sh_canonical_sql's text)
    if sh_from is not None:
        w_cte = ""
        sh_body = f"SELECT doc_id, shingle FROM {sh_from}"
    else:
        w_cte = f"w AS (SELECT doc_id, {words} AS w FROM documents),\n"
        sh_body = f"SELECT DISTINCT doc_id, shingle {explode}"
    return f"""
WITH {w_cte}sh AS ({sh_body}),
h AS (SELECT doc_id, {chash} AS h FROM sh),
mh AS (SELECT doc_id, {_MH_MINS} FROM h GROUP BY doc_id),
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


@query("dedup_minhash_calibration", oracle=_mh_calibration_sql("duck"))
def dedup_minhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-quality audit for the MinHash pipeline: on every LSH
    candidate pair, compare the 16-component signature estimate to the
    exact shingle-set Jaccard (mean/max absolute error). The number
    that tells you whether K=16 suffices for your dedup threshold
    BEFORE you trust it on 100 TB.

    Scale: candidates come from the banded join (Σ bucket², never
    all-pairs); the exact-Jaccard verification joins shingles only for
    candidate pairs (candidate-bounded, the PPJoin verification
    pattern); signatures join by doc_id. Float determinism: est_j is
    an exact multiple of 1/16, exact_j one double division of exact
    BIGINTs; only the final avg is order-sensitive in its last ulps.
    """
    from sparksql_server_spark.operators.scratch import pin_view

    # r12: small-input spread (guide §2.5) — interleaved steady A/B -0.33/-0.37 s
    register_tables(spark, sf_dir, ("documents",), spread=("documents",))
    # r12: the sh CTE feeds FOUR consumers (hash chain, sizes, both
    # inter sides) — the dedup_lsh_eval_pr shape — so materialize it
    # once behind pin_view instead of letting CTE inlining re-run the
    # explode+DISTINCT per consumer. Interleaved same-session A/B
    # (tools/specs/mh_cal_pin.py, 2 rounds × 3 trials): first-exec
    # 6.30 → 2.29 s (second full exec 8.7/2.8 → 2.0/1.4), steady-min
    # 1.43 → 1.39 s (wash); values identical to the last ulp of the
    # two order-sensitive avg() columns (diff ≤ 6e-16, comparator
    # rounds at 6 dp).
    w_body, ex = _sh_canonical_sql("spark")
    pin_view(spark, spark.sql(f"WITH w AS ({w_body}) {ex}"), "mh_cal_sh_mat")
    return spark.sql(_mh_calibration_sql("spark", sh_from="mh_cal_sh_mat"))


# ---------------------------------------------------------------------------
# incremental dedup: new batch probed against an existing corpus index
# ---------------------------------------------------------------------------

_INC_SPLIT = 400  # doc_id < 400 = the already-indexed corpus; rest = incoming


def _incremental_sql(dialect: str) -> str:
    if dialect == "spark":
        words, chash = spark_words("text"), spark_char_hash("shingle")
        explode = f"FROM w LATERAL VIEW explode({spark_shingles('w')}) t AS shingle"
        bands = f"SELECT doc_id, band, band_sig FROM mh LATERAL VIEW stack({_MH_K // _MH_R}, {_STACK_ARGS}) s AS band, band_sig"
    else:
        words, chash = duck_words("text"), duck_char_hash("shingle")
        explode = f"FROM (SELECT doc_id, unnest({duck_shingles('w')}) AS shingle FROM w)"
        bands = _DUCK_BANDS
    return f"""
WITH w AS (SELECT doc_id, {words} AS w FROM documents),
sh AS (SELECT DISTINCT doc_id, shingle {explode}),
h AS (SELECT doc_id, {chash} AS h FROM sh),
mh AS (SELECT doc_id, {_MH_MINS} FROM h GROUP BY doc_id),
bs AS ({bands}),
corpus AS (SELECT * FROM bs WHERE doc_id < {_INC_SPLIT}),
incoming AS (SELECT * FROM bs WHERE doc_id >= {_INC_SPLIT}),
hits AS (
  SELECT i.doc_id AS new_doc, c.doc_id AS dup_of,
         CAST(count(*) AS BIGINT) AS n_bands
  FROM incoming i JOIN corpus c
    ON i.band = c.band AND i.band_sig = c.band_sig
  GROUP BY i.doc_id, c.doc_id)
SELECT new_doc, min(dup_of) AS first_match,
       CAST(count(*) AS BIGINT) AS n_matches,
       CAST(max(n_bands) AS BIGINT) AS best_band_overlap
FROM hits GROUP BY new_doc
ORDER BY new_doc
"""


@query("dedup_incremental_lsh", oracle=_incremental_sql("duck"))
def dedup_incremental_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup screening — the production shape batch
    dedup queries miss: an INCOMING batch (doc_id >= 400 standing in
    for today's crawl) probes the EXISTING corpus index (doc_id < 400)
    for LSH band collisions; flagged newcomers list their first corpus
    match and collision strength. Asymmetric by design: the corpus
    side is the precomputed signature index (at 100 TB, a stored
    banded table — never recomputed per batch), the incoming side is
    the only fresh work, and corpus-internal pairs are never revisited.

    Scale: incoming signatures are one pass over the new batch; the
    probe is a bucketed equi-join on (band, band_sig) — cost is
    Σ per-bucket incoming x corpus, never all-pairs; the final rollup
    groups by incoming doc only.
    """
    # r12: small-input spread (guide §2.5) — interleaved steady A/B -0.44/-0.55 s
    register_tables(spark, sf_dir, ("documents",), spread=("documents",))
    return spark.sql(_incremental_sql("spark"))


# ---------------------------------------------------------------------------
# SemDeDup: semantic dedup inside k-means-style cells
# ---------------------------------------------------------------------------

# coarse-quantizer size: K = max(16, ceil(sqrt(N))) centroids, taken as
# the vectors with vec_id in [100, 100+K). A FIXED K is the
# constant-bucket ceiling the r6 verdict flagged on simhash: with 16
# cells forever, within-cell pair work trends to N²/16 (measured
# exponent 0.88 at ×10, the corpus's worst after the simhash fix).
# K ∝ sqrt(N) is the standard balanced IVF choice — assignment cost
# N·K and within-cell cost N²/K both become N^1.5 (FAISS's nlist
# guidance). K is computed IN-QUERY from a scalar-subquery count so
# both engines derive the identical grid; sqrt/ceil are correctly
# rounded in both, and the count is an integer, so the boundary agrees
# exactly.
_SEM_MIN_CELLS = 16
_SEM_K = (
    f"(SELECT greatest({_SEM_MIN_CELLS}, CAST(ceil(sqrt(count(*))) AS BIGINT))"
    " FROM embeddings)"
)
_SEM_EPS = (0.45, 0.40, 0.35, 0.30)  # pruning-threshold sweep (calibrated:
# max observed within-cell cosine on the synthetic embeddings is ~0.49 at
# sf0.01 and ~0.60 at sf0.1, so the grid sits inside the regime where the
# operator actually removes vectors at every test scale)


def _semdedup_sql(dot, norm) -> str:
    """Reference semantics (and the DuckDB oracle): nearest-centroid
    cell assignment, within-cell lower-id-neighbor max cosine, and a
    per-cell rollup of how many members each pruning threshold would
    remove. The Spark side computes the IDENTICAL values through a
    restructured plan (see dedup_semdedup_cells) — DuckDB materializes
    the reused CTE and has no window-shuffle cost, so this single
    statement stays the right oracle shape."""
    rm_cols = ",\n       ".join(
        f"CAST(coalesce(sum(CASE WHEN v.best_cos >= {eps} THEN 1 END), 0) "
        f"AS BIGINT) AS rm_ge_{int(round(eps * 100)):02d}"
        for eps in _SEM_EPS
    )
    return f"""
WITH n AS (SELECT vec_id, embedding, {norm('embedding')} AS nrm FROM embeddings),
c AS (SELECT vec_id AS c_id, embedding AS c_emb, nrm AS c_nrm FROM n
      WHERE vec_id >= 100 AND vec_id < 100 + {_SEM_K}),
assign AS (
  SELECT vec_id, embedding, nrm, c_id,
         row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, c_id) AS rn
  FROM (SELECT n.vec_id, n.embedding, n.nrm, c.c_id,
               {dot('n.embedding', 'c_emb')} / (n.nrm * c_nrm) AS cos
        FROM n CROSS JOIN c)),
cell AS (SELECT vec_id, embedding, nrm, c_id FROM assign WHERE rn = 1),
verdict AS (
  SELECT b.vec_id, max({dot('a.embedding', 'b.embedding')} / (a.nrm * b.nrm)) AS best_cos
  FROM cell a JOIN cell b ON a.c_id = b.c_id AND a.vec_id < b.vec_id
  GROUP BY b.vec_id)
SELECT cell.c_id AS cell_id,
       CAST(count(*) AS BIGINT) AS n_members,
       CAST(round(max(coalesce(v.best_cos, -1.0)), 6) AS DOUBLE) AS max_cos,
       {rm_cols}
FROM cell LEFT JOIN verdict v ON cell.vec_id = v.vec_id
GROUP BY cell.c_id
ORDER BY cell.c_id
"""


@query("dedup_semdedup_cells", oracle=_semdedup_sql(duck_dot, duck_norm))
def dedup_semdedup_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): cluster embeddings with a coarse
    k-means quantizer, then prune near-duplicates WITHIN each cluster
    by cosine threshold — pairwise work drops from N^2 to sum of
    cell^2 because cross-cluster pairs are never formed. A vector is
    removed when a lower-id member of its cell sits within epsilon;
    the rollup reports, per cell, the member count, the hottest
    within-cell cosine, and the removal count at each threshold in the
    sweep (the pruning-rate-vs-epsilon curve the paper tunes on).

    Complements dedup_embedding_cosine (hyperplane-LSH blocking,
    pair-level output) with the centroid-blocked cluster view: LSH
    buckets bound the HIGH-similarity regime cheaply, centroid cells
    give every vector a home so removal fractions are exact per
    cluster.

    Determinism: cosines are bit-identical across engines (vector.py:
    same IEEE ops in the same order), so >= threshold comparisons
    agree exactly; counts are integers; the one rounded float column
    rounds to 6 dp on both sides.

    Scale: the quantizer size scales with the corpus — K =
    max(16, ceil(sqrt(N))) centroids (the balanced IVF choice:
    assignment N·K and within-cell Σ|cell|² ≈ N²/K are both N^1.5;
    a FIXED grid was the constant-bucket ceiling the r6 verdict
    flagged on simhash, measured exponent 0.88 at ×10 before this
    change). Centroids broadcast (K rows, map-only assignment — at
    100 TB the assignment is a partition column written once by the
    offline k-means job, where K follows the same sqrt rule); the
    within-cell self-join is an equi-join on cell id with skewed
    cells the remaining tunable (split hot cells by re-k-meansing,
    exactly as FAISS shards hot IVF lists); the rollup is a
    combinable per-cell aggregate. Reference parity: extends the
    reference's scan-bag sharing philosophy to the embedding-curation
    workload (no analogue in sparksql-server; north-star set,
    BASELINE.json).

    Round 11 Spark-plan restructure (the ×100 sweep measured the
    single-statement form at 232 s, exponent 1.048). Diagnosis on the
    ×100 corpus: Σ|cell|² = 250M pair evaluations plus 90M assignment
    evaluations, ~all of it interpreted-HOF fold time at ~20 µs/eval
    (pair ENUMERATION alone — the join machinery — took 4.9 s; two
    rewrites that kept the dot in SQL measured 160 s, and a 64-term
    unrolled codegen chain measured 5× WORSE than the fold because
    cross-join projections evaluate interpreted). This is exactly the
    guide's "UDFs are the slow path … unless the built-in operator
    can't express it": 340M exact-order dot products is vectorized
    linear algebra, so the hot paths move to Arrow-batched numpy that
    reproduces both engines' folds BIT-FOR-BIT — float32 element
    products (IEEE multiply, same op everywhere) accumulated
    left-to-right in float64 by ``np.add.accumulate`` seeded with +0.0
    (sequential by definition, unlike ``np.sum``'s pairwise order;
    verified bitwise against the DuckDB fold over 40k pair dots and
    all norms). The one semantic change, mirrored in the oracle: the
    ASSIGNMENT cosine is no longer pre-rounded to 6 dp (decimal
    rounding has no cheap vectorized exact twin), so nearest-centroid
    ties now require bit-equal cosines — broken by smallest c_id as
    before (numpy argmax keeps the first maximum of the id-sorted
    centroid list, byte-equal to ``ORDER BY cos DESC, c_id``).

    Plan shape: centroids (K = O(sqrt N) rows) collect to the driver
    and ride the UDF closure — the same bound as any broadcast dim;
    assignment is one ``mapInPandas`` pass (chunked R×K×dim products,
    no join, no shuffle); the assigned cells spill ONCE to scratch
    parquet (CacheScope, the shingle-build pattern) and both remaining
    consumers read the compact spill — at 100 TB this is the
    persistent cell-map artifact the offline k-means job would
    produce; the within-cell pairwise max runs as ``applyInPandas``
    over (cell, slice-of-8) groups — each member is scored in exactly
    one slice of its cell, every slice group carries the whole cell as
    the lower-id side, so the ×100 corpus's 26×-skewed hottest cell
    (11,578 members, 67M pairs) spreads over 8 tasks instead of
    stalling one. Measured ×100 (200k vectors): 232 s → 30.8 s,
    exponent 1.048 → 0.53; sf0.1 first-exec pays ~0.5-1 s of Arrow
    worker overhead (1.9 → 2.7 s) — the right trade by 100× scale.

    Assumes non-zero, uniform-dimension embeddings (zero-norm rows
    divide 0/0 — NaN in numpy where SQL may yield NULL).
    """
    register_tables(spark, sf_dir, ("embeddings",))
    import math

    import numpy as np
    import pandas as pd

    from sparksql_server_spark.operators.scratch import CacheScope

    _exact_dots = exact_numpy_dots  # the shared bit-exact fold kernel

    emb = spark.table("embeddings")
    n_rows = emb.count()
    k = max(_SEM_MIN_CELLS, math.ceil(math.sqrt(n_rows)))
    cent = (
        emb.filter((F.col("vec_id") >= 100) & (F.col("vec_id") < 100 + k))
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    )
    out_schema = (
        "cell_id bigint, n_members bigint, max_cos double, "
        + ", ".join(
            f"rm_ge_{int(round(eps * 100)):02d} bigint" for eps in _SEM_EPS
        )
    )
    if not cent:  # degenerate no-centroid input: the oracle's rn=1 row
        # never exists, so the result is empty with the same schema
        return spark.createDataFrame([], out_schema)
    c_mat = np.array([r.embedding for r in cent], dtype=np.float32)
    c_ids = np.array([r.vec_id for r in cent], dtype=np.int64)
    c_nrm = np.sqrt(_exact_dots(c_mat, c_mat))

    def _assign(batches):
        # chunk so the R×K×dim product tensor stays ~32 MB in float64
        chunk = max(1, (1 << 22) // max(1, c_mat.shape[0] * c_mat.shape[1]))
        for pdf in batches:
            vecs = np.stack(pdf["embedding"].to_numpy()).astype(
                np.float32, copy=False
            )
            nrm = np.sqrt(_exact_dots(vecs, vecs))
            best = np.empty(len(pdf), dtype=np.int64)
            for lo in range(0, len(pdf), chunk):
                hi = min(lo + chunk, len(pdf))
                dots = _exact_dots(vecs[lo:hi, None, :], c_mat[None, :, :])
                cos = dots / (nrm[lo:hi, None] * c_nrm[None, :])
                # argmax keeps the FIRST max -> smallest c_id on ties
                best[lo:hi] = c_ids[np.argmax(cos, axis=1)]
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "embedding": pdf["embedding"],
                    "nrm": nrm,
                    "c_id": best,
                }
            )

    id_type = emb.schema["vec_id"].dataType.simpleString()
    cell = CacheScope(spark).finish_pin(
        emb.select("vec_id", "embedding").mapInPandas(
            _assign,
            f"vec_id {id_type}, embedding array<float>, nrm double, c_id bigint",
        ),
        "semdedup_cell_mat",
    )

    # r12 (guide §2.5/§4): the slice-of-8 skew split exists for the
    # ×100 regime's 26×-skewed hot cells (11,578 members); below ~50k
    # vectors the hottest cell is a few hundred members, Σ|cell|² is
    # trivial, and the split only 8×-duplicates the embedding payload
    # through the shuffle and multiplies Arrow group overhead
    # (session-alternated A/B ×2 at sf0.1's 2k vectors: salt 8 → 1 is
    # ~3.3-4.3 → 2.6-3.2 s steady, first-exec ~6.2 → 4.7-5.3 s).
    # Derived from the already-counted corpus size, so the ×100 sweep
    # (200k vectors) keeps the full split.
    salt = 8 if n_rows >= 50_000 else 1

    def _cell_best(key, pdf):
        sl = int(key[1])
        pdf = pdf.sort_values("vec_id")
        vecs = np.stack(pdf["embedding"].to_numpy()).astype(
            np.float32, copy=False
        )
        nrm = pdf["nrm"].to_numpy()
        vids = pdf["vec_id"].to_numpy()
        out_ids, out_cos = [], []
        for j in range(1, len(pdf)):
            if vids[j] % salt != sl:
                continue  # scored in its own slice group
            dots = _exact_dots(vecs[:j], vecs[j])
            cos = dots / (nrm[:j] * nrm[j])
            out_ids.append(vids[j])
            out_cos.append(cos.max())
        return pd.DataFrame(
            {
                "vec_id": pd.Series(out_ids, dtype="int64"),
                "best_cos": pd.Series(out_cos, dtype="float64"),
            }
        )

    verdict = (
        cell.withColumn("sl", F.explode(F.expr(f"sequence(0, {salt - 1})")))
        .groupBy("c_id", "sl")
        .applyInPandas(_cell_best, f"vec_id {id_type}, best_cos double")
    )
    rm_cols = [
        F.coalesce(
            F.sum(F.when(F.col("v.best_cos") >= F.lit(eps), 1)), F.lit(0)
        )
        .cast("bigint")
        .alias(f"rm_ge_{int(round(eps * 100)):02d}")
        for eps in _SEM_EPS
    ]
    return (
        cell.alias("cell")
        .join(
            verdict.alias("v"),
            F.col("cell.vec_id") == F.col("v.vec_id"),
            "left",
        )
        .groupBy(F.col("cell.c_id").alias("cell_id"))
        .agg(
            F.count("*").cast("bigint").alias("n_members"),
            F.round(F.max(F.coalesce(F.col("v.best_cos"), F.lit(-1.0))), 6)
            .cast("double")
            .alias("max_cos"),
            *rm_cols,
        )
        .orderBy("cell_id")
    )


# ---------------------------------------------------------------------------
# exact shared-substring runs (token-level, Lee et al. 2022 shape)
# ---------------------------------------------------------------------------

_RUN_W = 5  # token n-gram width
_RUN_TOP = 100


def _runs_sql(dialect: str) -> str:
    """Shared shape: positional token 5-grams, equi-join on gram text,
    diagonal (p1-p2) gaps-and-islands to recover maximal runs."""
    if dialect == "spark":
        words = spark_words("text")
        n_pos = f"CASE WHEN size(w) >= {_RUN_W} THEN sequence(1, size(w) - {_RUN_W - 1}) ELSE array() END"
        gram = " , ' ', ".join(f"element_at(w, i + {k})" for k in range(_RUN_W))
        gen = f"SELECT doc_id, i AS pos, concat({gram}) AS g FROM w LATERAL VIEW explode({n_pos}) t AS i"
    else:
        words = duck_words("text")
        gram = " || ' ' || ".join(f"w[i + {k}]" for k in range(_RUN_W))
        gen = (
            f"SELECT doc_id, i AS pos, {gram} AS g FROM w, "
            f"LATERAL unnest(range(1, greatest(len(w) - {_RUN_W - 1}, 0) + 1)) t(i)"
        )
    return f"""
WITH w AS (SELECT doc_id, {words} AS w FROM documents),
grams AS ({gen}),
hits AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, a.pos AS p1, b.pos AS p2
  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id),
isl AS (
  SELECT d1, d2, p1 - p2 AS diag, p1,
         p1 - row_number() OVER (PARTITION BY d1, d2, p1 - p2
                                 ORDER BY p1) AS island
  FROM hits),
runs AS (
  SELECT d1, d2, CAST(count(*) AS BIGINT) AS run_len
  FROM isl GROUP BY d1, d2, diag, island)
SELECT d1, d2,
       CAST(max(run_len) + {_RUN_W - 1} AS BIGINT) AS longest_shared_tokens,
       CAST(count(*) AS BIGINT) AS n_runs,
       CAST(sum(run_len) AS BIGINT) AS n_shared_grams
FROM runs GROUP BY d1, d2
ORDER BY longest_shared_tokens DESC, d1, d2
LIMIT {_RUN_TOP}
"""


@query("dedup_exact_substring_runs", oracle=_runs_sql("duck"))
def dedup_exact_substring_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT shared-passage detection (the Lee et al. 2022
    'Deduplicating Training Data' shape, token-level): every positional
    token 5-gram joins across documents, and consecutive matches on
    the same alignment diagonal (p1 - p2) are folded into maximal runs
    with the gaps-and-islands idiom — a shared run of R grams proves a
    verbatim shared span of R+4 tokens, reported per pair with run
    counts. Where dedup_winnowing SAMPLES fingerprints (probabilistic
    density, threshold guarantee), this is the exact positional
    ground truth — the pair you use to audit the sampler's recall and
    to cut actual byte ranges out of training documents.

    Determinism: gram text equality, integer positions/diagonals/
    counts — zero float columns; total ORDER BY.

    Scale: gram generation is map-only (explode bounded by tokens per
    doc); the join is blocked by gram TEXT — hot grams are exactly the
    boilerplate the DF cutoff family prices (winnowing's _WIN_MAX_DF;
    here the measured max bucket is 6 on the synthetic corpus, so no
    cutoff is wired, and one belongs at the same place if a real
    corpus needs it). Islands shuffle on (d1, d2, diag) — fine-
    grained, collision-free keys. At 100 TB the gram relation is the
    suffix-index artifact the pipeline persists and probes
    incrementally, the dedup_lsh_incremental shape.
    """
    # r12: small-input spread (guide §2.5) — interleaved steady A/B -0.36/-0.34 s
    register_tables(spark, sf_dir, ("documents",), spread=("documents",))
    return spark.sql(_runs_sql("spark"))


# ---------------------------------------------------------------------------
# LSH retrieval quality: precision/recall vs exact-Jaccard ground truth
# ---------------------------------------------------------------------------

_EVAL_TAU = 0.5  # ground-truth resemblance threshold


def _lsh_eval_sql(dialect: str, sh_from: str | None = None) -> str:
    """Shared shape: the CANONICAL candidate chain (_mh_candidate_ctes
    — same text dedup_minhash_lsh executes) plus the exact-Jaccard
    truth pipeline off the same distinct-shingle relation; the readout
    FULL-JOINs candidates against truth so each side executes exactly
    once (three scalar-subquery counts would re-run the banding chain
    and the truth join twice each — Spark inlines CTE references).
    Ratios guard n=0 with nullif so an empty truth/candidate set reads
    as NULL on both engines, not NaN."""
    return f"""
WITH {_mh_candidate_ctes(dialect, sh_from=sh_from)},
sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, CAST(count(*) AS BIGINT) AS i
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id),
truth AS (
  SELECT inter.d1, inter.d2
  FROM inter JOIN sz sa ON sa.doc_id = inter.d1
             JOIN sz sb ON sb.doc_id = inter.d2
  WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= {_EVAL_TAU}),
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


@query("dedup_lsh_eval_pr", oracle=_lsh_eval_sql("duck"))
def dedup_lsh_eval_pr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality closure for the dedup family: the MinHash+LSH
    candidate set (dedup_minhash_lsh's exact pipeline, un-truncated)
    scored against exact-Jaccard ground truth at tau=0.5 — precision
    (how much verification work the bands waste) and recall (what the
    sampler misses; the 4-band/4-row S-curve gives P(candidate) =
    1-(1-j^4)^4 — ~0.23 at j=0.5, ~0.5 at j~0.61, ~0.95 at j~0.8 —
    so measured recall 1.0 here means the corpus's true pairs sit
    well above the tau=0.5 waterline, not that banding is free).
    These two
    numbers are what you tune K/R against before spending a 100 TB
    verification pass; dedup_minhash_calibration audits the ESTIMATOR,
    this audits the RETRIEVAL.

    Determinism: the truth side is integer set arithmetic with one
    exact-input division compared to tau; candidate membership is the
    integer banding pipeline; counts are integers, the two ratios
    round at 6 dp.

    Scale: both branches hang off ONE distinct-shingle relation; the
    truth join is blocked by shingle (sum of bucket^2, the
    ngram-jaccard shape with its documented DF-cutoff escape), and at
    100 TB you run this on a SAMPLE of blocks — the plan is identical,
    only the input relation shrinks — because ground truth is the
    expensive thing the production path exists to avoid.
    """
    from sparksql_server_spark.operators.scratch import pin_view

    register_tables(spark, sf_dir, ("documents",))
    # the distinct-shingle relation feeds FOUR branches (hash chain,
    # sizes, both truth-join sides); as inlined CTE text Spark would
    # re-run the explode+DISTINCT per branch, and a .cache() would be
    # bypassed inside the WITH (CacheManager does not rewrite under
    # WithCTE) — so materialize it ONCE, built from the SAME canonical
    # w/sh text the production pipeline uses. Barrier choice
    # (VERDICT r7 ask #2, A/B-measured at sf0.1, 3 runs each): an
    # eager localCheckpoint (scratch.pin) beats the r7 parquet spill
    # in BOTH regimes — first-exec-in-warm-session 3.3-3.4 s vs
    # 3.9-4.3 s (the parquet write+read tax lands in first-exec, which
    # is what BENCH measures) and min-of-3 steady state 1.65-1.86 s vs
    # 1.98-2.35 s — and also beats no-barrier (first 3.4-3.6 s,
    # steady 2.0-2.1 s re-running explode+DISTINCT per branch).
    # Block hygiene: the pinned blocks back the lsh_eval_sh_mat view —
    # not an anonymous cache. pin_view unpersists the PREVIOUS run's
    # pin the moment the view is replaced, so a session holds at most
    # one live copy of this bounded intermediate (the distinct-shingle
    # relation, MBs at sf0.1 — never the input); gated in
    # tests/test_cache_hygiene.py.
    w_body, ex = _sh_canonical_sql("spark")
    pin_view(spark, spark.sql(f"WITH w AS ({w_body}) {ex}"), "lsh_eval_sh_mat")
    # cand's band self-join needs no barrier of its own: both sides
    # are the identical bs subtree (ReuseExchange dedupes it), and a
    # measured bands spill came out slower than letting reuse fire
    return spark.sql(_lsh_eval_sql("spark", sh_from="lsh_eval_sh_mat"))
