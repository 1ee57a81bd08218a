"""Engine-portable deterministic expressions (Spark SQL + DuckDB SQL).

The LLM-pipeline operators (MinHash, SimHash, fingerprinting) need a
hash that BOTH engines compute identically so the DuckDB oracle can
verify the Spark result value-for-value. Engine-native hashes
(Spark murmur3 ``hash()``, DuckDB ``hash()``) differ, so we define a
character-level polynomial rolling hash in pure integer SQL:

    h(s) = fold over chars c of s:  acc <- (acc * 31 + ascii(c)) mod P

with P = 1e9+7 (keeps ``acc*31+c`` far below 2**63 — no overflow in
either engine). Both engines evaluate it via higher-order array
functions, JVM/vectorized-native — no Python UDF in the path.

Dialect notes (empirically verified):
- Spark ``aggregate(xs, 0L, f)`` ≡ DuckDB ``list_reduce(list_prepend(0, xs), f)``
  (DuckDB's list_reduce has no init arg — it folds from the first element).
- Spark ``element_at(a, i)`` ≡ DuckDB ``a[i]`` (both 1-based).
- Spark ``sequence(1, n)`` ≡ DuckDB ``range(1, n+1)`` (range is end-exclusive).

Helpers take *expression strings* (usually a column name already bound
by a subquery) and return dialect expression strings; queries inline
them into full SQL on both sides so the two pipelines stay visibly
parallel.
"""

from __future__ import annotations

MOD_P = 1_000_000_007


def dsum(x: str, scale: int = 6) -> str:
    """Exact decimal sum of a double column, emitted as DOUBLE.

    Engine ``round()`` on doubles diverges at decimal-5 boundaries
    (Spark: shortest-repr HALF_UP via BigDecimal; DuckDB: true-value
    decimal rounding) and double summation order varies, so float sums
    can never hash-match reliably. Instead: cast each value to
    DECIMAL (exact for this data — all money columns carry ≤2
    decimals; verified both engines cast double→decimal identically),
    sum exactly, convert the exact result to DOUBLE. Identical SQL in
    both dialects.
    """
    return f"CAST(sum(CAST({x} AS DECIMAL(18,{scale}))) AS DOUBLE)"


def davg(x: str, scale: int = 6) -> str:
    """Exact-sum-based average: deterministic double division of the
    exact decimal sum by the non-null count. Identical in both dialects."""
    return f"({dsum(x, scale)} / count({x}))"


def spark_char_hash(expr: str, base: int = 31) -> str:
    """Rolling char hash of a string expression — Spark SQL dialect.

    Splits into a char array first: per-index ``substring(s, i, 1)``
    re-scans the string each call (O(n²) per value — measured 2×
    slower on document-length strings), while ``split(s, '')`` walks
    it once. Empty string folds to 0 either way (split('','')=['']
    and ascii('')=0).

    ``base`` selects the polynomial base; callers needing a SECOND
    independent hash lane (60-bit SimHash) pass a different base
    (131) — the two polynomials over the same mod-P field are
    uncorrelated for distinct strings.
    """
    return (
        f"aggregate(transform(split({expr}, ''), "
        f"c -> bigint(ascii(c))), 0L, "
        f"(acc, c) -> (acc * {base} + c) % {MOD_P})"
    )


def duck_char_hash(expr: str, base: int = 31) -> str:
    """Rolling char hash of a string expression — DuckDB dialect."""
    return (
        f"list_reduce(list_prepend(0::BIGINT, "
        f"list_transform(range(1, length({expr}) + 1), "
        f"i -> ascii(substr({expr}, i, 1))::BIGINT)), "
        f"(acc, c) -> (acc * {base} + c) % {MOD_P})"
    )


def spark_words(expr: str) -> str:
    """Whitespace tokens with empties removed — Spark SQL dialect."""
    return f"filter(split({expr}, ' '), t -> t <> '')"


def duck_words(expr: str) -> str:
    return f"list_filter(string_split({expr}, ' '), t -> t <> '')"


def spark_shingles(w: str, n: int = 3) -> str:
    """Word n-gram shingles (space-joined) from a bound word-array column
    ``w`` — Spark SQL dialect. Empty array when len(w) < n."""
    parts = ", ' ', ".join(f"element_at({w}, i + {k})" for k in range(n))
    # NB: Spark's sequence(1, 0) yields a DESCENDING [1, 0], so short
    # arrays need an explicit empty-array branch (DuckDB's end-exclusive
    # range(1, 1) is already empty).
    return (
        f"CASE WHEN size({w}) >= {n} THEN "
        f"transform(sequence(1, size({w}) - {n - 1}), i -> concat({parts})) "
        f"ELSE array() END"
    )


def duck_shingles(w: str, n: int = 3) -> str:
    parts = " || ' ' || ".join(f"{w}[i + {k}]" for k in range(n))
    return (
        f"list_transform(range(1, greatest(len({w}) - {n - 1}, 0) + 1), "
        f"i -> {parts})"
    )


def prime_mix(k: str) -> str:
    """Prime-folded multiplicative mix of an integer key — identical
    text in both dialects. The double-mod folds NEGATIVE keys to a
    nonnegative residue first (both engines give ``%`` the dividend's
    sign, so a single mod on a negative key yields a negative mix —
    rows then land in no jackknife block / A/B arm; ADVICE r5 #3).
    The residue is < 2^31, so the product is at most
    (2^31-1)*2654435761 ≈ 5.7e18 < 2^63-1 (ANSI BIGINT safe for any
    key), and the prime fold spreads every key bit before any
    small-modulus residue is taken: raw 2^31 residues mod a power of
    two keep only the key's unmixed low bits (stride-2^k key spaces
    then collapse onto a fraction of the buckets — the jackknife/HLL
    review finding). Used for jackknife blocks, A/B arm assignment,
    and any future bucket-by-hash."""
    return (
        f"((((({k}) % 2147483648) + 2147483648) % 2147483648)"
        f" * 2654435761) % 1000000007"
    )
