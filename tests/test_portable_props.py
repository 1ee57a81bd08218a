"""Property-based cross-engine equality for the portable primitives.

Every oracle comparison in the corpus rests on a handful of
expressions computing bit-identical values in Spark SQL and DuckDB
(functions/portable.py, functions/vector.py). These hypothesis tests
pin that equality over adversarial inputs — empty strings, runs of
spaces, boundary decimals — not just the driver's synthetic data.

Each example evaluates the WHOLE generated batch in one Spark job and
one DuckDB query (hypothesis example count is kept small: Spark
round-trips dominate).
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sparksql_server_spark.functions.portable import (
    duck_char_hash,
    duck_shingles,
    duck_words,
    spark_char_hash,
    spark_shingles,
    spark_words,
)

# printable ASCII including space; excludes quotes-only corner problems
# by going through parameter binding, not SQL literals
_ascii_text = st.text(
    alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x7E), max_size=60
)

_SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _spark_vals(spark, strings: list[str], expr: str) -> list:
    df = spark.createDataFrame([(s,) for s in strings], "s string")
    df.createOrReplaceTempView("prop_t")
    out = spark.sql(f"SELECT {expr} AS v FROM prop_t").collect()
    spark.catalog.dropTempView("prop_t")
    return [r.v for r in out]


def _duck_vals(strings: list[str], expr: str) -> list:
    con = duckdb.connect()
    con.execute("CREATE TABLE prop_t (s VARCHAR)")
    con.executemany("INSERT INTO prop_t VALUES (?)", [(s,) for s in strings])
    return [r[0] for r in con.execute(f"SELECT {expr} AS v FROM prop_t").fetchall()]


@given(st.lists(_ascii_text, min_size=1, max_size=12))
@_SETTINGS
def test_char_hash_cross_engine(spark, strings):
    assert _spark_vals(spark, strings, spark_char_hash("s")) == _duck_vals(
        strings, duck_char_hash("s")
    )


@given(st.lists(_ascii_text, min_size=1, max_size=12))
@_SETTINGS
def test_tokenizer_cross_engine(spark, strings):
    got = _spark_vals(spark, strings, spark_words("s"))
    want = _duck_vals(strings, duck_words("s"))
    assert [list(g) for g in got] == [list(w) for w in want]


@given(st.lists(_ascii_text, min_size=1, max_size=8))
@_SETTINGS
def test_shingles_cross_engine(spark, strings):
    s_expr = spark_shingles(spark_words("s"), 3)
    d_expr = duck_shingles(duck_words("s"), 3)
    got = _spark_vals(spark, strings, s_expr)
    want = _duck_vals(strings, d_expr)
    assert [list(g) for g in got] == [list(w) for w in want]


@given(
    st.lists(
        st.decimals(
            min_value=-99_999, max_value=99_999, places=2, allow_nan=False
        ),
        min_size=1,
        max_size=50,
    )
)
@_SETTINGS
def test_decimal_sum_cross_engine(spark, decs):
    """dsum: double inputs carrying ≤2 decimals must sum to the exact
    same double in both engines regardless of order/partitioning."""
    vals = [float(d) for d in decs]
    df = spark.createDataFrame([(v,) for v in vals], "x double").repartition(4)
    df.createOrReplaceTempView("prop_d")
    got = spark.sql(
        "SELECT CAST(sum(CAST(x AS DECIMAL(18,6))) AS DOUBLE) AS v FROM prop_d"
    ).collect()[0].v
    spark.catalog.dropTempView("prop_d")
    con = duckdb.connect()
    con.execute("CREATE TABLE prop_d (x DOUBLE)")
    con.executemany("INSERT INTO prop_d VALUES (?)", [(v,) for v in vals])
    want = con.execute(
        "SELECT CAST(sum(CAST(x AS DECIMAL(18,6))) AS DOUBLE) FROM prop_d"
    ).fetchone()[0]
    assert got == pytest.approx(want, abs=0) or got == want


def test_event_ts_normalization_is_timezone_independent(spark):
    """catalog._normalize_event_ts must produce the same epoch micros
    whatever the session timezone (ADVICE r3: a bare NTZ->timestamp
    cast shifts instants inside DST gaps on non-UTC hosts). Probe with
    an in-gap instant (2025-03-09 02:30 America/New_York does not
    exist on local clocks) plus an in-overlap one."""
    from pyspark.sql import functions as F

    from sparksql_server_spark.catalog import _normalize_event_ts

    probes = [
        ("2025-03-09 02:30:00.123456", 1741487400123456),  # NY DST gap
        ("2025-11-02 01:30:00.000001", 1762047000000001),  # NY DST overlap
        ("2024-06-15 12:00:00", 1718452800000000),  # plain summer noon
    ]
    src = spark.createDataFrame(
        [(s,) for s, _ in probes], "ts_s string"
    ).select(F.col("ts_s").cast("timestamp_ntz").alias("ts"))
    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    results = {}
    try:
        for tz in ("UTC", "America/New_York", "Asia/Kathmandu"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            got = (
                _normalize_event_ts(src)
                .select(F.unix_micros("ts").alias("us"))
                .collect()
            )
            results[tz] = sorted(r["us"] for r in got)
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)
    expected = sorted(e for _, e in probes)
    for tz, got in results.items():
        assert got == expected, f"{tz}: {got} != {expected}"


# -- round-5b portable arithmetic: Morton interleave, chunk coverage, --
# -- HLL finalizer avalanche ------------------------------------------


def _morton_py(x: int, y: int, bits: int = 8) -> int:
    z = 0
    for k in range(bits):
        z |= ((x >> k) & 1) << (2 * k)
        z |= ((y >> k) & 1) << (2 * k + 1)
    return z


@given(
    pairs=st.lists(
        st.tuples(st.integers(0, 255), st.integers(0, 255)),
        min_size=1,
        max_size=40,
        unique=True,
    )
)
@_SETTINGS
def test_zorder_interleave_matches_reference_and_is_injective(pairs):
    """The SQL floor-div/mod Morton formula equals the bit-twiddling
    reference and never collides on distinct (x, y) — the property
    pipeline_zorder_audit's file ranges rest on. Evaluated in DuckDB
    (the oracle engine); the Spark text is character-identical."""
    from sparksql_server_spark.operators.sampling import zorder_terms

    terms = zorder_terms()
    con = duckdb.connect()
    vals = ", ".join(f"({x}, {y})" for x, y in pairs)
    rows = con.execute(
        f"SELECT x, y, {terms} AS z FROM (VALUES {vals}) t(x, y)"
    ).fetchall()
    zs = [z for _, _, z in rows]
    assert zs == [_morton_py(x, y) for x, y, _ in rows]
    assert len(set(zs)) == len(pairs)  # injective


@given(nw=st.integers(0, 300))
@_SETTINGS
def test_chunk_grid_covers_every_word(nw):
    """pipeline_chunk_overlap's chunk-count/start arithmetic leaves no
    word uncovered and no empty chunks, for any document length."""
    from sparksql_server_spark.operators.curation import _CHUNK_S, _CHUNK_W

    import math

    n_chunks = 1 if nw <= _CHUNK_W else math.ceil((nw - _CHUNK_W) / _CHUNK_S) + 1
    covered = set()
    for k in range(1, n_chunks + 1):
        start = _CHUNK_S * (k - 1) + 1
        end = min(start + _CHUNK_W - 1, nw)
        if nw > 0:
            assert start <= nw, f"chunk {k} starts past the document"
        covered.update(range(start, end + 1))
    assert covered == set(range(1, nw + 1))


def test_hll_finalizer_survives_structured_id_spaces():
    """The review-found failure mode, pinned: a single multiplicative
    hash put every stride-64 id in one bucket (estimate 1.0 for 1000
    ids). The murmur-style finalizer must keep the estimate within
    HLL's m=64 error envelope on adversarially structured id spaces.
    Runs the OPERATOR'S OWN SQL (DuckDB dialect) on synthetic ids."""
    from sparksql_server_spark.operators.aggregates import _hll_sql

    con = duckdb.connect()
    for name, ids in (
        ("stride2", range(0, 2000, 2)),
        ("stride64", range(0, 64000, 64)),
        ("dense", range(1000)),
    ):
        vals = ", ".join(f"(1, {u})" for u in ids)
        con.execute(
            "CREATE OR REPLACE VIEW events AS "
            f"SELECT 'a' AS event_type, user_id FROM (VALUES {vals}) t(k, user_id)"
        )
        est = con.execute(_hll_sql("duck")).fetchall()[0][2]
        true_n = len(list(ids))
        assert 0.5 * true_n <= est <= 2.0 * true_n, (
            f"{name}: estimate {est} vs true {true_n} — avalanche regressed"
        )


@given(stride_pow=st.integers(1, 12), mod=st.sampled_from([2, 16, 32, 64]))
@_SETTINGS
def test_prime_mix_spreads_structured_key_spaces(stride_pow, mod):
    """functions.portable.prime_mix must populate (nearly) every
    residue class even when keys share all their low bits — the
    jackknife/HLL review failure mode, pinned for every consumer of
    the helper. Evaluated in DuckDB; the expression text is
    dialect-identical."""
    from sparksql_server_spark.functions.portable import prime_mix

    stride = 1 << stride_pow
    con = duckdb.connect()
    n = con.execute(
        f"SELECT count(DISTINCT ({prime_mix('k')}) % {mod}) "
        f"FROM (SELECT unnest(range(0, 512)) * {stride} AS k)"
    ).fetchone()[0]
    assert n >= mod * 0.9, (
        f"stride-{stride} keys populated {n}/{mod} residues — mix regressed"
    )


@given(lo=st.integers(-(2**62), -1))
@_SETTINGS
def test_prime_mix_is_nonnegative_for_negative_keys(lo):
    """Negative keys must fold to a nonnegative residue BEFORE the
    prime multiply — a single-mod mix is negative for them in both
    engines, so rows land in no jackknife block / A/B arm (ADVICE r5
    #3). Pins arm ∈ {0,1} and block ∈ [0, B) for any BIGINT key."""
    from sparksql_server_spark.functions.portable import prime_mix

    con = duckdb.connect()
    mix, arm = con.execute(
        f"SELECT ({prime_mix('k')}), ({prime_mix('k')}) % 2 "
        f"FROM (SELECT {lo}::BIGINT AS k)"
    ).fetchone()
    assert 0 <= mix < 1000000007
    assert arm in (0, 1)


def test_quantile_sketch_degenerate_distribution(spark):
    """A constant-valued events.value column gives hi == lo: without
    the nullif guard the bin width is 0 and the sketch degenerates to
    NaN/NULL bins (ADVICE r5 #4). Both engines must return the clean
    answer: every quantile estimate equals the constant, error 0."""
    from sparksql_server_spark.catalog import register_tables
    from sparksql_server_spark.operators.stats import _qsketch_sql
    from tests.conftest import SF_DIR

    try:
        spark.range(100).selectExpr("CAST(42.5 AS DOUBLE) AS value") \
            .createOrReplaceTempView("events")
        rows = spark.sql(_qsketch_sql("spark")).collect()
        assert len(rows) == 3
        for r in rows:
            assert r.exact_value == 42.5
            assert r.sketch_estimate == 42.5
            assert r.abs_error == 0.0
    finally:
        register_tables(spark, SF_DIR, ("events",))

    con = duckdb.connect()
    con.execute("CREATE VIEW events AS SELECT 42.5 AS value FROM range(100)")
    for q, exact_v, sketch_v, err in con.execute(_qsketch_sql("duck")).fetchall():
        assert exact_v == 42.5 and sketch_v == 42.5 and err == 0.0


def test_hll_wide_ids_beyond_2_31(spark):
    """Round-6 widening: ids past the old 2^31 fold (snowflake-style
    64-bit ids, plus a 2^31-stride space whose LOW half is constant)
    must still estimate within HLL's m=64 error envelope, and the
    Spark and DuckDB sketches must agree exactly (the oracle
    property) — both engines run the identical widened 62-bit hash."""
    from sparksql_server_spark.operators.aggregates import _hll_sql

    id_spaces = {
        # snowflake-ish: timestamp<<22 | worker<<12 | seq
        "snowflake": [(1700000000000 + i) << 22 | (i % 32) << 12 | (i % 4096)
                      for i in range(1500)],
        # hi-half-only entropy: lo 31 bits constant — the case a naive
        # lo-based bucket/rank collapses on
        "hi_stride": [(i << 31) | 12345 for i in range(1, 1501)],
        "beyond31_dense": [2**31 + i for i in range(1500)],
    }
    con = duckdb.connect()
    for name, ids in id_spaces.items():
        true_n = len(set(ids))
        vals = ", ".join(f"({u})" for u in ids)
        con.execute(
            "CREATE OR REPLACE VIEW events AS "
            f"SELECT 'a' AS event_type, user_id FROM (VALUES {vals}) t(user_id)"
        )
        duck_rows = con.execute(_hll_sql("duck")).fetchall()
        est = duck_rows[0][2]
        assert 0.5 * true_n <= est <= 2.0 * true_n, (
            f"{name}: duck estimate {est} vs true {true_n}"
        )
        spark.createDataFrame(
            [("a", u) for u in ids], "event_type string, user_id long"
        ).createOrReplaceTempView("events")
        try:
            spark_rows = [tuple(r) for r in spark.sql(_hll_sql("spark")).collect()]
            assert spark_rows == [tuple(r) for r in duck_rows], name
        finally:
            from sparksql_server_spark.catalog import register_tables
            from tests.conftest import SF_DIR

            register_tables(spark, SF_DIR, ("events",))
