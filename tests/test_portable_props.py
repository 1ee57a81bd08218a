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
