"""The local correctness gate: every registered query vs its DuckDB
oracle at sf0.001 (the driver repeats this at sf0.01)."""

from __future__ import annotations

import pytest

from sparksql_server_spark.operators import ORACLES, QUERIES
from tests.conftest import SF_DIR
from tests.oracle_compare import compare


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, duck):
    fn = QUERIES[name]
    sdf = fn(spark, SF_DIR)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = list(sdf.columns)
    assert len(spark_rows) >= 0  # smoke: query executes

    if name not in ORACLES:
        pytest.skip(f"{name}: no oracle (rows-only check)")

    rel = duck.sql(ORACLES[name])
    duck_cols = [d[0] for d in rel.description]
    duck_rows = rel.fetchall()

    problems = compare(spark_cols, spark_rows, duck_cols, duck_rows)
    assert not problems, f"{name}:\n" + "\n".join(problems)


def test_all_queries_have_oracles():
    """Every query should be oracle-checked unless explicitly exempt."""
    exempt = set()  # add names here only with a documented reason
    missing = set(QUERIES) - set(ORACLES) - exempt
    assert not missing, f"queries without oracle: {sorted(missing)}"


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_output_is_atomic(spark, name):
    """No query may emit array/map/struct output columns: the harness
    canonicalizer sorts result columns with pandas, and list/dict cells
    are unhashable (round-1 `err` rows on hof_array_lambdas and
    array_set_ops). Serialize complex values with array_join/to_json in
    BOTH dialects before returning them."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    schema = QUERIES[name](spark, SF_DIR).schema
    complex_cols = [
        f"{f.name}: {f.dataType.simpleString()}"
        for f in schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not complex_cols, (
        f"{name} emits complex-typed columns {complex_cols} — the driver "
        "canonicalizer cannot sort them; serialize to string/json first"
    )


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_is_not_vacuous(spark, name):
    """Every query must return rows at some test scale — an oracle
    match on empty-vs-empty proves nothing. Cheap check at sf0.001;
    queries legitimately empty at that scale re-check at sf0.01 (the
    driver's correctness scale)."""
    if QUERIES[name](spark, SF_DIR).count() > 0:
        return
    assert QUERIES[name](spark, "/root/testdata/sf0.01").count() > 0, (
        f"{name} returns 0 rows at sf0.01 — its oracle comparison is vacuous"
    )


def test_percentiles_exact_surfaces_all_null_group(spark, tmp_path):
    """Round 12 (ADVICE r11 low): a group whose every value is NULL
    must surface with NULL quartiles — exactly what percentile() and
    DuckDB's quantile_cont emit — instead of being dropped by the
    distribution CTE's NOT NULL filter. (Latent on TPC-H: o_custkey is
    never NULL; this synthetic table exercises the branch.)"""
    import duckdb

    from sparksql_server_spark.operators.relational_ext import (
        percentiles_exact,
    )

    rows = [
        ("1-URGENT", 10),
        ("1-URGENT", 20),
        ("1-URGENT", None),
        ("2-HIGH", None),  # all-NULL group: must surface, NULL quartiles
        ("2-HIGH", None),
        ("3-MEDIUM", 7),
        (None, 4),  # NULL group KEY with real values: needs <=> joins
        (None, 8),
    ]
    df = spark.createDataFrame(rows, "o_orderpriority string, o_custkey int")
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "orders.parquet")
    )
    got = {
        r["o_orderpriority"]: (r["p25"], r["p50"], r["p75"])
        for r in percentiles_exact(spark, str(tmp_path)).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW orders AS SELECT * FROM "
        f"'{tmp_path}/orders.parquet/*.parquet'"
    )
    want = {
        r[0]: (r[1], r[2], r[3])
        for r in con.sql(
            "SELECT o_orderpriority,"
            " quantile_cont(o_custkey, 0.25) AS p25,"
            " quantile_cont(o_custkey, 0.50) AS p50,"
            " quantile_cont(o_custkey, 0.75) AS p75"
            " FROM orders GROUP BY o_orderpriority"
        ).fetchall()
    }
    con.close()
    assert set(got) == {"1-URGENT", "2-HIGH", "3-MEDIUM", None}
    assert got == want, (got, want)
    assert got["2-HIGH"] == (None, None, None)
    # the NULL KEY is one ordinary group (GROUP BY semantics): real
    # quartiles, not NULLs — the round-12 review-wave <=> fix
    assert got[None] == (5.0, 6.0, 7.0)
