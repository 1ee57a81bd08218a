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
