"""events_arrival_profile internals: the banded window rewrite and the
round-12 one-pass tail must agree with the oracle-shape single-window
two-consumer statement on the same engine, band heads included."""

from __future__ import annotations

from sparksql_server_spark.catalog import register_tables
from sparksql_server_spark.operators.events_behavior import (
    _SPARK_SEC,
    _arrival_spark_banded_sql,
    _arrival_spark_onepass_sql,
    _arrival_sql,
)
from tests.conftest import SF_DIR


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_onepass_tail_equals_oracle_shape(spark):
    """The r12 one-pass grouped tail (cells/agg/typ) computes exactly
    the oracle tail's rows, -2 no-gaps rows included."""
    register_tables(spark, SF_DIR, ("events",))
    ref = spark.sql(_arrival_sql(_SPARK_SEC))
    got = spark.sql(_arrival_spark_onepass_sql(_SPARK_SEC))
    assert got.columns == ref.columns
    assert _rows(got) == _rows(ref)


def test_banded_form_equals_oracle_shape(spark):
    """The banded form with a TINY band (64 events/band, so band-head
    prefix patching fires hundreds of times) equals the single-window
    statement — the gate events_arrival_profile flips at scale."""
    register_tables(spark, SF_DIR, ("events",))
    ref = spark.sql(_arrival_sql(_SPARK_SEC))
    got = spark.sql(_arrival_spark_banded_sql(_SPARK_SEC, 64))
    assert got.columns == ref.columns
    assert _rows(got) == _rows(ref)
