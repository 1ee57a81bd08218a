"""Block-manager hygiene gate (VERDICT r3, "What's wrong" #1).

Operators that cache / localCheckpoint intermediates must release every
scoped block before returning: in the multi-tenant server the
CacheManager (`server/cache.py`) budgets block-manager storage, and an
anonymous operator cache surviving its query would compete with that
budget invisibly. The gate: collect the result, then assert that NO
persistent RDD created by the operator remains registered.
"""

from __future__ import annotations

import pytest

from sparksql_server_spark.operators import QUERIES
from sparksql_server_spark.operators.scratch import (
    CacheScope,
    persistent_rdd_ids,
)

from conftest import SF_DIR

# every operator that persists intermediates (cache or localCheckpoint)
CACHING_QUERIES = [
    "graph_pagerank_entities",
    "dedup_clusters",
    "dedup_prefix_filter_join",
]


@pytest.mark.parametrize("name", CACHING_QUERIES)
def test_no_persistent_rdds_survive_query(spark, name):
    before = persistent_rdd_ids(spark)
    df = QUERIES[name](spark, SF_DIR)
    rows = df.collect()
    assert rows  # non-degenerate: the operator actually produced output
    leaked = persistent_rdd_ids(spark) - before
    assert leaked == set(), f"{name} leaked persistent RDDs: {leaked}"


def test_cache_scope_releases_only_its_own(spark):
    """A scope must not touch caches created before it opened (the
    server's CacheManager entries)."""
    outside = spark.range(100).cache()
    outside.count()
    try:
        scope = CacheScope(spark)
        inside = spark.range(50).cache()
        inside.count()
        result = scope.finish(inside.selectExpr("id", "id * 2 AS twice"), "scope_test")
        assert result.count() == 50
        ids_now = persistent_rdd_ids(spark)
        assert scope.new_ids() == set()  # everything scoped was released
        # the pre-existing cache is untouched
        assert outside.storageLevel.useMemory
        assert ids_now  # outside's RDD still registered
    finally:
        outside.unpersist()
