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

# operators whose persisted intermediates are fully scoped to one call
# (CacheScope-released before returning); the pin_view operators that
# deliberately keep one live relation across calls are gated separately
# below
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


# operators that deliberately keep ONE pinned relation alive across
# calls (the production-artifact pattern: the view IS the output a
# pipeline would reuse) — bounded via scratch.pin_view, which
# unpersists the predecessor the moment the view is replaced
PIN_VIEW_QUERIES = [
    ("dedup_lsh_eval_pr", "lsh_eval_sh_mat"),
    ("text_tfidf_topterms", "tfidf_tf_mat"),
    # r13: the shared kept-shingle relation moved from a parquet spill
    # to a pin (measured faster in both regimes; see
    # _shingle_kept_materialized) — same one-live-copy bound
    ("dedup_ngram_jaccard", "jacc_kept_mat"),
    ("dedup_shingle_containment", "cont_kept_mat"),
]


@pytest.mark.parametrize("name,view", PIN_VIEW_QUERIES)
def test_pin_view_holds_at_most_one_copy_across_runs(spark, name, view):
    """Re-running a pin_view operator must not accumulate blocks: the
    second run's view replacement releases the first run's pin
    DETERMINISTICALLY (no ContextCleaner/GC timing involved)."""
    before = persistent_rdd_ids(spark)
    assert QUERIES[name](spark, SF_DIR).collect()
    after_first = persistent_rdd_ids(spark) - before
    assert len(after_first) == 1, f"{name}: expected exactly one pin, got {after_first}"
    assert QUERIES[name](spark, SF_DIR).collect()
    after_second = persistent_rdd_ids(spark) - before
    assert len(after_second) == 1, (
        f"{name}: second run must replace, not accumulate ({after_second})"
    )
    assert after_second != after_first  # it is the NEW pin that survives
    spark.catalog.dropTempView(view)
