"""Physical-plan quality gates — the 100 TB posture, made testable.

Each assertion pins a plan property that matters at scale; a
regression here means a query silently became cluster-hostile even
though its results still match the oracle.
"""

from __future__ import annotations

import pytest

from sparksql_server_spark.operators import QUERIES
from tests.conftest import SF_DIR


def plan_of(spark, name: str) -> str:
    df = QUERIES[name](spark, SF_DIR)
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def test_filter_and_projection_pushed_to_scan(spark):
    plan = plan_of(spark, "a2_filter_project")
    assert "PushedFilters" in plan
    assert "c_acctbal" in plan.split("PushedFilters")[1].splitlines()[0]
    # projection pruning: the scan must not read all 5 customer columns
    read_schema = plan.split("ReadSchema")[1].splitlines()[0]
    assert "c_name" in read_schema and "c_mktsegment" not in read_schema


def test_dim_joins_broadcast(spark):
    plan = plan_of(spark, "join_inner_4way")
    assert plan.count("BroadcastHashJoin") >= 2  # nation and region never shuffle


def test_semi_anti_join_operators(spark):
    assert "LeftSemi" in plan_of(spark, "join_semi")
    assert "LeftAnti" in plan_of(spark, "join_anti")


def test_q1_two_phase_aggregation(spark):
    plan = plan_of(spark, "agg_q1_pricing_summary")
    assert plan.count("HashAggregate") >= 2  # partial (map-side) + final


def test_global_topk_avoids_full_sort(spark):
    assert "TakeOrderedAndProject" in plan_of(spark, "topk_global")


def test_per_group_topk_uses_group_limit(spark):
    # Spark 3.5+/4 pushes rn<=k into the sort as WindowGroupLimit
    assert "WindowGroupLimit" in plan_of(spark, "topk_per_group")


def test_bruteforce_knn_broadcasts_query_side(spark):
    # the 8-row probe set must broadcast; the corpus must not shuffle
    assert "BroadcastNestedLoopJoin" in plan_of(spark, "sim_topk_bruteforce")


def test_q6_all_predicates_pushed(spark):
    """TPC-H Q6: every predicate (dates, discount band, quantity) must
    reach the parquet reader — the query is a pure scan+reduce."""
    plan = plan_of(spark, "tpch_q6_forecast_revenue")
    pushed = plan.split("PushedFilters")[1].splitlines()[0]
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, f"{col} not pushed: {pushed}"


def test_q3_filters_above_no_scan_of_extra_columns(spark):
    """TPC-H Q3: the segment filter pushes into the customer scan, and
    the customer scan reads only the join key + filter column."""
    plan = plan_of(spark, "tpch_q3_shipping_priority")
    assert "c_mktsegment" in plan.split("PushedFilters")[1].splitlines()[0]
    assert "TakeOrderedAndProject" in plan  # top-10, not a full sort


def test_q14_q19_part_side_broadcasts(spark):
    """lineitem⋈part joins must broadcast the part side — the fact
    table never shuffles for these."""
    for name in ("tpch_q14_promo_effect", "tpch_q19_discounted_revenue"):
        assert "BroadcastHashJoin" in plan_of(spark, name), name


def test_bernoulli_sample_is_scan_local(spark):
    """Hash-Bernoulli sampling must stay a map-side filter: no shuffle
    (Exchange) before the filter, i.e. the plan's only exchange is the
    final order/collect."""
    plan = plan_of(spark, "sample_bernoulli_hash")
    # Scan -> Filter -> Project; sorting for output is the only exchange
    assert plan.count("Exchange") <= 2  # range-partition for orderBy only


def test_stratified_sample_uses_group_limit(spark):
    """rn <= 50 must push into the window sort as WindowGroupLimit so
    partitions retain 50 rows per stratum, not the whole stratum."""
    assert "WindowGroupLimit" in plan_of(spark, "sample_stratified_fixed")


def test_asof_join_single_key_shuffle(spark):
    """The union-window as-of join must shuffle on the key exactly
    once (plus the output sort) — no range join, no per-row probe."""
    plan = plan_of(spark, "asof_join_purchase_click")
    assert plan.count("hashpartitioning") == 1
    assert "Window" in plan


def test_band_join_is_equi_join(spark):
    """The time-bucket trick must produce a hash/sort-merge equi-join
    on the manufactured bucket key — never a nested-loop over the
    band inequality."""
    plan = plan_of(spark, "band_join_nearby_events")
    assert "BroadcastNestedLoopJoin" not in plan
    assert ("SortMergeJoin" in plan) or ("BroadcastHashJoin" in plan) or (
        "ShuffledHashJoin" in plan
    )


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_cartesian_product_anywhere(spark, name):
    """No query in the corpus may fall back to CartesianProduct — at
    100 TB that's a non-terminating plan. (Deliberate small cross joins
    plan as BroadcastNestedLoopJoin.)"""
    assert "CartesianProduct" not in plan_of(spark, name)


@pytest.mark.parametrize(
    "name",
    [
        "agg_q1_pricing_summary",
        "join_inner_4way",
        "a3_wordcount",
        "dedup_minhash_lsh",
        "text_fingerprint",
    ],
)
def test_hot_paths_are_codegen(spark, name):
    """The hot operators must run inside whole-stage codegen (no
    row-at-a-time Python in the plan). AQE only reveals codegen stages
    in the finalized plan, so execute first, then read the final plan's
    ``*(n)`` codegen-stage markers."""
    spark.conf.set("spark.sql.adaptive.enabled", "false")  # AQE hides codegen pre-run
    try:
        df = QUERIES[name](spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert "*(" in plan  # WholeStageCodegen stage markers
    assert "BatchEvalPython" not in plan  # no row-at-a-time Python UDFs


def test_q4_preaggregates_lineitem_below_the_join(spark):
    """VERDICT r7 ask #7: q4's lineitem side must reduce to one
    (l_orderkey, max_ship) row per order BEFORE the join — a partial
    max below the exchange (map-side combinable) — and read only the
    two columns it needs."""
    plan = plan_of(spark, "tpch_q4_order_priority")
    # the max(l_shipdate) pre-aggregation exists and is two-phase
    assert "partial_max" in plan or "partial max" in plan.lower(), plan
    # lineitem scan is pruned to the join key + shipdate
    li_schemas = [
        ln for ln in plan.splitlines()
        if "ReadSchema" in ln and "l_orderkey" in ln
    ]
    assert li_schemas, plan
    assert all("l_shipdate" in ln for ln in li_schemas)
    assert all(
        "l_quantity" not in ln and "l_extendedprice" not in ln
        for ln in li_schemas
    )
    # orders date filter reaches the scan
    assert "o_orderdate" in plan.split("PushedFilters")[1].splitlines()[0]


def test_tfidf_single_explode_and_window_group_limit(spark):
    """VERDICT r7 ask #7: the tf relation materializes once (ONE
    Generate explode in the whole plan — as CTE text Spark re-expanded
    it per consumer), and the per-doc top-3 runs under WindowGroupLimit
    (partial group-limit before the exchange), never a full per-doc
    sort of every scored term."""
    df = QUERIES["text_tfidf_topterms"](spark, SF_DIR)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "WindowGroupLimit" in plan, plan
    assert plan.count("Generate explode") <= 1, plan


def test_q2_supply_cte_scans_lineitem_exactly_once(spark):
    """Round 12: Q2's correlated min is computed as a window over the
    SINGLE European supply chain — lineitem must be scanned exactly
    once (the r11 two-branch decorrelation scanned it twice; the
    correlated re-execution shape would be once-per-part)."""
    plan = plan_of(spark, "tpch_q2_min_cost_supplier")
    n = sum("lineitem.parquet" in line for line in plan.splitlines()
            if line.strip().startswith("Location:"))
    assert n == 1, f"expected 1 lineitem scan, saw {n}"


def test_q21_stats_form_scans_lineitem_exactly_twice(spark):
    """Round 12: Q21's EXISTS/NOT EXISTS pair is expressed as
    per-(order, supplier) stats joined back — lineitem is scanned
    exactly twice (stats build + l1 rows) with no anti join (the r11
    semi/anti decorrelation scanned it three times)."""
    plan = plan_of(spark, "tpch_q21_suppliers_kept_waiting")
    n = sum("lineitem.parquet" in line for line in plan.splitlines()
            if line.strip().startswith("Location:"))
    assert n == 2, f"expected 2 lineitem scans, saw {n}"
    assert "LeftAnti" not in plan


def test_q16_not_in_plans_as_anti_join(spark):
    """Q16's NOT IN subquery must become a (null-aware) anti join
    against the tiny supplier dim."""
    plan = plan_of(spark, "tpch_q16_supplier_part_kinds")
    assert "LeftAnti" in plan


@pytest.mark.parametrize(
    "name",
    [
        "dedup_exact",
        "sample_bernoulli_hash",
        "topk_per_group",
        "hof_array_lambdas",
        "array_set_ops",
        "lateral_posexplode",
    ],
)
def test_corpus_sized_results_carry_no_presentation_sort(spark, name):
    """Queries whose result is corpus-proportional must not end in a
    global sort: at 100 TB a presentation ORDER BY is an extra
    range-partitioned shuffle feeding a serial merge on fetch, for
    ordering no downstream consumer relies on (the driver's comparator
    is order-insensitive). A global sort is the only thing that plans
    an ``Exchange rangepartitioning`` — window functions and
    sort-merge joins sort within hash partitions — so its absence is
    the gate."""
    assert "rangepartitioning" not in plan_of(spark, name)
