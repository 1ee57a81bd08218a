"""One-off calibration for the cross-signature GROUPING SETS merge
(VERDICT r8 ask #4): merged vs concurrent wall-clock at 2/3/4 distinct
grouping sets over the bench's 8x CSV fact. Decides whether the DP's
regime-2 admission should fire by default, and at what set count.

Run: python tools/gsets_calibrate.py  (~8 min at sf0.1, local[32])
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  — reuse the session/fact builders
from sparksql_server_spark.catalog import register_tables  # noqa: E402
from sparksql_server_spark.server.cache import CacheManager  # noqa: E402
from sparksql_server_spark.server.model import QueryJob  # noqa: E402
from sparksql_server_spark.server.scheduler import BatchExecutor  # noqa: E402
from sparksql_server_spark.session import get_session  # noqa: E402

GS_POOL = [
    "SELECT l_returnflag AS k, count(*) AS n,"
    " CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS q"
    " FROM lineitem_big GROUP BY l_returnflag",
    "SELECT l_linestatus AS k, count(*) AS n, max(l_extendedprice) AS mx"
    " FROM lineitem_big GROUP BY l_linestatus",
    "SELECT l_linenumber AS k, count(*) AS n,"
    " CAST(avg(l_discount) AS DOUBLE) AS d"
    " FROM lineitem_big GROUP BY l_linenumber",
    "SELECT l_returnflag AS k1, l_linestatus AS k2, min(l_shipdate) AS mn"
    " FROM lineitem_big WHERE l_quantity >= 25"
    " GROUP BY l_returnflag, l_linestatus",
]


def run_leg(spark, queries, merged: bool, base_id: int) -> float:
    ex = BatchExecutor(
        spark,
        cache=CacheManager(spark, budget_bytes=8 << 30, min_bytes=1 << 40),
        source_views={bench.BIG_DIR: "lineitem_big"},
        enable_mrshare=merged,
        mrshare_max_grouping_sets=8,
    )
    jobs = [QueryJob(job_id=base_id + i, sql=q) for i, q in enumerate(queries)]
    t0 = time.monotonic()
    bags = ex.run_batch(jobs)
    dt = time.monotonic() - t0
    if merged and not any(b.merges for b in bags):
        print("WARN: merge did not fire", file=sys.stderr)
    if any(j.status.value != "done" for j in jobs):
        print("WARN: failed jobs", file=sys.stderr)
    ex.cache.clear()
    return dt


def main() -> None:
    spark = get_session("gsets-calibrate", cpus=bench.CPUS)
    register_tables(spark, bench.SF_DIR)
    bench.ensure_big_table(spark)
    bench._force(spark.sql(GS_POOL[0]))  # warm codegen

    trials = 3
    out: dict[str, list[float]] = {}
    for n_sets in (2, 3, 4):
        queries = GS_POOL[:n_sets]
        for rep in range(trials):
            out.setdefault(f"conc_{n_sets}", []).append(
                run_leg(spark, queries, False, 40000 + 1000 * n_sets + 10 * rep)
            )
            out.setdefault(f"merged_{n_sets}", []).append(
                run_leg(spark, queries, True, 50000 + 1000 * n_sets + 10 * rep)
            )
    for k in sorted(out):
        xs = out[k]
        print(f"{k}: {[round(x, 2) for x in xs]} median={sorted(xs)[len(xs)//2]:.2f}")
    spark.stop()


if __name__ == "__main__":
    main()
