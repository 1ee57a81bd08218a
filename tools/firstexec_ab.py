"""A/B harness for first-execution compile-floor work (VERDICT r8 ask
#5): run ONE corpus query in a fresh warm session — first-exec + 3
steady trials — mirroring bench.py's per-query regime without the
25-minute corpus.

Run: python tools/firstexec_ab.py <query_name> [trials]
Each invocation is one fresh JVM (compile caches empty), so first-exec
numbers are comparable across invocations.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparksql_server_spark import get_session  # noqa: E402
from sparksql_server_spark.catalog import register_tables  # noqa: E402
from sparksql_server_spark.operators import QUERIES  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    name = sys.argv[1]
    steady_trials = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_session("firstexec-ab", cpus=CPUS)
    register_tables(spark, SF_DIR)
    _force(spark.sql("SELECT count(*) AS n FROM region"))  # warm JVM
    # warm the Python/Arrow worker pool too: in bench.py's context many
    # Arrow queries run before any given corpus query, so daemon workers
    # are already up — a fresh session would otherwise charge worker
    # startup to whichever variant uses Arrow first (skews A/Bs)
    import pandas as pd  # noqa: F401
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _warm(s):
        return s

    spark.range(10_000).repartition(CPUS).select(_warm("id")).write.format(
        "noop"
    ).mode("overwrite").save()

    t0 = time.monotonic()
    _force(QUERIES[name](spark, SF_DIR))
    first = time.monotonic() - t0
    steadies = []
    for _ in range(steady_trials):
        t0 = time.monotonic()
        _force(QUERIES[name](spark, SF_DIR))
        steadies.append(round(time.monotonic() - t0, 3))
    print(
        f"{name}: first={first:.3f} steady_min={min(steadies):.3f}"
        f" steadies={steadies}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
