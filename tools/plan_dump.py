"""Dump ``explain('formatted')`` for named corpus queries to
plans/r12/<query>_<tag>.txt (driver-side planning only — builds each
DataFrame, never executes it, except queries whose CONSTRUCTION spills
scratch intermediates, which run those stages).

Run: python tools/plan_dump.py before q1 q2 ...
     python tools/plan_dump.py after --all-touched   (reads names from
                                                      plans/r12/*_before.txt)
"""

from __future__ import annotations

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparksql_server_spark import get_session  # noqa: E402
from sparksql_server_spark.catalog import register_tables  # noqa: E402
from sparksql_server_spark.operators import QUERIES  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
PLANS_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r13"),
)


def main() -> None:
    tag = sys.argv[1]
    rest = sys.argv[2:]
    if rest == ["--all-touched"]:
        names = sorted(
            os.path.basename(p)[: -len("_before.txt")]
            for p in glob.glob(os.path.join(PLANS_DIR, "*_before.txt"))
        )
    else:
        names = rest
    os.makedirs(PLANS_DIR, exist_ok=True)
    spark = get_session("plan-dump", cpus=CPUS)
    register_tables(spark, SF_DIR)
    for name in names:
        df = QUERIES[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(PLANS_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange,"
              f" {plan.count('SortMergeJoin')} SMJ,"
              f" {plan.count('EvalPython')} pyEval)")
    spark.stop()


if __name__ == "__main__":
    main()
