"""Driver-shape smoke: run one query per family against a DEFAULT-config
SparkSession (bare ``SparkSession.builder.getOrCreate()``, no get_session
tuning) in a fresh subprocess, hash-compared against the DuckDB oracle.

Round 2 proved the runtime can differ from the builder's session shape
(pyspark 4.1.2 dropped ``spark.sql.legacy.parquet.nanosAsLong`` and the
events ingest died only under a default-config read path).  This gate runs
the corpus the way the driver does — fresh python process, no repo session
confs — so any version-coupled conf dependency fails here first.

Subprocess because local-mode Spark allows one JVM per process and the
session-scoped ``spark`` fixture already owns it.
"""

from __future__ import annotations

import json
import subprocess
import sys

# One representative per query family; events/asof/json cover the
# TIMESTAMP(NANOS) read path that broke in round 2.
SMOKE_QUERIES = [
    "a1_scan_region",
    "agg_q1_pricing_summary",
    "tpch_q6_forecast_revenue",
    "join_inner_4way",
    "win_moving_avg",
    "setop_except",
    "events_tumbling_hour",
    "events_sessionize",
    "asof_last_error",
    "json_variant",
    "scd2_intervals",
    "dedup_exact",
    "sim_topk_bruteforce",
    "text_quality",
    "sample_bernoulli_hash",
    "recursive_month_spine",
    # the two heaviest iterative/self-join pipelines (VERDICT r3 #4),
    # which also exercise the CacheScope spill-and-release path
    "graph_pagerank_entities",
    "dedup_prefix_filter_join",
    # the newest registered family member (bucketed range search)
    "sim_range_search_lsh",
    # round-4 additions: leakage-free windowed features + the
    # association/drift stats family (ml_features.py)
    "pipeline_point_in_time_features",
    "stats_chi2_independence",
]

_WORKER = r"""
import json, sys
sys.path.insert(0, "/root/repo")
import duckdb
from pyspark.sql import SparkSession

from sparksql_server_spark.catalog import TABLES
from sparksql_server_spark.operators import ORACLES, QUERIES
from tests.oracle_compare import compare

SF_DIR = "/root/testdata/sf0.001"
names = json.loads(sys.argv[1])

# The driver's shape: master from env/default, NO repo confs (no UTC
# timezone pin, no shuffle-partition tuning, no legacy confs).
spark = (
    SparkSession.builder.master("local[8]")
    .appName("default-config-smoke")
    .getOrCreate()
)

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

failures = {}
for name in names:
    try:
        sdf = QUERIES[name](spark, SF_DIR)
        spark_rows = [tuple(r) for r in sdf.collect()]
        rel = con.sql(ORACLES[name])
        duck_cols = [d[0] for d in rel.description]
        problems = compare(list(sdf.columns), spark_rows, duck_cols, rel.fetchall())
        if problems:
            failures[name] = problems
    except Exception as e:  # noqa: BLE001 - report, don't crash the sweep
        failures[name] = [f"{type(e).__name__}: {e}"[:500]]

print("RESULT:" + json.dumps(failures))
"""


def test_default_config_smoke():
    proc = subprocess.run(
        [sys.executable, "-c", _WORKER, json.dumps(SMOKE_QUERIES)],
        capture_output=True,
        text=True,
        timeout=900,
        cwd="/root/repo",
    )
    result_lines = [
        ln for ln in proc.stdout.splitlines() if ln.startswith("RESULT:")
    ]
    assert result_lines, (
        f"worker produced no result (rc={proc.returncode})\n"
        f"stdout tail: {proc.stdout[-2000:]}\nstderr tail: {proc.stderr[-2000:]}"
    )
    failures = json.loads(result_lines[0][len("RESULT:") :])
    assert not failures, "default-config failures:\n" + json.dumps(
        failures, indent=1
    )
