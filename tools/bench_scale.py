"""sf1.0 scale smoke for the heavy-tail corpus queries (VERDICT r5 #4).

The driver ships sf{0.001,0.01,0.1} only, so this tool synthesizes a
10x corpus from sf0.1 by SHARDED replication — the realistic growth
model where a corpus gets bigger by adding new sources, not by
photocopying old ones:

- every table is unioned 10x with primary/foreign keys remapped by a
  per-copy offset (join fan-outs stay exactly TPC-H-shaped);
- ``documents.text`` gets a per-copy token suffix (``word~i``), making
  copy vocabularies DISJOINT: each copy reproduces sf0.1's duplicate
  clusters and shingle document-frequency distribution, so cluster
  count grows 10x while cluster sizes and df_max stay fixed. Under
  this null model a scale-safe operator is ~linear; superlinearity
  indicts the OPERATOR, not the data. (Photocopy replication instead
  multiplies every cluster size by 10 — that measures the adversarial
  boilerplate regime, where Sigma-bucket^2 growth is a property of the
  data and every pair-enumerating system on earth is quadratic.)
- ``embeddings`` are perturbed per copy (+i*1e-3 on a component stripe)
  so vector dedup sees 10x clusters, not 10-deep exact stacks;
- ``events`` keep their time range (10x traffic density), user/event
  ids remapped; dims (region/nation) stay fixed as in TPC-H.

Run:  python tools/bench_scale.py          # writes BENCH_SCALE.json
Env:  SPARK_GRAFT_SCALE_DIR (default /tmp/sparkgraft_scale/sf1.0)
      SPARK_GRAFT_SCALE_COPIES (default 10)

Output: BENCH_SCALE.json at the repo root —
    {"queries": {name: {"t_small": s, "t_big": s, "ratio": r,
                        "exponent": log10(ratio)}}, ...}
ratio is big/small wall time per query (min of 2 runs each, noop-sink
forced, same session); exponent 1.0 = perfectly linear in rows. Small
fixed costs (planning, stage launch ~0.2-0.5 s) deflate exponents at
these sizes; ratios well UNDER 10 mean the query is dominated by fixed
overhead at sf0.1, not that it beats linear asymptotically.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sparksql_server_spark import get_session
from sparksql_server_spark.operators import QUERIES

SF_SMALL = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
COPIES = int(os.environ.get("SPARK_GRAFT_SCALE_COPIES", "10"))
# non-default copy counts build in their own directory so the x10
# corpus stays reusable next to a x100 big-regime build
_DEFAULT_SCALE_DIR = (
    "/tmp/sparkgraft_scale/sf1.0"
    if COPIES == 10
    else f"/tmp/sparkgraft_scale/x{COPIES}"
)
SCALE_DIR = os.environ.get("SPARK_GRAFT_SCALE_DIR", _DEFAULT_SCALE_DIR)
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH_SCALE.json") \
    if "repo" in os.path.abspath(__file__) else "BENCH_SCALE.json"

# the >=~1.5 s tail of BENCH_DETAIL.json plus the formerly-"weak"
# pair-join dedups whose Sigma-bucket^2 bounds the verdict asked to
# MEASURE rather than argue
HEAVY = [
    "dedup_prefix_filter_join",
    "graph_pagerank_entities",
    "agg_hll_running_distinct",
    "dedup_clusters",
    "dedup_winnowing",
    "grouped_ols_regression",
    "graph_triangle_count",
    "pipeline_training_data",
    "emb_pca_power_iteration",
    "dedup_ngram_jaccard",
    "dedup_shingle_containment",
    "dedup_minhash_lsh",
    "dedup_simhash_pairs",
    "sim_topk_bruteforce",
    "dedup_exact_substring_runs",
]

# per-table key remaps: (column, offset_source_column) — offset is
# copy_index * (max(source col at sf0.1) + 1), computed once
_KEYS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
# key spaces must offset CONSISTENTLY across tables (l_orderkey by the
# orders offset, o_custkey by the customer offset, ...)
_KEY_SPACE = {
    "c_custkey": ("customer", "c_custkey"),
    "s_suppkey": ("supplier", "s_suppkey"),
    "p_partkey": ("part", "p_partkey"),
    "o_orderkey": ("orders", "o_orderkey"),
    "o_custkey": ("customer", "c_custkey"),
    "l_orderkey": ("orders", "o_orderkey"),
    "l_partkey": ("part", "p_partkey"),
    "l_suppkey": ("supplier", "s_suppkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
    "doc_id": ("documents", "doc_id"),
    "vec_id": ("embeddings", "vec_id"),
}


def build_scaled(spark) -> None:
    if os.path.exists(os.path.join(SCALE_DIR, "_DONE")):
        return
    os.makedirs(SCALE_DIR, exist_ok=True)
    offsets = {}
    for col, (tbl, src) in _KEY_SPACE.items():
        if (tbl, src) not in offsets:
            mx = (
                spark.read.parquet(f"{SF_SMALL}/{tbl}.parquet")
                .agg(F.max(src))
                .first()[0]
            )
            offsets[(tbl, src)] = int(mx) + 1
    for tbl in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        df = spark.read.parquet(f"{SF_SMALL}/{tbl}.parquet")
        if tbl in ("region", "nation"):
            out = df  # dims stay fixed (TPC-H shape)
        else:
            copies = []
            for i in range(COPIES):
                c = df
                for col in _KEYS[tbl]:
                    off = i * offsets[_KEY_SPACE[col]]
                    c = c.withColumn(col, (F.col(col) + F.lit(off)).cast("bigint"))
                if tbl == "documents" and i > 0:
                    # disjoint per-copy vocabulary: each copy reproduces
                    # sf0.1's dup clusters / shingle-df distribution
                    c = c.withColumn(
                        "text", F.regexp_replace("text", r"(\S+)", f"$1~{i}")
                    )
                if tbl == "embeddings" and i > 0:
                    c = c.withColumn(
                        "embedding",
                        F.transform(
                            "embedding",
                            lambda x, j: (
                                x + (j % 7 - 3) * F.lit(float(i) * 1e-3)
                            ).cast("float"),
                        ),
                    )
                copies.append(c)
            out = copies[0]
            for c in copies[1:]:
                out = out.unionByName(c)
        n_parts = max(4, COPIES * 4) if tbl in ("lineitem", "events") else COPIES
        out.repartition(n_parts).write.mode("overwrite").parquet(
            f"{SCALE_DIR}/{tbl}.parquet"
        )
    with open(os.path.join(SCALE_DIR, "_DONE"), "w") as f:
        f.write("ok\n")


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


class _Session:
    """Session holder that can recover from a fatal executor error.

    A query that OOMs the local JVM stops the SparkContext; without
    recovery every LATER query in the batch records a junk
    "Cannot call methods on a stopped SparkContext" row that then
    merges into BENCH_SCALE.json as if the query itself failed
    (round 11: one OOM poisoned five rows). `get()` rebuilds the
    session when the previous one died."""

    def __init__(self):
        self._spark = None

    def get(self):
        if self._spark is not None:
            try:
                if not self._spark.sparkContext._jsc.sc().isStopped():
                    return self._spark
            except Exception:
                pass
            try:
                self._spark.stop()
            except Exception:
                pass
        self._spark = get_session(app_name="bench-scale", cpus=CPUS)
        return self._spark


def _time_query(sess: "_Session", name: str, sf_dir: str, runs: int = 2) -> float:
    best = float("inf")
    for _ in range(runs):
        spark = sess.get()
        t0 = time.monotonic()
        _force(QUERIES[name](spark, sf_dir))
        best = min(best, time.monotonic() - t0)
        spark.catalog.clearCache()
    return best


def main() -> None:
    # selection: default = HEAVY tail; `--all` = the full corpus (the
    # r6 verdict's ask — a constant-factor drift anywhere shows up as
    # an outlier ratio without waiting for a regression to hit the
    # top-5); explicit names = just those (quick re-measure after a
    # targeted fix). Subset runs MERGE into the existing
    # BENCH_SCALE.json so partial re-runs never erase corpus coverage.
    argv = sys.argv[1:]
    if argv == ["--all"]:
        names = list(QUERIES)
    elif argv:
        # validate BEFORE touching the output file: subset runs merge
        # into BENCH_SCALE.json, so a typo'd or flag-like argument
        # would otherwise persist a phantom {'err': ...} row through
        # every future merge (review r7)
        bad = [n for n in argv if n not in QUERIES]
        if bad:
            sys.exit(f"unknown queries (nothing written): {bad}")
        names = argv
    else:
        names = HEAVY
    sess = _Session()
    spark = sess.get()
    build_scaled(spark)
    big_rows = spark.read.parquet(f"{SCALE_DIR}/lineitem.parquet").count()
    import math

    # exponent normalizes by the replication factor: log_COPIES(ratio),
    # so 1.0 = perfectly linear in rows at ANY copy count (the x10
    # records' exponents were log10(ratio), the same thing at COPIES=10)
    exp_den = math.log10(COPIES)
    results: dict[str, dict] = {}
    for name in names:
        try:
            t_small = _time_query(sess, name, SF_SMALL)
            t_big = _time_query(sess, name, SCALE_DIR)
            ratio = t_big / t_small if t_small > 0 else float("inf")
            results[name] = {
                "t_small": round(t_small, 3),
                "t_big": round(t_big, 3),
                "ratio": round(ratio, 2),
                "exponent": round(
                    math.log10(ratio) / exp_den if ratio > 0 else 0.0, 3
                ),
            }
        except Exception as exc:  # a failing query must not hide the rest
            results[name] = {"err": f"{type(exc).__name__}: {exc}"}
        print(name, results[name], flush=True)

    record: dict = {}
    if os.path.exists(OUT):
        try:
            with open(OUT) as f:
                record = json.load(f)
        except Exception:
            record = {}

    if COPIES == 10:
        out = {
            "mode": f"sharded replication x{COPIES} of {SF_SMALL}",
            "sf_small": SF_SMALL,
            "sf_big": SCALE_DIR,
            "lineitem_rows_big": big_rows,
            "queries": {},
        }
        if set(names) != set(QUERIES):
            out["queries"] = record.get("queries", {})
        out["queries"].update(results)
        sup = {
            k: v["ratio"]
            for k, v in out["queries"].items()
            if isinstance(v.get("ratio"), (int, float))
            and v["ratio"] > COPIES * 1.3
        }
        out["superlinear"] = sup
        # regression list: the ranked worst x10 trends. Re-running a
        # subset after a fix updates its row; comparing this list
        # round-over-round catches constant-factor drifts (like r6's
        # HLL CTE regression) before they reach the expensive tail.
        ranked = sorted(
            (
                (k, v)
                for k, v in out["queries"].items()
                if isinstance(v.get("ratio"), (int, float))
            ),
            key=lambda kv: -kv[1]["ratio"],
        )
        out["worst_trends"] = [{"query": k, **v} for k, v in ranked[:15]]
        if "big_regime" in record:  # a prior big run survives x10 refreshes
            out["big_regime"] = record["big_regime"]
        record = out
    else:
        # big-regime run (round 11, VERDICT r10 ask #6): nest under
        # "big_regime" so the x10 corpus sweep stays intact; rows from
        # a DIFFERENT copy count are replaced, same-count rows merge
        sup = {
            k: v["ratio"]
            for k, v in results.items()
            if isinstance(v.get("ratio"), (int, float))
            and v["ratio"] > COPIES * 1.3
        }
        br = record.get("big_regime") or {}
        if br.get("copies") != COPIES:
            br = {"copies": COPIES, "queries": {}}
        br.update(
            mode=f"sharded replication x{COPIES} of {SF_SMALL}",
            sf_small=SF_SMALL,
            sf_big=SCALE_DIR,
            lineitem_rows_big=big_rows,
        )
        br["queries"].update(results)
        br["superlinear"] = {
            k: v["ratio"]
            for k, v in br["queries"].items()
            if isinstance(v.get("ratio"), (int, float))
            and v["ratio"] > COPIES * 1.3
        }
        record["big_regime"] = br

    with open(OUT, "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps({"wrote": OUT, "superlinear": sup}))


if __name__ == "__main__":
    main()
