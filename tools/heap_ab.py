"""Interleaved fresh-JVM heap A/B over first-exec compile floors
(VERDICT r11 ask #1): the four dedup queries that flagged in r11's
normalized_vs_prev were never code-changed that round — the suspect is
the round-11 default driver-heap change 8g→32g (session.py), which
shifts JVM GC ergonomics/JIT warmup exactly where compile floors live.

Runs tools/firstexec_ab.py per query with SPARK_GRAFT_DRIVER_MEM
alternating 8g/32g (ABAB… interleaved so machine drift hits both arms
equally), reps fresh-JVM each, and prints a JSON summary of per-arm
first-exec and steady-min times.

Run: python tools/heap_ab.py [reps_per_arm] [query ...]
"""
from __future__ import annotations

import json
import os
import re
import subprocess
import sys

DEFAULT_QUERIES = (
    "dedup_clusters",
    "dedup_incremental_lsh",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
)
_LINE = re.compile(
    r"^(\S+): first=([\d.]+) steady_min=([\d.]+) steadies=\[([^\]]*)\]"
)


def run_one(query: str, mem: str) -> tuple[float, float]:
    env = dict(os.environ, SPARK_GRAFT_DRIVER_MEM=mem)
    out = subprocess.run(
        [sys.executable, "tools/firstexec_ab.py", query, "3"],
        capture_output=True,
        text=True,
        env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        check=True,
    ).stdout
    for line in out.splitlines():
        m = _LINE.match(line.strip())
        if m:
            return float(m.group(2)), float(m.group(3))
    raise RuntimeError(f"no result line for {query} ({mem}): {out[-400:]}")


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    queries = sys.argv[2:] or list(DEFAULT_QUERIES)
    results: dict[str, dict] = {}
    for q in queries:
        arms: dict[str, dict[str, list[float]]] = {
            "8g": {"first": [], "steady_min": []},
            "32g": {"first": [], "steady_min": []},
        }
        for rep in range(reps):
            for mem in ("8g", "32g"):
                first, steady = run_one(q, mem)
                arms[mem]["first"].append(first)
                arms[mem]["steady_min"].append(steady)
                print(
                    f"{q} rep{rep} {mem}: first={first:.3f}"
                    f" steady_min={steady:.3f}",
                    flush=True,
                )
        results[q] = {
            mem: {
                "first": arm["first"],
                "first_min": min(arm["first"]),
                "first_med": sorted(arm["first"])[len(arm["first"]) // 2],
                "steady_min": min(arm["steady_min"]),
            }
            for mem, arm in arms.items()
        }
        results[q]["first_ratio_32g_over_8g"] = round(
            results[q]["32g"]["first_med"] / results[q]["8g"]["first_med"], 3
        )
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
