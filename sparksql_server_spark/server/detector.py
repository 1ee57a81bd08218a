"""Shared-scan detection — the honest rebuild of the reference's
ScanSharing rule (SRV/detector/rules/ScanSharing.scala:39-119).

Semantics replicated exactly (SURVEY.md §7 "hard parts" #1):
- per job, collect the set of leaf input sources (``initiate``/
  ``getInput``, ScanSharing.scala:39-74 — there: leaf-RDD toString
  prefixes; here: plan-leaf fingerprints from plans/analysis.py);
- group jobs whose source sets intersect, TRANSITIVELY — a job
  scanning {A,B} bridges a job on {A} and a job on {B} into one bag
  (the fixpoint loop of ``analyse``, ScanSharing.scala:95-119);
- singleton groups flow through as unshared bags
  (OptimizationExecutor.scala:36-77 treats size-1 bags as NOOP).
"""

from __future__ import annotations

from sparksql_server_spark.server.model import QueryJob, SharingBag


def detect_sharing(jobs: list[QueryJob]) -> list[SharingBag]:
    """Union-find over scan-fingerprint overlap (transitive closure)."""
    parent = list(range(len(jobs)))

    def find(i: int) -> int:
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    def union(i: int, j: int) -> None:
        ri, rj = find(i), find(j)
        if ri != rj:
            parent[rj] = ri

    # map each source -> first job seen with it; union subsequent ones
    seen: dict[str, int] = {}
    for i, job in enumerate(jobs):
        for src in job.fingerprints:
            if src in seen:
                union(seen[src], i)
            else:
                seen[src] = i

    groups: dict[int, list[QueryJob]] = {}
    for i, job in enumerate(jobs):
        groups.setdefault(find(i), []).append(job)

    bags: list[SharingBag] = []
    for members in groups.values():
        shared: frozenset[str] = frozenset()
        if len(members) > 1:
            # sources scanned by 2+ members of the bag (cache targets)
            counts: dict[str, int] = {}
            for j in members:
                for src in j.fingerprints:
                    counts[src] = counts.get(src, 0) + 1
            shared = frozenset(s for s, c in counts.items() if c > 1)
        bags.append(SharingBag(jobs=members, shared_sources=shared))
    # deterministic order: by first job id in the bag
    bags.sort(key=lambda b: b.jobs[0].job_id)
    return bags
