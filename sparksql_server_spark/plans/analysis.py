"""Scan-source fingerprinting of analyzed plans.

The reference walks each job's RDD DAG to its leaf RDDs and keys
sharing on the leaf's input-source string
(``SRV/detector/rules/ScanSharing.scala:58-74`` — ``getInput`` takes
``rdd.toString.split(" "){0}`` of each leaf). Our equivalent walks the
*analyzed logical plan* of a DataFrame and fingerprints its leaf
relations — file-source leaves by their root file paths, view/table
leaves by catalog name.

This is plan-level Python inspection above Catalyst, exactly where the
reference sat above the DAG scheduler (SURVEY.md §4.1): cross-query
concerns don't belong inside the per-query optimizer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def scan_fingerprints(df: DataFrame) -> frozenset[str]:
    """Return the set of input-source identifiers feeding ``df``.

    Uses ``df.inputFiles()`` (public API; resolves file-source leaves
    after view expansion). Fingerprints are scheme-normalized data-file
    paths: two queries over the same table list the same files, so
    their sets overlap regardless of whether the table is a single
    parquet file or a directory of part-files; part-files of a
    directory table additionally collapse to the table root so the
    fingerprint matches the catalog's source path.
    """
    roots: set[str] = set()
    for f in df.inputFiles():
        path = f
        if path.startswith("file:"):  # file:///x -> /x
            path = "/" + path.removeprefix("file:").lstrip("/")
        base = path.rsplit("/", 1)[-1]
        if base.startswith("part-"):  # directory table -> table root
            path = path.rsplit("/", 1)[0]
        roots.add(path)
    return frozenset(roots)


def shares_scan(a: frozenset[str], b: frozenset[str]) -> bool:
    """True when two fingerprint sets overlap (reference:
    ``ScanSharing.check``, ScanSharing.scala:84-92)."""
    return not a.isdisjoint(b)
