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


def _top_level_fields(struct_body: str) -> int:
    """Count top-level fields of a ``struct<...>`` body (commas inside
    nested ``<>`` don't count)."""
    if not struct_body.strip():
        return 0
    depth = 0
    n = 1
    for ch in struct_body:
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
        elif ch == "," and depth == 0:
            n += 1
    return n


def scan_nodes(df: DataFrame) -> list[tuple[str, int | None, str | None]]:
    """All file-scan nodes of ``df``'s formatted physical plan, as
    (source root, pruned-ReadSchema width, file format) tuples.
    Planning only, no execution."""
    import re

    jqe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    text = jqe.explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    out: list[tuple[str, int | None, str | None]] = []
    fmt: str | None = None
    location: list[str] | None = None
    for raw in text.splitlines():
        line = raw.strip()
        header = re.match(r"\(\d+\) Scan (\w+)", line)
        if header:
            fmt = header.group(1).lower()
        elif line.startswith("Location:"):
            # "Location: InMemoryFileIndex [file:/p1, file:/p2, ...]"
            # — multi-path locations print comma-separated and every
            # printed path is a source (server/observer.py::scan_events
            # splits identically). Honest cap: Spark 4.1's formatted
            # explain elides a multi-root index to its FIRST root plus
            # "... N entries" regardless of maxMetadataStringLength
            # (verified), so extra roots of a read.parquet(p1, p2) scan
            # are unrecoverable here — the width/format maps are a
            # cost-model heuristic keyed by what the plan shows, while
            # DETECTION correctness always rests on scan_fingerprints
            # (df.inputFiles), which sees every root
            inner = line.split("[", 1)[-1].rstrip("]")
            paths = []
            for p in inner.split(","):
                p = p.strip()
                # Spark elides long path lists as "... N entries"
                if not p or p.startswith("..."):
                    continue
                if p.startswith("file:"):
                    p = "/" + p.removeprefix("file:").lstrip("/")
                paths.append(p)
            location = paths or None
        elif line.startswith("ReadSchema:") and location is not None:
            body = line.split("struct<", 1)[-1].rsplit(">", 1)[0]
            width = _top_level_fields(body)
            for p in location:
                out.append((p, width, fmt))
            location = None
            fmt = None
    return out


def scan_read_columns(df: DataFrame) -> dict[str, int]:
    """Per scanned source root: how many top-level columns the query
    actually READS (the scan's pruned ReadSchema — what column pruning
    left, not the table width).

    Feeds the cache-admission cost model: a full-table cache build
    decodes every column, but a narrow query only saves its own
    ReadSchema's worth of scan work — at 100 TB the difference decides
    whether caching pays (SURVEY.md §4.3 item 4, the honest B7).
    Self-joins (same source scanned twice) keep the widest scan.
    (Derivable from one ``scan_nodes`` call — the executor does that to
    avoid rendering the formatted plan twice per job.)
    """
    out: dict[str, int] = {}
    for location, ncols, _ in scan_nodes(df):
        if ncols is not None:
            out[location] = max(out.get(location, 0), ncols)
    return out


def scan_source_formats(df: DataFrame) -> dict[str, str]:
    """Per scanned source root: the file format feeding it ("parquet",
    "csv", "json", "orc", "text", …).

    Cache admission is format-aware: rescanning columnar parquet/orc is
    cheap (vectorized decode over page-cached bytes — measured: a warm
    InMemoryRelation wave ran only ~1.2× faster than the uncached
    concurrent wave), while rescanning row-text csv/json repays a full
    parse every time, which is exactly what one cached build
    eliminates. The reference's own evaluation corpus was text files
    (report.pdf ch.5, Gutenberg), where caching shines.
    """
    return {loc: fmt for loc, _, fmt in scan_nodes(df) if fmt is not None}
