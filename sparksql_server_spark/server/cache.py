"""Cache manager — the honest version of the reference's ScanCaching
cost model + cross-batch eviction.

Reference state of the art: ``ScanCachingCM.compute()`` returns
``Random.nextBoolean()`` (SRV/costmodel/udcm/ScanCachingCM.scala:27-33)
and the executor unpersists *everything* between batches
(WorksharingExecutor.scala:72-75). We replace both:

- admission: cache a shared source only if its on-disk bytes fit in a
  configured budget fraction (estimated from the file sizes the scan
  reads — an actual cost model, the thesis's own future-work item,
  report.pdf ch. 6.2);
- eviction: LRU by last-use within a byte budget, instead of
  clear-all (cache is semantically transparent in Spark, so eviction
  never changes results — SURVEY.md §7 hard-part #2).

Caching happens at *table* granularity via ``spark.catalog.cacheTable``:
after that, Catalyst substitutes the InMemoryRelation into EVERY
query over the table automatically — the declarative equivalent of the
reference's manual DAG surgery (Caching.scala:67-83 ``replaceScan``).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

from pyspark.sql import SparkSession


def _dir_bytes(path: str) -> int:
    local = path.removeprefix("file:")
    if os.path.isdir(local):
        return sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, files in os.walk(local)
            for f in files
        )
    if os.path.isfile(local):
        return os.path.getsize(local)
    return 0


@dataclass
class CacheEntry:
    view: str
    source: str
    bytes: int
    last_used: float = field(default_factory=time.monotonic)


class CacheManager:
    """Size-aware admission + LRU eviction over cached temp views."""

    def __init__(
        self,
        spark: SparkSession,
        budget_bytes: int = 4 << 30,
        min_sharers: int = 2,
        min_bytes: int = 64 << 20,
        benefit_factor: float = 1.2,
    ) -> None:
        self.spark = spark
        self.budget = budget_bytes
        self.min_sharers = min_sharers
        # Read-fraction benefit bar: building the InMemoryRelation
        # decodes ALL columns (cost ≈ 1 full scan), while each sharer
        # only saves its own pruned ReadSchema's worth of scan work —
        # so caching pays when Σ_jobs read_fraction exceeds the build
        # cost with margin. Ten single-column COUNT queries over a
        # 20-column table sum to 0.5 full scans saved: cheaper to let
        # each read its one column from parquet than to decode 20.
        self.benefit_factor = benefit_factor
        # Admission floor: below this, building the InMemoryRelation
        # costs more than re-decoding parquet ever will (measured: at a
        # 10 MB scan the cache build tripled batch latency while pure
        # concurrent execution already beat sequential 2×). The same
        # cost-blindness made the reference's MRShare rewrite a
        # regression (report.pdf ch.5, Table 5.1) — admission must be
        # cost-aware, not always-on.
        self.min_bytes = min_bytes
        self._entries: dict[str, CacheEntry] = {}  # keyed by source fingerprint

    def should_cache(
        self,
        source: str,
        n_sharers: int,
        read_fractions: list[float] | None = None,
    ) -> bool:
        """Admission: enough sharers, a scan big enough to pay for its
        own materialization, small enough to fit the budget, and —
        when the scheduler supplies per-job pruned-ReadSchema widths —
        enough total column-read work saved to beat the full-width
        cache build (``benefit_factor``)."""
        if n_sharers < self.min_sharers:
            return False
        if not self.min_bytes <= _dir_bytes(source) <= self.budget:
            return False
        if read_fractions is not None:
            return sum(read_fractions) >= self.benefit_factor
        return True

    def ensure_cached(self, source: str, view: str) -> bool:
        """Cache ``view`` (a registered temp view over ``source``) if
        admitted; returns True when the view is cached after the call."""
        if source in self._entries:
            self._entries[source].last_used = time.monotonic()
            return True
        size = _dir_bytes(source)
        if size > self.budget:
            return False
        self._evict_until(self.budget - size)
        self.spark.catalog.cacheTable(view)
        # materialize NOW with a cheap action (the reference's cache
        # warming count, WordCount.scala:73-77) so every job in the
        # batch — including the first — runs concurrently on warm cache
        self.spark.table(view).count()
        self._entries[source] = CacheEntry(view=view, source=source, bytes=size)
        return True

    def touch(self, source: str) -> None:
        if source in self._entries:
            self._entries[source].last_used = time.monotonic()

    def _evict_until(self, free_target: int) -> None:
        used = sum(e.bytes for e in self._entries.values())
        if used <= free_target:
            return
        for src, entry in sorted(self._entries.items(), key=lambda kv: kv[1].last_used):
            try:
                self.spark.catalog.uncacheTable(entry.view)
            except Exception:
                pass  # view may have been replaced; eviction must not fail a batch
            del self._entries[src]
            used -= entry.bytes
            if used <= free_target:
                return

    def clear(self) -> None:
        """The reference's clear-all (WorksharingExecutor.scala:72-75),
        kept for tests and shutdown."""
        for entry in list(self._entries.values()):
            try:
                self.spark.catalog.uncacheTable(entry.view)
            except Exception:
                pass
        self._entries.clear()

    @property
    def cached_sources(self) -> set[str]:
        return set(self._entries)
