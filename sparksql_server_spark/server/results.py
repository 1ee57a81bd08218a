"""Gateway-level result cache — identical query text answered from
memory, one level above the reference's scan sharing.

The reference shares WORK between concurrent queries (ScanSharing);
repeat submissions of the same query still re-execute. A middleware
front-end can also share RESULTS across time: an inline result keyed
by (session, SQL text) is served straight from the gateway until
something invalidates it.

Safety rules (all conservative):
- only complete inline results are cached (sink jobs and truncated
  inline results never);
- queries containing non-deterministic or time-dependent functions
  (rand, uuid, now, current_timestamp/date, …) are never cached;
- ANY command (DDL/DML/CACHE/SET…) through the gateway invalidates the
  WHOLE cache — per-table invalidation would need write-set tracking,
  and a false retention is a wrong answer while a false invalidation
  only costs a re-run;
- entries expire after ``ttl_seconds`` and the table is LRU-bounded.

At 100 TB this is the cheapest tier of the storage hierarchy: a repeat
dashboard query costs a dict lookup instead of a cluster job; the
bounded entry count and inline-rows-only rule keep the driver-memory
footprint a few MB.
"""

from __future__ import annotations

import re
import threading
import time
from collections import OrderedDict
from typing import Any, Optional

# functions whose results depend on when/where the query runs
_NONDETERMINISTIC = re.compile(
    r"\b(rand|randn|random|uuid|shuffle|now|current_timestamp|current_date|"
    r"current_timezone|unix_timestamp|localtimestamp|monotonically_increasing_id|"
    r"input_file_name|spark_partition_id)\s*\(",
    re.I,
)
# current_date/current_timestamp are valid WITHOUT parens too
_NONDET_BARE = re.compile(r"\b(current_timestamp|current_date|localtimestamp)\b", re.I)


def cacheable_sql(sql: str) -> bool:
    return not (_NONDETERMINISTIC.search(sql) or _NONDET_BARE.search(sql))


def _normalize_outside_literals(sql: str) -> str:
    """Collapse whitespace runs to one space OUTSIDE quoted literals
    only. Whitespace INSIDE a string literal is query semantics —
    ``WHERE name = 'a  b'`` and ``WHERE name = 'a b'`` are different
    queries and must never share a cache key (ADVICE r4 high: the old
    blanket ``re.sub(r'\\s+', ' ')`` silently served the first query's
    result to the second). The in-literal classification is
    ``mrshare._scan`` — ONE lexer for both the cache key and the merge
    parser, so the escape rules (C-style backslash in single/double
    quotes, none in backticks, doubled-quote close-reopen) can never
    drift between the two."""
    from sparksql_server_spark.server.mrshare import _scan

    s = sql.strip()
    _, instr = _scan(s)
    out: list[str] = []
    pending_ws = False
    for i, c in enumerate(s):
        if not instr[i] and c.isspace():
            pending_ws = True
            continue
        if pending_ws:
            # flush before ANY kept char — including an opening quote:
            # dropping the space there would conflate ``'a' 'b'`` (two
            # tokens) with ``'a''b'`` (one doubled-quote literal)
            out.append(" ")
            pending_ws = False
        out.append(c)
    return "".join(out)


class ResultCache:
    """Thread-safe LRU + TTL map of (session, sql) -> result payload."""

    def __init__(
        self,
        max_entries: int = 256,
        ttl_seconds: float = 300.0,
        max_rows_per_entry: int = 5000,
    ) -> None:
        self.max_entries = max_entries
        self.ttl = ttl_seconds
        # inline results are already bounded (scheduler MAX_INLINE_ROWS
        # = 10k), but 256 x 10k-row payloads is real driver memory —
        # only compact results are worth pinning
        self.max_rows_per_entry = max_rows_per_entry
        self._lock = threading.Lock()
        self._entries: OrderedDict[tuple, tuple[float, dict]] = OrderedDict()
        self.hits = 0
        self.misses = 0
        self.invalidations = 0
        # monotone invalidation epoch: put() callers capture it BEFORE
        # submitting their query and pass it back; a put whose epoch is
        # stale (a command ran and invalidated between completion and
        # insertion) is discarded instead of resurrecting a pre-command
        # result for up to TTL (ADVICE r4 low)
        self.generation = 0

    @staticmethod
    def key(session_id: Optional[str], sql: str) -> tuple:
        return (session_id or "", _normalize_outside_literals(sql))

    def get(self, key: tuple) -> Optional[dict]:
        with self._lock:
            hit = self._entries.get(key)
            if hit is None:
                self.misses += 1
                return None
            stored_at, payload = hit
            if time.monotonic() - stored_at > self.ttl:
                del self._entries[key]
                self.misses += 1
                return None
            self._entries.move_to_end(key)
            self.hits += 1
            return dict(payload)

    def put(self, key: tuple, payload: dict, generation: Optional[int] = None) -> None:
        rows = payload.get("rows")
        if rows is not None and len(rows) > self.max_rows_per_entry:
            return  # too large to pin — re-running is cheaper than RAM
        with self._lock:
            if generation is not None and generation != self.generation:
                return  # invalidated since the caller captured the epoch
            self._entries[key] = (time.monotonic(), dict(payload))
            self._entries.move_to_end(key)
            while len(self._entries) > self.max_entries:
                self._entries.popitem(last=False)

    def invalidate_all(self) -> None:
        with self._lock:
            if self._entries:
                self.invalidations += 1
            # the epoch advances even when the table is empty: in-flight
            # queries that started before this invalidation must not
            # insert their (possibly pre-command) results afterwards
            self.generation += 1
            self._entries.clear()

    def __len__(self) -> int:
        with self._lock:
            return len(self._entries)

    def stats(self) -> dict[str, Any]:
        with self._lock:
            return {
                "result_cache_entries": len(self._entries),
                "result_cache_hits": self.hits,
                "result_cache_misses": self.misses,
                "result_cache_invalidations": self.invalidations,
            }
