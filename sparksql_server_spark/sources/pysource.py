"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource``) — a
deterministic synthetic-events generator, batch and streaming.

Reference parity: the reference's clients fabricated their own inputs
(WordCount text, `people.txt` fixtures — SimpleAppClient/examples/…);
the modern engine-side equivalent is a first-class pluggable source.
This one exists for scale/soak testing the server without touching
disk: N rows across P partitions, generated EXECUTOR-SIDE (each
partition derives its rows from (seed, partition_id) — the driver
ships only the tiny partition descriptors, nothing is materialized
driver-side, and a 10^12-row load is as cheap to plan as a 10^3-row
one).

Determinism: a splitmix64-style mix of (seed, global row index) drives
every column, so two reads with the same options are identical — the
property the tests pin. No wall clock, no RNG state.

Usage::

    spark.dataSource.register(SyntheticEventsDataSource)
    df = (spark.read.format("synthetic_events")
          .option("n_rows", 100000).option("n_partitions", 8)
          .option("seed", 7).load())
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_EVENT_TYPES = ("view", "click", "purchase", "error", "signup")

_SCHEMA = StructType(
    [
        StructField("event_id", LongType(), False),
        StructField("user_id", LongType(), False),
        StructField("event_type", StringType(), False),
        StructField("value", DoubleType(), False),
    ]
)

_MASK = (1 << 64) - 1


def _mix(seed: int, i: int) -> int:
    """splitmix64 finalizer over (seed, index) — deterministic,
    stateless, cheap; quality is ample for synthetic load data."""
    z = (seed * 0x9E3779B97F4A7C15 + i * 0xBF58476D1CE4E5B9) & _MASK
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & _MASK
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & _MASK
    return z ^ (z >> 31)


def _row(seed: int, i: int):
    h = _mix(seed, i)
    return (
        i,
        h % 1000,  # user_id
        _EVENT_TYPES[(h >> 10) % len(_EVENT_TYPES)],
        ((h >> 16) % 100_000) / 1000.0,  # value in [0, 100)
    )


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int, seed: int) -> None:
        self.start = start
        self.end = end
        self.seed = seed


class _SyntheticReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.n_rows = int(options.get("n_rows", 1000))
        self.n_partitions = max(1, int(options.get("n_partitions", 4)))
        self.seed = int(options.get("seed", 42))

    def partitions(self):
        # contiguous row-index ranges: partition count is the read
        # parallelism, descriptors are 3 ints each — the whole plan
        # costs O(P) driver memory regardless of n_rows
        if self.n_rows <= 0:
            # one empty partition: n_rows=0 is a legal empty source,
            # not a range() crash (ADVICE r4 low)
            return [_RangePartition(0, 0, self.seed)]
        step = -(-self.n_rows // self.n_partitions)
        return [
            _RangePartition(lo, min(lo + step, self.n_rows), self.seed)
            for lo in range(0, self.n_rows, step)
        ]

    def read(self, partition: _RangePartition):
        for i in range(partition.start, partition.end):
            yield _row(partition.seed, i)


class _SyntheticStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch form: each batch appends ``rows_per_batch`` rows,
    offset = next global row index (exactly-once replay: a batch is
    re-derived from its (start, end) offsets alone)."""

    def __init__(self, options) -> None:
        self.rows_per_batch = int(options.get("rows_per_batch", 100))
        self.seed = int(options.get("seed", 42))

    def initialOffset(self):
        return {"index": 0}

    def read(self, start):
        lo = start["index"]
        hi = lo + self.rows_per_batch
        return iter([_row(self.seed, i) for i in range(lo, hi)]), {"index": hi}

    def readBetweenOffsets(self, start, end):
        return iter([_row(self.seed, i) for i in range(start["index"], end["index"])])


class SyntheticEventsDataSource(DataSource):
    """``format("synthetic_events")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> StructType:
        return _SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return _SyntheticReader(self.options)

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return _SyntheticStreamReader(self.options)


# --------------------------------------------------------------------------
# custom sink: JSONL directory writer with the task-commit protocol


class _JsonlCommit(WriterCommitMessage):
    def __init__(self, tmp_file: str, n_rows: int) -> None:
        self.tmp_file = tmp_file
        self.n_rows = n_rows


class _JsonlWriter(DataSourceWriter):
    """Per-task: write a part file into this JOB's staging dir
    (``<path>/_tmp-<jobid>``) and report it. Driver commit: move
    reported parts into place + ``_SUCCESS``; abort: drop the staging
    dir. A failed/straggler task's orphan temp file is never promoted
    — the two-phase commit that makes a sink exactly-once per job at
    any task count (speculative re-runs included: only the SUCCESSFUL
    attempt's message reaches commit).

    The staging dir carries a per-job id (Hadoop's committer uses
    ``_temporary/<jobId>`` for the same reason): the gateway executes
    jobs on a thread pool, and two concurrent writes to ONE path with
    a SHARED staging dir would destroy each other — job A's commit
    rmtree'd the shared dir while job B's parts were still staged in
    it, failing B's promotion. Each job now stages, promotes, and
    cleans only its own directory; concurrent appends interleave their
    part files safely (uuid part names cannot collide)."""

    def __init__(self, options, overwrite: bool) -> None:
        import uuid

        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_dir sink requires a path")
        self.overwrite = overwrite
        # set driver-side so every pickled executor copy stages into
        # the same per-job directory
        self.job_id = uuid.uuid4().hex
        self._promoted = 0
        # True once commit() starts destroying the previous job's
        # output (overwrite cleanup) — from that point the directory
        # is no longer the previously-committed dataset even if zero
        # new parts were promoted yet
        self._mutated = False

    def _staging(self) -> str:
        import os

        return os.path.join(self.path, f"_tmp-{self.job_id}")

    def write(self, iterator) -> _JsonlCommit:
        import json as _json
        import os
        import uuid

        tmp_dir = self._staging()
        os.makedirs(tmp_dir, exist_ok=True)
        tmp_file = os.path.join(tmp_dir, f"part-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(tmp_file, "w") as fh:
            for row in iterator:
                fh.write(_json.dumps(row.asDict(), default=str) + "\n")
                n += 1
        return _JsonlCommit(tmp_file, n)

    def commit(self, messages) -> None:
        import os
        import shutil

        os.makedirs(self.path, exist_ok=True)
        if self.overwrite:
            # mode("overwrite") replaces the directory's contents:
            # clear pre-existing part files BEFORE promoting the new
            # ones (which still live in staging here), so stale parts
            # never mix with this job's output (ADVICE r4 low)
            self._mutated = True
            for name in os.listdir(self.path):
                if name.startswith("part-") and name.endswith(".jsonl"):
                    os.remove(os.path.join(self.path, name))
        for m in messages:
            final = os.path.join(self.path, os.path.basename(m.tmp_file))
            os.replace(m.tmp_file, final)
            self._promoted += 1
        shutil.rmtree(self._staging(), ignore_errors=True)
        with open(os.path.join(self.path, "_SUCCESS"), "w"):
            pass

    def abort(self, messages) -> None:
        import os
        import shutil

        shutil.rmtree(self._staging(), ignore_errors=True)
        # drop the marker ONLY if this job already changed the
        # directory: promoted parts (a commit that failed midway left
        # it mixed) OR began the overwrite deletion of the previous
        # job's parts (the committed data _SUCCESS vouched for is
        # gone, ADVICE r8 low). A job that failed before either leaves
        # the previous successful job's output — and its _SUCCESS —
        # fully intact; unmarking that valid dataset would make
        # _SUCCESS-gated consumers skip committed data.
        if self._promoted or self._mutated:
            try:
                os.remove(os.path.join(self.path, "_SUCCESS"))
            except FileNotFoundError:
                pass


class JsonlDirDataSource(DataSource):
    """``format("jsonl_dir")`` — local-filesystem JSONL sink
    demonstrating the Python writer commit protocol. (Local paths
    only — a cluster deployment would target shared storage; the
    commit structure is identical.)"""

    @classmethod
    def name(cls) -> str:
        return "jsonl_dir"

    def schema(self) -> StructType:
        return _SCHEMA  # sink: schema comes from the written DataFrame

    def writer(self, schema, overwrite: bool) -> DataSourceWriter:
        return _JsonlWriter(self.options, overwrite)
