"""SparkSession factory — the engine's single shared session.

The reference boots one SparkContext + SQLContext and serves every
client from it (``sparksql-server/src/main/scala/.../SparkSQLServer.scala:30-81``).
We do the same with one SparkSession, configured for:

- AQE on (runtime coalescing, skew-join handling, dynamic broadcast) —
  the scale path for 100 TB inputs.
- Shuffle partitions sized to local cores for tests; on a real cluster
  AQE's coalescing makes the initial number a ceiling, not a target.
- Arrow enabled so the Pandas-UDF operators (dedup, multimodal) get
  vectorized batch transfer.
- UTC session timezone so results hash-match the DuckDB oracle.
- FAIR scheduling so the work-sharing scheduler can run a batch of
  queries in parallel pools (reference: FIFOStrategy.scala:107-111
  spawns raw threads; FAIR pools are the principled version).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def _default_driver_mem() -> str:
    """Local-mode driver heap: ``SPARK_GRAFT_DRIVER_MEM`` if set, else
    60% of ``MemAvailable`` capped at 32g and floored at 2g (round 12,
    ADVICE r11 low). The ×100 scale rig needs 32g on the 128 GiB
    bench box (which this formula yields there); a fixed 32g default
    would overcommit smaller machines — the JVM then gets OOM-killed
    mid-query instead of spilling. On an unreadable /proc/meminfo the
    pre-round-11 8g default applies."""
    env = os.environ.get("SPARK_GRAFT_DRIVER_MEM")
    if env:
        return env
    try:
        with open("/proc/meminfo") as fh:
            for line in fh:
                if line.startswith("MemAvailable:"):
                    avail_gib = int(line.split()[1]) / (1024 * 1024)
                    return f"{max(2, min(32, int(avail_gib * 0.6)))}g"
    except OSError:
        pass
    return "8g"

# FAIR pool definitions (round 9, VERDICT r8 ask #7): per-job pools are
# created on demand with weight 1; deadline-carrying jobs run in
# ``deadline_urgent`` (weight 8, FIFO inside so the pre-scheduler's
# earliest-deadline-first submission order is honored within the pool).
# Weight 8 vs 1 means N slack jobs still hold N/(N+8) of the cluster —
# bounded share for everyone, acceleration for deadlines, starvation
# for no one. Weights are only readable from an allocation FILE, so the
# session factory materializes this XML and points
# spark.scheduler.allocation.file at it (context-creation-time conf).
_FAIR_POOLS_XML = """<?xml version="1.0"?>
<allocations>
  <pool name="deadline_urgent">
    <schedulingMode>FIFO</schedulingMode>
    <weight>8</weight>
    <minShare>2</minShare>
  </pool>
  <pool name="default">
    <schedulingMode>FIFO</schedulingMode>
    <weight>1</weight>
    <minShare>0</minShare>
  </pool>
</allocations>
"""


def _fair_pools_file() -> str:
    """Write (once) and return the FAIR allocation file path."""
    import tempfile

    path = os.path.join(
        tempfile.gettempdir(), f"sparkgraft_fair_pools_{os.getuid()}.xml"
    )
    try:
        # rewrite unconditionally (a stale file from an older version
        # must not survive upgrades) but ATOMICALLY: another process's
        # JVM may be reading the path at its own context creation, and
        # a torn truncate-write would hand it malformed XML
        tmp = f"{path}.{os.getpid()}.tmp"
        with open(tmp, "w") as fh:
            fh.write(_FAIR_POOLS_XML)
        os.replace(tmp, path)
    except OSError:
        return ""  # unwritable tmp: pools fall back to defaults (weight 1)
    return path


def get_session(
    app_name: str = "sparksql_server_spark",
    cpus: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    ``local[cpus]`` in this environment; on a cluster the master URL
    comes from spark-submit and everything else carries over.
    """
    cpus = cpus or DEFAULT_CPUS
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        # -- parallelism / shuffle sizing --------------------------------
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.files.maxPartitionBytes", "134217728")  # 128 MiB
        # -- adaptive execution: the 100 TB posture ----------------------
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # -- python/arrow interop ----------------------------------------
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # -- determinism for the oracle ----------------------------------
        .config("spark.sql.session.timeZone", "UTC")
        # -- work-sharing scheduler: FAIR pools --------------------------
        .config("spark.scheduler.mode", "FAIR")
        # track cancelled job groups so cancelJobGroupAndFutureJobs can
        # fail a query's not-yet-submitted jobs (off by default)
        .config("spark.scheduler.numCancelledJobGroupsToTrack", "1000")
        # -- quiet local runs --------------------------------------------
        .config("spark.ui.enabled", "false")
        # local mode: the driver JVM IS every executor, so this heap is
        # shared by all `cpus` concurrent tasks' execution memory AND
        # every broadcast build. 8g starved 32 tasks at the ×100 scale
        # rig (HashAggregate "unable to acquire 262144 bytes", GCLocker
        # retry storms, broadcast-build OOM on a 128 GiB box — round
        # 11); 32g leaves the OS page cache ~3/4 of the box. On a real
        # cluster this maps to per-executor memory, not driver. Round
        # 12 (ADVICE r11): the default sizes from MemAvailable — a
        # fixed 32g overcommits smaller boxes, turning graceful spills
        # into OOM kills; SPARK_GRAFT_DRIVER_MEM still overrides.
        .config("spark.driver.memory", _default_driver_mem())
    )
    pools = _fair_pools_file()
    if pools:  # unwritable tmp: pools fall back to on-demand weight 1
        builder = builder.config("spark.scheduler.allocation.file", pools)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
