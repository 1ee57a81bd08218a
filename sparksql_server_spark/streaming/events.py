"""Structured Streaming over the events table.

The reference is batch-only (SURVEY.md §1.3 — its only stream is the
incoming-job queue), so this module is north-star surface, not parity:
the same event-time analytics the batch operators compute
(operators/events_windows.py), expressed as streams with watermarks,
plus a custom stateful operator via applyInPandasWithState.

Scale notes: file-source streams feed from a directory listing —
at 100 TB that becomes a real bus (Kafka etc.) with identical query
code; state is partitioned by the grouping key and checkpointed, so
the stateful operator scales with the key cardinality, not the input.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events parquet (file-source; glob on the file).

    events.parquet carries TIMESTAMP(NANOS); how the runtime surfaces
    that (int64 nanos vs native TIMESTAMP_NTZ) is version-dependent, so
    take the stream schema from a metadata-only batch read of the same
    file and normalize ts exactly as catalog.table does.
    """
    import os

    from ..catalog import _normalize_event_ts

    batch_schema = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema
    # the file-source stream wants a directory: feed it sf_dir with a
    # glob so only the events file matches
    raw = (
        spark.readStream.schema(batch_schema)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    return _normalize_event_ts(raw)


def tumbling_counts(events: DataFrame, window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling event-time aggregation — the streaming twin
    of operators/events_windows.events_tumbling_hour."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value")
    )


def sliding_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked sliding-window counts: each event lands in
    window/slide overlapping windows. State size scales with
    (keys × windows-in-watermark), independent of input volume."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )


def session_counts(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Session windows (gap-based, per user): the streaming twin of the
    batch sessionization operator (operators/events_windows.
    events_sessionize). Sessions close when the watermark passes the
    gap, so state is bounded by active sessions only."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            "total_value",
        )
    )


def dedup_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Exactly-once event stream from an at-least-once source:
    watermarked drop-duplicates on the event id. State holds only ids
    within the watermark horizon — the streaming form of the exact
    dedup operator (operators/dedup.dedup_exact)."""
    return events.withWatermark("ts", watermark).dropDuplicates(["event_id", "ts"])


def purchase_click_stream_join(
    events: DataFrame, max_gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Stream-stream inner join: purchases matched to clicks of the
    same user within a bounded look-back window.

    Both sides carry watermarks and the join condition bounds the
    event-time gap, so each side's state store holds only rows inside
    the watermark+gap horizon — the requirement for unbounded
    stream-stream joins to run with finite state.
    """
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    return purchases.join(
        clicks,
        F.expr(
            f"""p_user = c_user
            AND click_ts <= purchase_ts
            AND click_ts >= purchase_ts - INTERVAL {max_gap}"""
        ),
    ).select("purchase_id", "click_id", "p_user", "purchase_ts", "click_ts")


# --- custom stateful operator: running per-user counters ----------------

_STATE_SCHEMA = "n_events LONG, total_value DOUBLE"
_OUTPUT_SCHEMA = "user_id LONG, n_events LONG, total_value DOUBLE"


def _track_user(
    key: tuple[Any, ...], batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """applyInPandasWithState update fn: accumulate per-user totals
    across micro-batches; emits the running value each batch."""
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "total_value": [total]})


def user_totals_stateful(events: DataFrame) -> DataFrame:
    """Custom stateful streaming operator (reference has none; SURVEY.md
    §7 north star): exact running totals per user via
    applyInPandasWithState, state checkpointed per key."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _track_user,
            outputStructType=_OUTPUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_to_memory_sink(
    spark: SparkSession, streaming_df: DataFrame, name: str, output_mode: str = "update"
) -> DataFrame:
    """Drive a streaming query over the available files to completion
    (memory sink; test/dev harness)."""
    q = (
        streaming_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {name}")


# --- transformWithState: multi-variable per-user profile ----------------

_TWS_OUTPUT_SCHEMA = (
    "user_id LONG, n_events LONG, n_types LONG, total_value DOUBLE"
)


def user_profile_tws(events: DataFrame) -> DataFrame:
    """Custom stateful streaming operator on the transformWithState
    API (Spark 4 arbitrary-state): per-user running event count and
    value total in a ValueState plus distinct-event-type tracking in a
    ListState — TWO typed state variables per key, which
    applyInPandasWithState's single state tuple cannot express without
    manual encoding; state is keyed, checkpointed, and TTL-able via
    ttlDurationMs. The processor class is defined inside this function
    so importing the module never requires the streaming runtime.
    Batch equivalence: groupBy(user).agg(count, sum,
    count_distinct(event_type)).

    NOTE this sets ``spark.sql.streaming.stateStore.providerClass`` to
    RocksDB on the SESSION (the API requires it; provider choice is
    read at query start). That is a visible side effect for later
    streaming queries in the same session — benign, since every
    stateful operator here also runs on RocksDB, and it is the
    provider a production deployment wants anyway (state on local
    disk, not executor heap).

    Scale: state partitions by user_id and lives in the state store —
    memory scales with keys, not input; the ListState holds at most
    the 5 distinct event types.

    Environment gate: the transformWithState Python worker speaks a
    protobuf protocol to the JVM state server
    (pyspark/sql/streaming/proto/StateMessage_pb2), so it needs the
    ``protobuf`` package, which PyPI pyspark does not depend on and
    this offline environment does not carry — verified 2026-08-13:
    ``import google.protobuf`` fails and the streaming worker dies
    with STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE. On any
    machine with protobuf installed this operator runs as written
    (the applyInPandasWithState twin above covers the stateful
    surface in-environment).
    """
    try:
        import google.protobuf  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "transformWithStateInPandas needs the protobuf package for its "
            "state-server protocol; install protobuf to use this operator "
            "(user_totals_stateful covers per-key state without it)"
        ) from exc

    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    events.sparkSession.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )

    class Proc(StatefulProcessor):
        def init(self, handle) -> None:
            self._counts = handle.getValueState(
                "counts", "n_events LONG, total_value DOUBLE"
            )
            self._types = handle.getListState("types", "t STRING")

        def handleInputRows(self, key, rows, timerValues):
            n, total = (
                self._counts.get() if self._counts.exists() else (0, 0.0)
            )
            seen = {t for (t,) in self._types.get()} if self._types.exists() else set()
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
                for t in pdf["event_type"].unique():
                    if t not in seen:
                        seen.add(t)
                        self._types.appendValue((t,))
            self._counts.update((n, float(total)))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "n_types": [len(seen)],
                    "total_value": [total],
                }
            )

        def close(self) -> None:
            pass

    return (
        events.select("user_id", "event_type", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=Proc(),
            outputStructType=_TWS_OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )


def ohlc_bars_stream(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked OHLC bars — the streaming twin of the batch
    events_ohlc_bars operator (operators/events_analytics.py).

    The batch form takes open/close via row_number from either end of
    the bar; streaming state cannot hold rankings, so open/close become
    min_by/max_by over the (ts, event_id) struct — the same
    deterministic tiebreak, expressed as an incrementally-mergeable
    aggregate (each state update keeps one (key, value) extremum per
    bar — O(1) state per bar, the property that lets bars finalize as
    the watermark passes).
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.expr("min_by(value, struct(ts, event_id))").cast("double").alias("open"),
            F.max("value").cast("double").alias("high"),
            F.min("value").cast("double").alias("low"),
            F.expr("max_by(value, struct(ts, event_id))").cast("double").alias("close"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("volume"),
            F.count("*").alias("n_events"),
        )
        .select(
            F.col("w.start").alias("bar_start"),
            "event_type",
            "open",
            "high",
            "low",
            "close",
            "volume",
            "n_events",
        )
    )
