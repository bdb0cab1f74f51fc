"""Streaming event analytics: file-source stream + watermarked windows
+ a custom stateful sessionizer.

Batch/stream parity: ``hourly_counts_stream`` computes exactly
``functions.events.hourly_event_counts`` (the batch form the DuckDB
oracle verifies); the streaming test drives it with
``Trigger.AvailableNow`` and asserts equality against the batch result.
At scale the same query runs continuously: the watermark bounds state,
and Spark's incremental hash aggregation keeps one row of state per
(window, event_type).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet, ts normalized to
    TIMESTAMP exactly like the batch path (the stream schema is pinned
    from a batch read of the same files, so both physical ts types —
    micros and nanos-as-long — work).  The file source requires a
    *directory*; a single events.parquet file is staged into a temp dir
    via symlink."""
    import os
    import tempfile

    from rdfind_spark.functions.events import normalize_event_ts

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    src = f"{sf_dir}/events.parquet"
    if os.path.isfile(src):
        d = tempfile.mkdtemp(prefix="events_stream_")
        os.symlink(os.path.abspath(src), os.path.join(d, "events.parquet"))
        src = d
    schema = spark.read.parquet(src).schema
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    return normalize_event_ts(raw)


def hourly_counts_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window counts — the streaming rendering of
    ``hourly_event_counts`` (late rows beyond the watermark dropped)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("value_sum"),
        )
        .select(F.col("w.start").alias("hour"), "event_type", "n_events", "value_sum")
    )


SESSION_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
    ]
)

_SESSION_GAP_SEC = 30 * 60


def _session_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Stateful per-user session assembly: carry (start, end, count)
    across micro-batches, emit a session when the event-time gap
    exceeds the threshold, flush on timeout."""
    (user_id,) = key
    if state.hasTimedOut:
        if state.exists:
            start, end, n = state.get
            yield pd.DataFrame(
                [[user_id, pd.Timestamp(start, unit="us"), pd.Timestamp(end, unit="us"), n]],
                columns=["user_id", "session_start", "session_end", "n_events"],
            )
            state.remove()
        return
    rows = pd.concat(list(pdfs)).sort_values("ts")
    out = []
    if state.exists:
        start_us, end_us, n = state.get
    else:
        start_us = end_us = None
        n = 0
    for ts in rows["ts"]:
        ts_us = int(ts.value // 1000)  # pandas ns → µs
        if start_us is None:
            start_us, end_us, n = ts_us, ts_us, 1
        elif ts_us - end_us > _SESSION_GAP_SEC * 1_000_000:
            out.append([user_id, pd.Timestamp(start_us, unit="us"),
                        pd.Timestamp(end_us, unit="us"), n])
            start_us, end_us, n = ts_us, ts_us, 1
        else:
            end_us, n = ts_us, n + 1
    state.update((start_us, end_us, n))
    try:
        state.setTimeoutDuration(60_000)  # no-op unless timeouts enabled
    except Exception:
        pass  # NoTimeout mode: flush-on-idle disabled
    if out:
        yield pd.DataFrame(
            out, columns=["user_id", "session_start", "session_end", "n_events"]
        )


def streaming_sessionize(events: DataFrame, flush_on_idle: bool = False) -> DataFrame:
    """Custom stateful operator: gap-based sessions via
    ``applyInPandasWithState`` (the Spark-native form of a Flink keyed
    process function).  Sessions are emitted when closed by a gap; the
    open session per user lives in state.  ``flush_on_idle`` adds a
    processing-time timeout that also emits idle open sessions — leave
    it off under Trigger.AvailableNow (pending timeouts keep scheduling
    batches, so the query would never terminate)."""
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if flush_on_idle
        else GroupStateTimeout.NoTimeout
    )
    return (
        events.withWatermark("ts", "2 hours")
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn,
            outputStructType=SESSION_OUT_SCHEMA,
            stateStructType="start LONG, end LONG, n LONG",
            outputMode="append",
            timeoutConf=timeout,
        )
    )


DOCS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)


def stream_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the documents parquet (same single-file
    symlink staging as stream_events)."""
    import os
    import tempfile

    src = f"{sf_dir}/documents.parquet"
    if os.path.isfile(src):
        d = tempfile.mkdtemp(prefix="docs_stream_")
        os.symlink(os.path.abspath(src), os.path.join(d, "documents.parquet"))
        src = d
    return (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )


def streaming_exact_dedup(documents: DataFrame) -> DataFrame:
    """Streaming exact dedup: first-seen document per normalized-text
    md5 passes through, later duplicates are dropped across
    micro-batches (state = one row per distinct hash).  The streaming
    rendering of ``functions.dedup.exact_dedup_map`` — at scale, pair
    with a TTL watermark (``dropDuplicatesWithinWatermark``) if the
    corpus is unbounded; exact global dedup requires unbounded state by
    definition."""
    from rdfind_spark.functions.dedup import normalized_text

    hashed = documents.withColumn("text_hash", F.md5(normalized_text()))
    return hashed.dropDuplicates(["text_hash"]).select(
        "doc_id", "text_hash", "source"
    )


def run_available_now(sdf: DataFrame, name: str, output_mode: str = "complete"):
    """Drive a streaming DataFrame to a memory sink with
    Trigger.AvailableNow and block until done; returns the sink table
    name (query results via ``spark.table(name)``)."""
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return name
