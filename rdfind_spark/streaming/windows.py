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


def streaming_sessionize_oracle_sql(gap_sec: int = _SESSION_GAP_SEC) -> str:
    """Batch-equivalent SQL for ``stream_sessions`` under one
    ``Trigger.AvailableNow`` micro-batch — which the single-parquet-file
    source guarantees (``maxFilesPerTrigger=1``, one file), so
    processing order equals event-time order and the watermark drops
    nothing.  Two deliberate mirror points:

    * sessions close on a strictly-greater-than µs-precision gap,
      exactly like ``_session_fn`` (the *batch* ``events.sessionize``
      compares whole epoch seconds instead — a different, also-pinned
      semantics);
    * each user's LAST session never closes (it stays in state and
      NoTimeout never flushes it), so the oracle drops the max-numbered
      session per user.
    """
    return f"""WITH e AS (
  SELECT user_id, event_id, epoch_ns(ts) // 1000 AS us FROM events
),
g AS (
  SELECT *, CASE WHEN lag(us) OVER w IS NULL
                  OR us - lag(us) OVER w > {gap_sec * 1_000_000}
            THEN 1 ELSE 0 END AS is_break
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
),
s AS (
  SELECT *, SUM(is_break) OVER (PARTITION BY user_id ORDER BY us, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_no
  FROM g
),
agg AS (
  SELECT user_id, session_no,
         make_timestamp(MIN(us)) AS session_start,
         make_timestamp(MAX(us)) AS session_end,
         COUNT(*) AS n_events
  FROM s GROUP BY 1, 2
)
SELECT user_id, session_start, session_end, n_events FROM agg
WHERE session_no < (SELECT MAX(a2.session_no) FROM agg a2
                    WHERE a2.user_id = agg.user_id)"""


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


def streaming_dedup_deliveries(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """At-least-once delivery dedup — the stateful streaming operator
    every streaming ingest pipeline needs: upstream retries deliver
    the same event more than once (simulated here by unioning the
    stream with itself, so every event arrives exactly twice), and
    ``dropDuplicatesWithinWatermark`` keeps the first arrival per
    delivery fingerprint while EXPIRING its key state once the
    watermark passes the event's time — bounded state on an unbounded
    stream, which plain ``dropDuplicates`` (state grows forever, see
    ``streaming_exact_dedup``) cannot give.

    The dedup key is the full delivery fingerprint (every projected
    column), so whichever physical copy survives, the OUTPUT row is
    identical — that makes the operator oracle-deterministic: under
    the guaranteed single AvailableNow micro-batch the result is
    exactly ``SELECT DISTINCT`` over the projection (the
    batch-equivalent oracle; at steady state the streaming semantics
    additionally re-admit a key after its watermark expires, which no
    batch query expresses — documented, not oracle-checked)."""
    cols = ["event_id", "ts", "user_id", "event_type", "value"]
    doubled = events.select(*cols).unionByName(events.select(*cols))
    return doubled.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        cols
    )


def streaming_dedup_deliveries_oracle_sql() -> str:
    # ts is cast through µs-precision TIMESTAMP: events.parquet has
    # shipped both micros and nanos physical types, and the strict
    # oracle gate flags a raw TIMESTAMP_NS column as a type mismatch
    # (the Spark side is µs via normalize_event_ts)
    return """SELECT DISTINCT event_id, CAST(ts AS TIMESTAMP) AS ts,
       user_id, event_type, value
FROM events"""


def streaming_contamination_guard(
    stream_docs: DataFrame, eval_band_keys: DataFrame
) -> DataFrame:
    """Ingest-time eval-set contamination guard — the streaming twin of
    ``functions.dedup.contamination_fuzzy``'s candidate stage.  A real
    100 TB pipeline filters eval-set leakage AT INGEST, not in a
    nightly batch: each micro-batch's documents are LSH-banded with the
    SAME ``_band_keys`` expression tree the batch dedup uses (pure
    column expressions — minhash is stateless, so it streams as-is),
    then stream-static joined against the eval set's band-key table; a
    band collision flags the document for quarantine before it lands in
    the training corpus.  Output = distinct flagged doc_ids.

    State & scale: the banding carries no streaming state at all.  The
    only state is ``dropDuplicates`` on the OUTPUT doc_id — i.e. the
    quarantine set itself, bounded by contamination incidence
    (result-class), never corpus size.  The static side is distinct
    (band, key) over the EVAL set — eval suites are fixed and orders of
    magnitude smaller than the corpus, and the caller hot-bucket-caps
    them via ``_cold_band_keys`` so a degenerate eval bucket cannot
    inflate the join.  Unlike ``streaming_dedup_deliveries`` (whose
    oracle holds only under a single micro-batch), this output is
    batch-count-INDEPENDENT: dropDuplicates state spans micro-batches,
    so the run yields exactly the distinct collision set however the
    input stream is chopped.

    Recall contract is the batch twin's: a leaked document is flagged
    iff it collides with an eval document in ≥1 of the LSH bands —
    same banding, same recall curve (``dedup.MINHASH_K`` /
    ``dedup.LSH_BANDS``).  Flagged docs are LSH *candidates*; a
    pipeline wanting exact-Jaccard confirmation runs the batch
    verifier over the (small) quarantine set."""
    from rdfind_spark.functions.dedup import _band_keys

    skeys = _band_keys(stream_docs)
    return (
        skeys.join(eval_band_keys, on=["band", "key"])
        .select("doc_id")
        .dropDuplicates(["doc_id"])
    )


def streaming_contamination_oracle_sql(eval_mod: int) -> str:
    """Batch-equivalent oracle: band keys over ALL documents in one
    pass (the oracle has no stream/static split — eval docs are the
    ``doc_id % eval_mod == 0`` rows), eval-side hot buckets dropped
    exactly as ``_cold_band_keys`` does, flagged = distinct TRAIN
    doc_ids sharing a surviving (band, key) with any eval doc.
    Deterministic regardless of micro-batch count (see
    ``streaming_contamination_guard``)."""
    from rdfind_spark.functions.dedup import MAX_BAND_DOCS, _lsh_sql_parts

    prelude, band_union = _lsh_sql_parts()
    return f"""{prelude},
keys AS MATERIALIZED ({band_union}),
ekeys AS (SELECT * FROM keys WHERE doc_id % {eval_mod} = 0),
hotb AS (SELECT band, key FROM ekeys
         GROUP BY band, key HAVING COUNT(*) > {MAX_BAND_DOCS}),
coldk AS (SELECT DISTINCT band, key FROM ekeys e WHERE NOT EXISTS
          (SELECT 1 FROM hotb h WHERE h.band = e.band AND h.key = e.key))
SELECT DISTINCT k.doc_id FROM keys k JOIN coldk USING (band, key)
WHERE k.doc_id % {eval_mod} <> 0"""


def stream_error_click_join(
    events: DataFrame, window_s: int = 600, watermark: str = "1 hour"
) -> DataFrame:
    """Stream-stream interval join: each error event joins the click
    events of the same user within the preceding ``window_s`` seconds —
    the streaming rendering of the banded batch range join
    (``functions.events.range_join_counts``), expressed as Spark's
    native watermarked stream-stream join.

    Both sides carry a watermark and the join condition bounds c_ts in
    [e_ts - window, e_ts], so Spark can expire buffered state: click
    state is held only ``window_s`` + watermark, error state only
    watermark — bounded memory on unbounded streams.  Append-mode
    output, one row per qualifying (error, click) pair."""
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"))
        .withWatermark("c_ts", watermark)
    )
    errors = (
        events.filter(F.col("event_type") == "error")
        .select("event_id", "user_id", F.col("ts").alias("e_ts"))
        .withWatermark("e_ts", watermark)
    )
    return errors.join(
        clicks,
        F.expr(
            f"""c_user = user_id AND c_ts <= e_ts
            AND c_ts > e_ts - INTERVAL {int(window_s)} SECONDS"""
        ),
        "inner",
    ).select("event_id", "user_id", "e_ts", "c_ts")


def daily_purchase_totals_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Per-(day, user) purchase value totals as a watermarked windowed
    aggregation — the streaming upstream of the batch top-k ranking
    (ranking itself is not incremental; run it on the sink table or in
    foreachBatch)."""
    return (
        events.filter(F.col("event_type") == "purchase")
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 day").alias("w"), "user_id")
        .agg(F.round(F.sum("value"), 6).alias("purchase_value"))
        .select(F.col("w.start").alias("day"), "user_id", "purchase_value")
    )


def stream_to_partitioned_parquet(
    sdf: DataFrame,
    path: str,
    checkpoint: str,
    partition_by: str | None = None,
    name: str | None = None,
):
    """foreachBatch sink writing each micro-batch as (optionally
    hive-partitioned) parquet — the pattern for sinks the native file
    writer can't express (dynamic partitioning, merges, external
    stores).  Returns the StreamingQuery; caller awaits/stops."""

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        w = batch_df.write.mode("append")
        if partition_by and partition_by in batch_df.columns:
            w = w.partitionBy(partition_by)
        w.parquet(path)

    writer = sdf.writeStream.foreachBatch(_write).option(
        "checkpointLocation", checkpoint
    )
    if name:
        writer = writer.queryName(name)
    return writer.trigger(availableNow=True).start()


def run_available_now(
    sdf: DataFrame,
    name: str,
    output_mode: str = "complete",
    expect_single_data_batch: bool = False,
):
    """Drive a streaming DataFrame to a memory sink with
    Trigger.AvailableNow and block until done; returns the sink table
    name (query results via ``spark.table(name)``).

    ``expect_single_data_batch`` makes an oracle contract self-checking:
    operators whose batch-SQL oracle is only equivalent when all input
    arrives in ONE micro-batch (``streaming_dedup_deliveries`` — at
    steady state watermark expiry re-admits keys) pass True, and the
    run RAISES if the source delivered data across several batches
    instead of silently diverging from the oracle."""
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if expect_single_data_batch:
        # .get(): StreamingQueryProgress subscripting needs the dict
        # subclassing introduced in PySpark 3.4 — .get() works on every
        # runtime this repo supports and degrades to "no check" rather
        # than TypeError if a runtime ever hands back a plain object;
        # `or 0` also covers a present-but-None numInputRows
        data_batches = sum(
            1 for p in q.recentProgress if (p.get("numInputRows") or 0) > 0
        )
        # > 1 violates the oracle contract; 0 is a legitimately empty
        # source, whose empty result the batch oracle trivially matches
        if data_batches > 1:
            raise RuntimeError(
                f"streaming query {name!r} processed {data_batches} data "
                "micro-batches; the registered batch oracle is only "
                "equivalent under at most one"
            )
    return name


ANOMALY_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("value", DoubleType()),
        StructField("n_seen", LongType()),
        StructField("zscore", DoubleType()),
    ]
)

_ANOM_Z = 3.0
_ANOM_MIN_SEEN = 10


def _anomaly_fn(key, pdfs, state: GroupState):
    """Online per-user outlier detection with Welford running moments
    carried across micro-batches: an event is flagged when its value
    exceeds mean + z·stddev of the events PROCESSED BEFORE it for that
    user (≥ min baseline).  State is three numbers per user — bounded
    regardless of stream length.

    Ordering caveat: "prior" means processing order, not event time.
    Rows are sorted by (ts, event_id) only WITHIN a micro-batch, so a
    late-but-within-watermark event arriving in a later batch is scored
    against state that already includes later-ts events.  That is the
    standard semantics of an online detector (score against what has
    been seen so far); under a single AvailableNow batch — what the
    parity test pins — processing order equals event-time order and the
    result is deterministic.  For strict event-time scoring, buffer
    rows in state until the watermark passes and score in ts order."""
    (user_id,) = key
    if state.exists:
        n, mean, m2 = state.get
    else:
        n, mean, m2 = 0, 0.0, 0.0
    rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
    out = []
    for ev, v in zip(rows["event_id"], rows["value"]):
        v = float(v)
        if n >= _ANOM_MIN_SEEN and m2 > 0.0:
            sd = (m2 / (n - 1)) ** 0.5
            if sd > 0.0 and v > mean + _ANOM_Z * sd:
                out.append([user_id, int(ev), v, n, round((v - mean) / sd, 3)])
        # Welford update AFTER the test: the baseline is prior events only
        n += 1
        d = v - mean
        mean += d / n
        m2 += d * (v - mean)
    state.update((n, mean, m2))
    if out:
        yield pd.DataFrame(
            out, columns=["user_id", "event_id", "value", "n_seen", "zscore"]
        )


def streaming_anomalies_oracle_sql(
    z: float = _ANOM_Z, min_seen: int = _ANOM_MIN_SEEN
) -> str:
    """Batch-equivalent SQL for ``stream_anomalies`` under one
    ``Trigger.AvailableNow`` micro-batch (guaranteed by the
    single-file source): the online Welford baseline over "events
    processed before this one" becomes a prior-prefix window frame
    (``ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING``) ordered by
    the same (ts, event_id) key ``_anomaly_fn`` sorts on.  The
    ``m2 > 0`` state guard is exactly ``sd_prior > 0``."""
    return f"""WITH w AS (
  SELECT user_id, event_id, value,
         COUNT(*) OVER pre AS n_seen,
         AVG(value) OVER pre AS mean_prior,
         stddev_samp(value) OVER pre AS sd_prior
  FROM (SELECT user_id, event_id, value,
               epoch_ns(ts) // 1000 AS us FROM events)
  WINDOW pre AS (PARTITION BY user_id ORDER BY us, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
)
SELECT user_id, event_id, value, n_seen,
       round((value - mean_prior) / sd_prior, 3) AS zscore
FROM w
WHERE n_seen >= {min_seen} AND sd_prior > 0
  AND value > mean_prior + {z} * sd_prior"""


def streaming_anomalies(events: DataFrame) -> DataFrame:
    """Custom stateful operator #2: online z-score outliers via
    ``applyInPandasWithState`` — the streaming counterpart of the batch
    ``functions.events.value_anomalies`` (which scores against the
    user's FULL history; online scoring uses the prior prefix, the
    only causally-valid baseline on an unbounded stream)."""
    return (
        events.withWatermark("ts", "2 hours")
        .groupBy("user_id")
        .applyInPandasWithState(
            _anomaly_fn,
            outputStructType=ANOMALY_OUT_SCHEMA,
            stateStructType="n LONG, mean DOUBLE, m2 DOUBLE",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def session_window_stream(
    events: DataFrame,
    gap_sec: int = _SESSION_GAP_SEC,
    watermark: str = "2 hours",
) -> DataFrame:
    """Gap sessions via Spark's NATIVE ``session_window`` aggregation —
    the JVM-side, state-store-backed twin of the Python
    ``streaming_sessionize`` (``applyInPandasWithState``).  At 100 TB
    this is the variant to run: session merge happens inside the
    incremental hash aggregate (whole-stage codegen, RocksDB-spillable
    state), no Arrow hop, no Python worker per partition.  The
    applyInPandas form stays as the template for session logic the
    built-in operator cannot express (e.g. per-session payload
    assembly).

    Emission semantics (pinned by the oracle): a session window spans
    [first event, last event + gap); append mode emits it once the
    event-time watermark (global max ts − delay) passes its end.  The
    still-open tail — sessions whose end the watermark never passes —
    stays in state, exactly like the stateful sessionizer's per-user
    final session."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", f"{gap_sec} seconds"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


def session_window_stream_oracle_sql(
    gap_sec: int = _SESSION_GAP_SEC, watermark_sec: int = 2 * 3600
) -> str:
    """Batch-equivalent SQL: µs-gap islands, session_end = last event
    + gap (the native window's right edge), emitted iff the end is at
    or before the final watermark (global max ts − delay)."""
    gap_us = gap_sec * 1_000_000
    return f"""WITH e AS (
  SELECT user_id, epoch_us(ts::TIMESTAMP) AS us FROM events
),
wm AS (SELECT MAX(us) - {watermark_sec * 1_000_000} AS w FROM e),
g AS (
  SELECT user_id, us,
         CASE WHEN lag(us) OVER (PARTITION BY user_id ORDER BY us) IS NULL
                OR us - lag(us) OVER (PARTITION BY user_id ORDER BY us)
                   > {gap_us}
              THEN 1 ELSE 0 END AS ns
  FROM e
),
s AS (
  SELECT user_id, us,
         SUM(ns) OVER (PARTITION BY user_id ORDER BY us
                       ROWS UNBOUNDED PRECEDING) AS sid
  FROM g
)
SELECT user_id,
       make_timestamp(MIN(us)) AS session_start,
       make_timestamp(MAX(us) + {gap_us}) AS session_end,
       COUNT(*) AS n_events
FROM s CROSS JOIN wm
GROUP BY user_id, sid, wm.w
HAVING MAX(us) + {gap_us} <= wm.w"""
