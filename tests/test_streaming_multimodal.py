"""Streaming parity and multimodal-plumbing tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rdfind_spark.functions import multimodal
from rdfind_spark.functions.events import hourly_event_counts
from rdfind_spark.queries import _events
from rdfind_spark.streaming import (
    hourly_counts_stream,
    run_available_now,
    stream_events,
    streaming_sessionize,
)


def test_stream_hourly_counts_match_batch(spark, sf_dir):
    batch = {
        (r["hour"], r["event_type"]): (r["n_events"], r["value_sum"])
        for r in hourly_event_counts(_events(spark, sf_dir)).collect()
    }
    sdf = hourly_counts_stream(stream_events(spark, sf_dir))
    run_available_now(sdf, "hourly_stream_test", output_mode="complete")
    stream = {
        (r["hour"], r["event_type"]): (r["n_events"], r["value_sum"])
        for r in spark.table("hourly_stream_test").collect()
    }
    assert stream == batch
    assert len(batch) > 0


def test_streaming_sessionize_runs_and_emits_closed_sessions(spark, sf_dir):
    """The stateful sessionizer must run end-to-end and emit only
    *closed* sessions (open sessions stay in state); every emitted
    session must also exist in the batch sessionization."""
    from rdfind_spark.functions.events import sessionize

    sdf = streaming_sessionize(stream_events(spark, sf_dir))
    run_available_now(sdf, "sessions_stream_test", output_mode="append")
    got = spark.table("sessions_stream_test").collect()
    batch = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in sessionize(_events(spark, sf_dir)).collect()
    }
    for r in got:
        key = (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        assert key in batch, f"streamed session not in batch result: {key}"


def test_streaming_sessionize_exact_equality_deterministic(spark, tmp_path):
    """Pin the ``applyInPandasWithState`` sessionizer the same way the
    batch operators are pinned: a deterministic micro-batch source
    (3 time-sliced parquet files, one per trigger) whose last slice
    carries a far-future sentinel per user, so EVERY real session is
    closed by a gap and the streamed output must equal the batch
    sessionization of the non-sentinel events as full frames — same
    rows, same instants, same counts, nothing extra."""
    import datetime as dt

    import pandas as pd

    from rdfind_spark.functions.events import sessionize

    t0 = dt.datetime(2024, 3, 1, 12, 0, 0)
    m = dt.timedelta(minutes=1)
    # (user_id, minutes-after-t0): sessions = u1 [0,10,20] then [60];
    # u2 [5] then [100]; u3 [25, 45] spans the slice boundary so the
    # open session must be carried in state across micro-batches.
    events = [
        (1, 0), (1, 10), (1, 20), (1, 60),
        (2, 5), (2, 100),
        (3, 25), (3, 45),
    ]
    sentinels = [(u, 24 * 60) for u in (1, 2, 3)]
    slices = [
        [e for e in events if e[1] < 40],
        [e for e in events if e[1] >= 40],
        sentinels,
    ]
    src = tmp_path / "stream_src"
    src.mkdir()
    for i, rows in enumerate(slices):
        pdf = pd.DataFrame(
            {
                "user_id": [u for u, _ in rows],
                "ts": [pd.Timestamp(t0 + mins * m) for _, mins in rows],
            }
        )
        pdf["ts"] = pdf["ts"].astype("datetime64[us]")
        pdf.to_parquet(src / f"batch_{i:03d}.parquet", index=False)
    sdf = streaming_sessionize(
        spark.readStream.schema("user_id LONG, ts TIMESTAMP")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    run_available_now(sdf, "sessions_exact_test", output_mode="append")
    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.table("sessions_exact_test").collect()
    }
    batch_events = spark.createDataFrame(
        [(u, t0 + mins * m, i) for i, (u, mins) in enumerate(events)],
        "user_id LONG, ts TIMESTAMP, event_id LONG",
    )
    batch = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in sessionize(batch_events).collect()
    }
    assert batch == {
        (1, t0, t0 + 20 * m, 3),
        (1, t0 + 60 * m, t0 + 60 * m, 1),
        (2, t0 + 5 * m, t0 + 5 * m, 1),
        (2, t0 + 100 * m, t0 + 100 * m, 1),
        (3, t0 + 25 * m, t0 + 45 * m, 2),
    }
    assert got == batch


def test_attach_blobs_schema_and_payload(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    blobs = multimodal.attach_blobs(docs)
    assert dict(blobs.dtypes)["payload"] == "binary"
    row = blobs.limit(1).collect()[0]
    assert isinstance(row["payload"], bytearray | bytes)
    assert 1 <= row["meta"]["width"] <= 1920
    assert row["meta"]["format"] == "fake/raw"


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"\x00")


def test_extract_features_batch_shape(spark, sf_dir):
    import hashlib

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    feats = multimodal.extract_features(multimodal.attach_blobs(docs))
    rows = feats.orderBy("doc_id").limit(3).collect()
    assert [len(r["features"]) for r in rows] == [multimodal.N_FEATURES] * 3
    doc0 = docs.filter("doc_id = 0").collect()[0]["text"]
    expected = [ord(c) for c in hashlib.md5(doc0.encode()).hexdigest()[:8]]
    assert rows[0]["features"] == expected
    assert rows[0]["payload_len"] == len(doc0.encode())


def test_streaming_exact_dedup_matches_batch(spark, sf_dir):
    from pyspark.sql import functions as F

    from rdfind_spark.functions.dedup import normalized_text
    from rdfind_spark.streaming import (
        run_available_now,
        stream_documents,
        streaming_exact_dedup,
    )

    sdf = streaming_exact_dedup(stream_documents(spark, sf_dir))
    name = run_available_now(sdf, "dedup_stream", output_mode="append")
    got = spark.table(name)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_distinct = (
        docs.select(F.md5(normalized_text()).alias("h")).distinct().count()
    )
    assert got.count() == n_distinct
    assert got.select("text_hash").distinct().count() == n_distinct


def test_streaming_dedup_deliveries_matches_batch_distinct(spark, sf_dir):
    """Every event is delivered twice (self-union inside the operator);
    dropDuplicatesWithinWatermark must emit each full-row fingerprint
    exactly once — under the single AvailableNow micro-batch, exactly
    the batch SELECT DISTINCT over the projection, row for row."""
    from pyspark.sql import functions as F

    from rdfind_spark.functions.events import normalize_event_ts
    from rdfind_spark.streaming import (
        run_available_now,
        stream_events,
        streaming_dedup_deliveries,
    )

    sdf = streaming_dedup_deliveries(stream_events(spark, sf_dir))
    name = run_available_now(sdf, "dedup_deliveries", output_mode="append")
    got = spark.table(name)
    cols = ["event_id", "ts", "user_id", "event_type", "value"]
    batch = (
        normalize_event_ts(spark.read.parquet(f"{sf_dir}/events.parquet"))
        .select(*cols)
        .distinct()
    )
    assert got.count() == batch.count()
    assert got.exceptAll(batch).count() == 0
    assert batch.exceptAll(got).count() == 0


def test_resize_images_plumbing(spark, sf_dir):
    from rdfind_spark.functions.multimodal import attach_blobs, resize_images

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20)
    out = resize_images(attach_blobs(docs), 16, 8).collect()
    assert len(out) == 20
    assert all(len(r.payload) == 16 * 8 for r in out)
    assert all(r.meta.width == 16 and r.meta.height == 8 for r in out)


def test_resize_images_really_resizes_netpbm(spark):
    """NetPBM payloads go through the REAL decode → nearest-neighbor →
    re-encode loop: a 4×4 quadrant image downsampled to 2×2 must keep
    exactly the floor-sampled source pixels (rows/cols 0 and 2), and
    the output payload must itself decode as valid NetPBM."""
    import numpy as np

    from rdfind_spark.functions.multimodal import decode_image, resize_images

    src = np.zeros((4, 4, 3), dtype=np.uint8)
    src[:2, :2] = [255, 0, 0]
    src[:2, 2:] = [0, 255, 0]
    src[2:, :2] = [0, 0, 255]
    src[2:, 2:] = [7, 8, 9]
    payload = b"P6\n4 4\n255\n" + src.tobytes()
    blobs = spark.createDataFrame(
        [(1, bytearray(payload))], "doc_id LONG, payload BINARY"
    )
    rows = resize_images(blobs, 2, 2).collect()
    assert len(rows) == 1 and rows[0].meta.width == 2
    got = decode_image(bytes(rows[0].payload))
    assert got.shape == (2, 2, 3)
    assert got.tolist() == src[[0, 2]][:, [0, 2]].tolist()
    assert got[0, 0].tolist() == [255, 0, 0]
    assert got[1, 1].tolist() == [7, 8, 9]


def test_sample_frames_pixel_exact(spark):
    """The sampler must find REAL frame boundaries in a concatenated
    NetPBM stream — mixed geometry (P6 2×2, P5 3×1, P6 2×2) so a
    fixed-chunk fake cannot pass — and each emitted frame must decode
    bit-exactly to its source pixels."""
    import numpy as np

    from rdfind_spark.functions.multimodal import (
        decode_image,
        encode_netpbm,
        sample_frames,
    )

    f0 = np.arange(12, dtype=np.uint8).reshape(2, 2, 3)
    f1 = np.array([[[200], [201], [202]]], dtype=np.uint8)  # P5 3×1
    f2 = (np.arange(12, dtype=np.uint8) + 100).reshape(2, 2, 3)
    video = b"".join(encode_netpbm(a) for a in (f0, f1, f2))
    videos = spark.createDataFrame(
        [(1, bytearray(video))], "doc_id LONG, payload BINARY"
    )
    rows = sorted(sample_frames(videos, every_n=2).collect(), key=lambda r: r.frame_idx)
    assert [r.frame_idx for r in rows] == [0, 2]
    assert decode_image(bytes(rows[0].frame)).tolist() == f0.tolist()
    assert decode_image(bytes(rows[1].frame)).tolist() == f2.tolist()


def test_sample_frames_skips_undecodable_and_counts(spark, sf_dir):
    """attach_videos containers yield exactly ceil(VIDEO_FRAMES /
    every_n) frames per doc with stride-visible indices; a non-NetPBM
    payload yields zero frames (documented: run image_stats on the
    container for error accounting)."""
    import collections

    from rdfind_spark.functions.multimodal import (
        VIDEO_FRAMES,
        attach_videos,
        sample_frames,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20)
    rows = sample_frames(attach_videos(docs), every_n=2).collect()
    per_doc = collections.Counter(r.doc_id for r in rows)
    assert len(per_doc) == 20
    expected = len(range(0, VIDEO_FRAMES, 2))
    assert all(n == expected for n in per_doc.values())
    assert all(r.frame_idx % 2 == 0 for r in rows)

    junk = spark.createDataFrame(
        [(99, bytearray(b"\xff\xd8not-a-netpbm-stream"))],
        "doc_id LONG, payload BINARY",
    )
    assert sample_frames(junk, every_n=1).count() == 0


def test_video_frame_stats_matches_arithmetic(spark, sf_dir):
    """video_frame_stats' decoded means equal the attach_videos pixel
    arithmetic for every sampled (doc, frame) — the unit twin of the
    registered oracle."""
    from rdfind_spark.functions.multimodal import (
        VIDEO_FRAMES,
        VIDEO_H,
        VIDEO_W,
        video_frame_stats,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(10)
    rows = video_frame_stats(docs, every_n=2).collect()
    assert len(rows) == 10 * len(range(0, VIDEO_FRAMES, 2))
    for r in rows:
        assert (r.width, r.height, r.channels) == (VIDEO_W, VIDEO_H, 1)
        assert r.mean_pixel == 32 + (r.doc_id * 37 + r.frame_idx * 17) % 95


def test_stream_error_click_join_matches_batch(spark, sf_dir):
    """Stream-stream interval join equals the plain batch join pair set."""
    from rdfind_spark.functions.events import normalize_event_ts
    from rdfind_spark.streaming import (
        run_available_now,
        stream_error_click_join,
        stream_events,
    )

    name = run_available_now(
        stream_error_click_join(stream_events(spark, sf_dir)),
        "t_scj",
        output_mode="append",
    )
    got = {
        (r.event_id, r.e_ts, r.c_ts)
        for r in spark.table(name).collect()
    }
    ev = normalize_event_ts(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", F.col("ts").alias("e_ts")
    )
    exp = {
        (r.event_id, r.e_ts, r.c_ts)
        for r in errors.join(
            clicks,
            F.expr(
                "c_user = user_id AND c_ts <= e_ts "
                "AND c_ts > e_ts - INTERVAL 600 SECONDS"
            ),
        ).collect()
    }
    assert got == exp and len(exp) > 0


def test_daily_purchase_totals_stream_matches_batch(spark, sf_dir):
    from rdfind_spark.functions.events import normalize_event_ts
    from rdfind_spark.streaming import (
        daily_purchase_totals_stream,
        run_available_now,
        stream_events,
    )

    name = run_available_now(
        daily_purchase_totals_stream(stream_events(spark, sf_dir)), "t_dpt"
    )
    got = {
        (r.day, r.user_id): r.purchase_value
        for r in spark.table(name).collect()
    }
    ev = normalize_event_ts(spark.read.parquet(f"{sf_dir}/events.parquet"))
    exp = {
        (r.day, r.user_id): r.purchase_value
        for r in ev.filter(F.col("event_type") == "purchase")
        .groupBy(
            F.date_trunc("day", F.col("ts")).alias("day"), "user_id"
        )
        .agg(F.round(F.sum("value"), 6).alias("purchase_value"))
        .collect()
    }
    assert got == exp and len(exp) > 0


def test_stream_to_partitioned_parquet_sink(spark, sf_dir, tmp_path):
    from rdfind_spark.streaming import stream_documents, stream_to_partitioned_parquet

    out = str(tmp_path / "sinkout")
    ckpt = str(tmp_path / "ckpt")
    q = stream_to_partitioned_parquet(
        stream_documents(spark, sf_dir), out, ckpt, partition_by="source"
    )
    q.awaitTermination()
    back = spark.read.parquet(out)
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert back.count() == n_docs
    assert "source" in back.columns


def test_streaming_anomalies_match_python_online_reference(spark, tmp_path):
    """Pin the stateful online anomaly detector with a deterministic
    2-slice micro-batch source: flagged events must equal a pure-Python
    Welford prefix-scoring reference over the globally ordered stream
    (state carries the running moments across the slice boundary)."""
    import datetime as dt

    import pandas as pd

    from rdfind_spark.streaming import run_available_now, streaming_anomalies

    t0 = dt.datetime(2024, 4, 1, 0, 0, 0)
    vals_u1 = [1.0, 1.1, 0.9, 1.0, 1.2, 0.8, 1.0, 1.1, 0.9, 1.0,  # baseline 10
               1.05, 50.0, 1.0, 60.0]                               # two spikes
    vals_u2 = [5.0, 100.0]  # too few events for a baseline
    events = [(1, i, v) for i, v in enumerate(vals_u1)]
    events += [(2, 100 + i, v) for i, v in enumerate(vals_u2)]
    # slice at minute 8 — u1's state must carry across the boundary
    rows = [
        (u, eid, t0 + dt.timedelta(minutes=eid % 100), v) for u, eid, v in events
    ]
    slices = [
        [r for r in rows if r[2] < t0 + dt.timedelta(minutes=8)],
        [r for r in rows if r[2] >= t0 + dt.timedelta(minutes=8)],
    ]
    src = tmp_path / "anom_src"
    src.mkdir()
    for i, sl in enumerate(slices):
        pdf = pd.DataFrame(
            {
                "user_id": [u for u, _, _, _ in sl],
                "event_id": [e for _, e, _, _ in sl],
                "ts": [pd.Timestamp(t) for _, _, t, _ in sl],
                "value": [v for _, _, _, v in sl],
            }
        )
        pdf["ts"] = pdf["ts"].astype("datetime64[us]")
        pdf.to_parquet(src / f"batch_{i:03d}.parquet", index=False)
    sdf = streaming_anomalies(
        spark.readStream.schema("user_id LONG, event_id LONG, ts TIMESTAMP, value DOUBLE")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    run_available_now(sdf, "anomalies_exact_test", output_mode="append")
    got = {
        (r["user_id"], r["event_id"], r["n_seen"], r["zscore"])
        for r in spark.table("anomalies_exact_test").collect()
    }

    # pure-Python online reference (Welford, prior-prefix baseline)
    ref = set()
    state = {}
    for u, eid, v in sorted(events, key=lambda x: (x[0], x[1])):
        n, mean, m2 = state.get(u, (0, 0.0, 0.0))
        if n >= 10 and m2 > 0.0:
            sd = (m2 / (n - 1)) ** 0.5
            if sd > 0.0 and v > mean + 3.0 * sd:
                ref.add((u, eid, n, round((v - mean) / sd, 3)))
        n += 1
        d = v - mean
        mean += d / n
        m2 += d * (v - mean)
        state[u] = (n, mean, m2)
    assert got == ref
    assert any(eid == 11 for _, eid, _, _ in got)  # the 50.0 spike flagged
    assert not any(u == 2 for u, _, _, _ in got)  # no baseline, no flags


def _ppm(w, h, pixels):
    """Binary P6 with a comment line — exercises the header tokenizer."""
    return b"P6\n# test image\n%d %d\n255\n" % (w, h) + bytes(pixels)


def test_decode_image_p6_and_p5_roundtrip():
    import numpy as np

    from rdfind_spark.functions.multimodal import decode_image

    px = [10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120]
    arr = decode_image(_ppm(2, 2, px))  # 2x2 RGB
    assert arr.shape == (2, 2, 3) and arr.dtype == np.uint8
    assert arr[0, 0].tolist() == [10, 20, 30]
    assert arr[1, 1].tolist() == [100, 110, 120]
    gray = decode_image(b"P5\n3 1\n255\n" + bytes([5, 6, 7]))
    assert gray.shape == (1, 3, 1) and gray[0, 2, 0] == 7
    import pytest

    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG\r\n\x1a\n....")
    with pytest.raises(ValueError):
        decode_image(b"P6\n2 2\n255\n\x01\x02")  # truncated
    with pytest.raises(ValueError):
        # zero dimensions must be ValueError (the resize_images fallback
        # catches it) — not a downstream IndexError that kills the task
        decode_image(b"P6\n0 0\n255\n")


def test_image_stats_decodes_and_flags_errors(spark):
    from pyspark.sql import Row

    from rdfind_spark.functions.multimodal import image_stats

    good = _ppm(2, 1, [0, 0, 0, 30, 60, 90])  # mean = 180 // 6 = 30
    blobs = spark.createDataFrame(
        [
            Row(doc_id=1, payload=bytearray(good)),
            Row(doc_id=2, payload=bytearray(b"\xff\xd8\xffJPEG-ish")),
        ]
    )
    rows = {r.doc_id: r for r in image_stats(blobs).collect()}
    assert (
        rows[1].width,
        rows[1].height,
        rows[1].channels,
        rows[1].mean_pixel,
        rows[1].decode_error,
    ) == (2, 1, 3, 30, 0)
    assert rows[2].decode_error == 1 and rows[2].width is None


def test_streaming_dedup_deliveries_state_spans_micro_batches(spark, tmp_path):
    """The cross-batch behavior the single-AvailableNow-batch oracle
    cannot see, pinned: with two files and maxFilesPerTrigger=1 the
    stream runs two micro-batches; a duplicate delivery arriving in
    batch 2 of an event from batch 1 must be dropped by RETAINED key
    state (its event time sits above the watermark), and a re-delivery
    whose event time has fallen below the watermark is dropped as late
    data — so no key is ever emitted twice, while genuinely new events
    in batch 2 still pass."""
    import os
    import time
    from datetime import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    from rdfind_spark.streaming import run_available_now, streaming_dedup_deliveries

    def t(h):
        return datetime(2026, 1, 1, h)

    def write(path, rows):
        ids, tss, users, types, vals = zip(*rows)
        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array(ids, pa.int64()),
                    "ts": pa.array(tss, pa.timestamp("us")),
                    "user_id": pa.array(users, pa.int64()),
                    "event_type": pa.array(types, pa.string()),
                    "value": pa.array(vals, pa.float64()),
                }
            ),
            path,
        )

    d = str(tmp_path / "evsrc")
    os.makedirs(d)
    # batch 1: two events, 10 hours apart -> post-batch watermark
    # (2h delay) lands at 08:00, between them
    write(f"{d}/b1.parquet", [(1, t(0), 1, "view", 1.0), (2, t(10), 1, "view", 2.0)])
    time.sleep(1.1)  # distinct mtime => deterministic batch order
    # batch 2: re-delivery of 2 (ts 10:00 >= watermark: dropped by
    # RETAINED state), re-delivery of 1 (ts 00:00 < watermark: dropped
    # as late), new event 3 (passes)
    write(
        f"{d}/b2.parquet",
        [(2, t(10), 1, "view", 2.0), (1, t(0), 1, "view", 1.0), (3, t(11), 1, "view", 3.0)],
    )

    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
        ]
    )
    sdf = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(d)
    )
    name = run_available_now(
        streaming_dedup_deliveries(sdf, watermark="2 hours"),
        "dedup_ttl_batches",
        output_mode="append",
    )
    got = sorted(r.event_id for r in spark.table(name).collect())
    assert got == [1, 2, 3]


def test_stream_contamination_matches_batch_across_micro_batches(spark, sf_dir, tmp_path):
    """Batch parity for the ingest-time contamination guard, under
    MULTIPLE micro-batches: the corpus is split into 3 parquet files
    streamed one per trigger, and the flagged set must equal the batch
    band-probe reference exactly — pinning the docstring's claim that
    the output is batch-count-independent (dropDuplicates state spans
    micro-batches)."""
    from rdfind_spark.functions.dedup import (
        CONTAM_FUZZY_EVAL_MOD,
        _band_keys,
        _cold_band_keys,
    )
    from rdfind_spark.streaming import streaming_contamination_guard
    from rdfind_spark.streaming.windows import DOCS_SCHEMA

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    src = str(tmp_path / "docs_sliced")
    docs.withColumn("slice", F.col("doc_id") % 5).write.partitionBy(
        "slice"
    ).parquet(src)

    eval_docs = docs.filter(F.col("doc_id") % CONTAM_FUZZY_EVAL_MOD == 0)
    eval_keys = _cold_band_keys(eval_docs).select("band", "key").distinct()

    def run_guard(qname, files_per_trigger):
        reader = spark.readStream.schema(DOCS_SCHEMA).option(
            "recursiveFileLookup", "true"
        )
        if files_per_trigger:
            reader = reader.option("maxFilesPerTrigger", files_per_trigger)
        stream = reader.parquet(src).filter(
            F.col("doc_id") % CONTAM_FUZZY_EVAL_MOD != 0
        )
        q = (
            streaming_contamination_guard(stream, eval_keys)
            .writeStream.format("memory")
            .queryName(qname)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        batches = sum(
            1 for p in q.recentProgress if (p.get("numInputRows") or 0) > 0
        )
        return {r.doc_id for r in spark.table(qname).collect()}, batches

    # soak: one file per trigger over 5 slices
    got_multi, n_multi = run_guard("contam_stream_multi", 1)
    assert n_multi >= 5, "soak must actually exercise >= 5 micro-batches"
    # control: all files in one trigger
    got_single, n_single = run_guard("contam_stream_single", None)
    assert n_single == 1

    # batch-count independence, measured: 5-batch run == 1-batch run
    assert got_multi == got_single

    ref = {
        r.doc_id
        for r in _band_keys(
            docs.filter(F.col("doc_id") % CONTAM_FUZZY_EVAL_MOD != 0)
        )
        .join(eval_keys, on=["band", "key"])
        .select("doc_id")
        .distinct()
        .collect()
    }
    assert got_multi == ref
    assert len(ref) > 0


def test_run_available_now_single_batch_contract_raises(spark, sf_dir, tmp_path):
    """expect_single_data_batch must RAISE when the source delivers
    data across several micro-batches (the self-checking oracle
    contract of stream_dedup_deliveries), and pass when it doesn't."""
    import pytest as _pytest

    from rdfind_spark.streaming.windows import DOCS_SCHEMA

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(30)
    src = str(tmp_path / "docs_sliced2")
    docs.withColumn("slice", F.col("doc_id") % 2).write.partitionBy(
        "slice"
    ).parquet(src)
    multi = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
        .select("doc_id")
    )
    with _pytest.raises(RuntimeError, match="micro-batches"):
        run_available_now(
            multi, "single_batch_violation", output_mode="append",
            expect_single_data_batch=True,
        )


def test_parse_wav_real_chunk_walker():
    """The WAV decoder must be a real RIFF chunk walker: chunks in any
    order, unknown chunks skipped, ODD chunk sizes padded to word
    boundaries, 8- and 16-bit PCM decoded, non-PCM refused."""
    import struct

    import pytest as _pytest

    from rdfind_spark.functions import multimodal as m

    # the pipeline's own header carries an odd-size LIST chunk
    payload = m._wav_header(1000) + bytes([40] * 500 + [60] * 500)
    assert m.parse_wav(payload) == (8000, 1, 8, 1000, 50_000)

    # 16-bit signed PCM, chunks reordered (data before fmt)
    fmt16 = struct.pack("<IHHIIHH", 16, 1, 1, 44_100, 88_200, 2, 16)
    data = struct.pack("<4h", -1, 2, -3, 4)
    p16 = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(data) + 8 + len(fmt16))
        + b"WAVE"
        + b"data" + struct.pack("<I", len(data)) + data
        + b"fmt " + fmt16
    )
    assert m.parse_wav(p16) == (44_100, 1, 16, 4, 2)

    # IEEE-float WAV (format 3) is a documented env limitation
    fmtf = struct.pack("<IHHIIHH", 16, 3, 1, 8000, 32_000, 4, 32)
    pf = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmtf) + 8) + b"WAVE"
        + b"fmt " + fmtf + b"data" + struct.pack("<I", 0)
    )
    with _pytest.raises(NotImplementedError):
        m.parse_wav(pf)
    with _pytest.raises(ValueError):
        m.parse_wav(b"not a wav at all")


def test_audio_clip_stats_end_to_end(spark, sf_dir):
    from rdfind_spark.functions import multimodal as m

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(7)
    rows = {r.doc_id: r for r in m.audio_clip_stats(docs).collect()}
    assert len(rows) == 7
    for doc_id, r in rows.items():
        a = 32 + (doc_id * 13) % 95
        b = 32 + (doc_id * 29) % 95
        assert (r.sample_rate, r.n_channels, r.bits_per_sample) == (8000, 1, 8)
        assert r.n_samples == 2 * m.AUDIO_SEG
        assert r.amp_sum == m.AUDIO_SEG * (a + b)


def test_parse_bmp_real_format_walker():
    """Hand-built BMPs through the real parser: bottom-up (positive
    height, the default) vs top-down (negative height) must decode to
    the same logical image; rows carry the 4-byte stride padding; BGR
    in-file channel order; compressed / non-24-bit payloads raise the
    documented NotImplementedError."""
    import struct

    import numpy as np
    import pytest

    from rdfind_spark.functions import multimodal as m

    w, h = 3, 2
    stride = (w * 3 + 3) // 4 * 4  # 9 -> 12
    top = bytes(range(10, 10 + w * 3)) + b"\x07" * (stride - w * 3)
    bot = bytes(range(50, 50 + w * 3)) + b"\x07" * (stride - w * 3)

    def hdr(height):
        return (
            b"BM" + struct.pack("<IHHI", 54 + stride * h, 0, 0, 54)
            + struct.pack(
                "<IiiHHIIiiII", 40, w, height, 1, 24, 0, stride * h,
                0, 0, 0, 0,
            )
        )

    # bottom-up: LAST stored row is the logical top
    up = m.parse_bmp(hdr(h) + bot + top)
    # top-down: stored order IS logical order
    down = m.parse_bmp(hdr(-h) + top + bot)
    assert up == down
    sums = np.frombuffer(top[: w * 3] + bot[: w * 3], np.uint8).reshape(
        -1, 3
    ).sum(axis=0)
    assert up == (w, h, 24, int(sums[0]), int(sums[1]), int(sums[2]))
    # stride pad bytes (0x07 above) must NOT leak into the sums
    with pytest.raises(NotImplementedError):
        m.parse_bmp(
            hdr(h)[:30] + struct.pack("<I", 1) + hdr(h)[34:] + top + bot
        )  # compression = 1 (RLE8)
    with pytest.raises(ValueError):
        m.parse_bmp(b"definitely not a bmp")


def test_bmp_image_stats_end_to_end(spark, sf_dir):
    """attach_bmp -> parse_bmp over real parquet docs must equal the
    per-channel formula sums computed independently in Python."""
    from rdfind_spark.functions import multimodal as m

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20)
    rows = {r.doc_id: r for r in m.bmp_image_stats(docs).collect()}
    assert len(rows) == 20
    for doc_id, r in rows.items():
        assert (r.width, r.height, r.bits_per_pixel) == (m.BMP_W, m.BMP_H, 24)
        for name, mul, ax, ay in m._BMP_CHANNELS:
            want = sum(
                32 + (doc_id * mul + ax * x + ay * y) % 95
                for x in range(m.BMP_W)
                for y in range(m.BMP_H)
            )
            assert r[f"sum_{name}"] == want, (doc_id, name)


def test_session_window_stream_state_spans_micro_batches(spark, sf_dir, tmp_path):
    """The NATIVE session_window aggregation must produce a batch-count-
    independent result: events sliced into 5 CHRONOLOGICAL chunks (one
    file each, written in order so the file source replays them oldest-
    first and nothing is watermark-late) streamed one file per trigger
    == the single-trigger run, and sessions that SPAN chunk boundaries
    must merge across micro-batches (asserted: some emitted session
    crosses a chunk edge)."""
    from pyspark.sql import Window

    from rdfind_spark.functions.events import normalize_event_ts
    from rdfind_spark.streaming.windows import session_window_stream

    events = normalize_event_ts(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    )
    w = Window.orderBy("ts", "event_id")
    bucketed = events.withColumn("bucket", F.ntile(5).over(w))
    src = str(tmp_path / "events_chrono")
    edges = []
    for i in range(1, 6):
        chunk = bucketed.filter(F.col("bucket") == i).drop("bucket")
        chunk.coalesce(1).write.parquet(f"{src}/b{i}")
        edges.append(chunk.agg(F.max("ts")).collect()[0][0])

    schema = spark.read.parquet(f"{src}/b1").schema

    def run(qname, files_per_trigger):
        reader = spark.readStream.schema(schema).option(
            "recursiveFileLookup", "true"
        )
        if files_per_trigger:
            reader = reader.option("maxFilesPerTrigger", files_per_trigger)
        q = (
            session_window_stream(reader.parquet(src))
            .writeStream.format("memory")
            .queryName(qname)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        batches = sum(
            1 for p in q.recentProgress if (p.get("numInputRows") or 0) > 0
        )
        rows = {
            (r.user_id, r.session_start, r.session_end, r.n_events)
            for r in spark.table(qname).collect()
        }
        return rows, batches

    got_multi, n_multi = run("sw_multi", 1)
    assert n_multi >= 5, "soak must exercise >= 5 micro-batches"
    got_single, n_single = run("sw_single", None)
    assert n_single == 1
    assert got_multi == got_single
    assert got_multi, "some sessions must emit"
    # at least one emitted session spans a chunk boundary: its start is
    # at or before an edge and its end (minus the gap padding) after it
    crossing = [
        (u, s, e)
        for (u, s, e, n) in got_multi
        for edge in edges[:-1]
        if s <= edge and e > edge
    ]
    assert crossing, "no session crossed a chunk boundary - fixture too weak"


def _lzw_encode_model(indices, min_code_size, clear_every=None):
    """Independent REAL (compressing) LZW encoder for the property
    test: builds the dictionary like any classic GIF writer, while the
    emitted code width tracks a SIMULATED decoder state (next_code /
    early-change growth), which is the spec's synchronization rule.
    Shares no code with multimodal._lzw_decode."""
    clear = 1 << min_code_size
    eoi = clear + 1
    bits = []
    state = {"w": min_code_size + 1, "n": eoi + 1, "first": True}

    def emit(code):
        for i in range(state["w"]):
            bits.append((code >> i) & 1)
        if code == clear:
            state.update(w=min_code_size + 1, n=eoi + 1, first=True)
        elif code != eoi:
            if state["first"]:
                state["first"] = False
            elif state["n"] < 4096:
                state["n"] += 1
                if state["n"] == (1 << state["w"]) and state["w"] < 12:
                    state["w"] += 1

    emit(clear)
    table = {(i,): i for i in range(clear)}
    next_e = eoi + 1
    buf = ()
    emitted = 0
    for s in indices:
        cand = buf + (int(s),)
        if cand in table:
            buf = cand
            continue
        emit(table[buf])
        emitted += 1
        if next_e < 4096:
            table[cand] = next_e
            next_e += 1
        buf = (int(s),)
        if clear_every and emitted % clear_every == 0:
            emit(clear)
            table = {(i,): i for i in range(clear)}
            next_e = eoi + 1
    if buf:
        emit(table[buf])
    emit(eoi)
    out = bytearray((len(bits) + 7) // 8)
    for pos, bit in enumerate(bits):
        out[pos >> 3] |= bit << (pos & 7)
    return bytes(out)


def test_lzw_decode_matches_independent_compressing_encoder():
    """The GIF decoder is a FULL LZW (dictionary growth, KwKwK,
    early-change widths, clear resets), not a subset matched to the
    engine's own literal writer: streams from an independent
    compressing encoder — including the KwKwK shape (aaaa...),
    mid-stream clears, and multi-width growth — must decode back to
    the input exactly."""
    import random

    from rdfind_spark.functions.multimodal import _lzw_decode

    rng = random.Random(7)
    cases = [
        ([0] * 50, 2, None),                       # pure KwKwK runs
        ([0, 1] * 40, 2, None),                    # alternation
        ([i % 7 for i in range(500)], 3, None),    # cyclic, width growth
        ([rng.randrange(8) for _ in range(2000)], 3, None),
        ([rng.randrange(4) for _ in range(800)], 2, 37),   # clears
        ([rng.randrange(200) for _ in range(3000)], 8, None),
        ([3], 2, None),                            # single pixel
    ]
    for indices, b, ce in cases:
        data = _lzw_encode_model(indices, b, clear_every=ce)
        assert _lzw_decode(data, b) == indices, (b, ce, len(indices))


def test_parse_gif_decodes_compressed_payload_and_skips_extensions():
    """A GIF whose pixel data went through the REAL compressing
    encoder (not the engine's literal writer) must parse to the same
    channel sums; an 89a graphic-control extension before the image
    descriptor is walked over; interlace/local-table/garbage raise."""
    import struct

    import pytest as _pytest

    from rdfind_spark.functions import multimodal as m

    pal = m._gif_palette(8)
    idx = [(5 * k + 3) % 8 for k in range(m.GIF_W * m.GIF_H)]
    lzw = _lzw_encode_model(idx, 3)
    lsd = struct.pack("<HH", m.GIF_W, m.GIF_H) + bytes([0xF2, 0, 0])
    desc = (
        b"\x2c"
        + struct.pack("<HHHH", 0, 0, m.GIF_W, m.GIF_H)
        + b"\x00"
    )
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"  # 89a graphic control
    blocks = bytes([3]) + b"".join(
        bytes([len(lzw[i : i + 255])]) + lzw[i : i + 255]
        for i in range(0, len(lzw), 255)
    ) + b"\x00"
    payload = b"GIF89a" + lsd + pal + gce + desc + blocks + b"\x3b"
    w, h, n, sr, sg, sb, rm = m.parse_gif(payload)
    assert (w, h, n) == (m.GIF_W, m.GIF_H, 8)
    for got, (nme, mult, add) in zip((sr, sg, sb), m._GIF_CHANNELS):
        assert got == sum((mult * i + add) % 256 for i in idx), nme
    want_rm = sum(
        (k // m.GIF_W + 1) * i for k, i in enumerate(idx)
    )
    assert rm == want_rm

    local_table = payload.replace(desc, desc[:-1] + b"\x80", 1)
    with _pytest.raises(NotImplementedError):
        m.parse_gif(local_table)
    with _pytest.raises(ValueError):
        m.parse_gif(b"JFIF not a gif")


def test_parse_gif_reassembles_interlaced_rows():
    """REAL 4-pass interlace support: an interlaced encoding of the
    same image must parse to the IDENTICAL stats tuple — including
    row_moment, which is row-order sensitive by construction, so a
    missing or wrong reorder (reading file order as logical order)
    provably changes the answer."""
    from rdfind_spark.functions import multimodal as m

    pal = m._gif_palette(8)
    # rows deliberately non-uniform so any row permutation moves the
    # moment: row y is constant value (y * 3 + 1) % 8
    idx = [
        (y * 3 + 1) % 8 for y in range(m.GIF_H) for _ in range(m.GIF_W)
    ]
    plain = m.parse_gif(m.encode_gif(idx, pal, m.GIF_W, m.GIF_H))
    inter = m.parse_gif(
        m.encode_gif(idx, pal, m.GIF_W, m.GIF_H, interlace=True)
    )
    assert inter == plain
    # the guard that makes the test meaningful: decoding the
    # interlaced FILE order as if it were logical order must differ
    file_order_idx = [
        idx[y * m.GIF_W + x]
        for y in m._interlace_order(m.GIF_H)
        for x in range(m.GIF_W)
    ]
    naive = m.parse_gif(m.encode_gif(file_order_idx, pal, m.GIF_W, m.GIF_H))
    assert naive[6] != plain[6], "fixture failed to exercise the reorder"


def test_gif_image_stats_end_to_end_with_duckdb_oracle(spark, sf_dir):
    """attach_gif -> REAL LZW decode over real parquet docs must equal
    both the Python formula sums and the DuckDB rendering of
    gif_image_stats_sql — the same three-way check a registry entry
    gets (planned round-11 registration; COVERAGE.md round-11 plan)."""
    import duckdb

    from rdfind_spark.functions import multimodal as m

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(25)
    got = {
        r.doc_id: (
            r.width, r.height, r.n_colors,
            r.sum_r, r.sum_g, r.sum_b, r.row_moment,
        )
        for r in m.gif_image_stats(docs).collect()
    }
    assert len(got) == 25
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM read_parquet('{sf_dir}/documents.parquet') "
        "LIMIT 25"
    )
    want = {
        r[0]: tuple(r[1:])
        for r in con.execute(m.gif_image_stats_sql()).fetchall()
    }
    assert got == want


def test_png_filters_hand_checked_and_round_trip():
    """PNG filter reconstruction pinned two ways: (1) a hand-computed
    Sub/Up/Average/Paeth fixture — the filtered bytes are written out
    by hand from the spec and wrapped in a valid PNG, so the decoder's
    arithmetic is checked against the SPEC, not against the engine's
    own encoder; (2) encoder round-trips across all five filter types,
    gray/truecolor/palette color types."""
    import struct
    import zlib

    from rdfind_spark.functions import multimodal as m

    # (1) hand fixture: 3x2 grayscale, logical pixels
    #     row0: 10 20 30 / row1: 40 60 90
    # filter Sub on row0:   10, 20-10=10, 30-20=10
    # filter Paeth on row1: a,b,c for i=0 -> (0,10,0) paeth=10 -> 40-10=30
    #   i=1: a=40,b=20,c=10 p=50 pa=10 pb=30 pc=40 -> a -> 60-40=20
    #   i=2: a=60,b=30,c=20 p=70 pa=10 pb=40 pc=50 -> a -> 90-60=30
    raw = bytes([1, 10, 10, 10]) + bytes([4, 30, 20, 30])

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    payload = (
        m.PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 2, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    w, h, depth, color, sr, sg, sb, rm = m.parse_png(payload)
    assert (w, h, depth, color) == (3, 2, 8, 0)
    assert sr == sg == sb == 10 + 20 + 30 + 40 + 60 + 90
    assert rm == 1 * (10 + 20 + 30) + 2 * (40 + 60 + 90)

    # a corrupted CRC must be loud, not wrong
    broken = bytearray(payload)
    broken[-5] ^= 0xFF  # inside IEND's CRC
    import pytest as _pytest

    with _pytest.raises(ValueError, match="CRC"):
        m.parse_png(bytes(broken))

    # (2) round-trip across filter types and color types
    px_rgb = bytes((7 * i + 3) % 256 for i in range(3 * 5 * 4))
    for f in range(5):
        got = m.parse_png(m.encode_png(px_rgb, 5, 4, filter_type=f))
        assert got == m.parse_png(m.encode_png(px_rgb, 5, 4, filter_type=0))
    pal = bytes((i * 37) % 256 for i in range(3 * 8))
    px_idx = bytes(i % 8 for i in range(5 * 4))
    gp = m.parse_png(
        m.encode_png(px_idx, 5, 4, color_type=3, palette=pal, filter_type=2)
    )
    want = [0, 0, 0]
    for i in px_idx:
        for c in range(3):
            want[c] += pal[3 * i + c]
    assert list(gp[4:7]) == want

    # loud limits
    adam7 = payload.replace(
        chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 2, 8, 0, 0, 0, 0)),
        chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 2, 8, 0, 0, 0, 1)),
    )
    with _pytest.raises(NotImplementedError, match="Adam7"):
        m.parse_png(adam7)
    with _pytest.raises(ValueError):
        m.parse_png(b"not a png at all")


def test_png_image_stats_end_to_end_with_duckdb_oracle(spark, sf_dir):
    """attach_png (row filter cycling through all five spec types by
    doc_id) -> zlib inflate + reconstruction over real parquet docs
    must equal the DuckDB rendering of png_image_stats_sql — the same
    three-way check a registry entry gets (planned round-11
    registration)."""
    import duckdb

    from rdfind_spark.functions import multimodal as m

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(25)
    got = {
        r.doc_id: (
            r.width, r.height, r.bit_depth, r.color_type,
            r.sum_r, r.sum_g, r.sum_b, r.row_moment,
        )
        for r in m.png_image_stats(docs).collect()
    }
    assert len(got) == 25
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM read_parquet('{sf_dir}/documents.parquet') LIMIT 25"
    )
    want = {
        r[0]: tuple(r[1:])
        for r in con.execute(m.png_image_stats_sql()).fetchall()
    }
    assert got == want


def test_g711_tables_match_audioop_and_wav_decode():
    """The G.711 mu-law/A-law expansion tables must match CPython's C
    implementation (audioop) byte-for-byte across all 256 codes — an
    independent model, not our own formulas re-run — and a real WAV
    whose fmt chunk declares format 7 (mu-law) / 6 (A-law) must decode
    through parse_wav with amp_sum over the EXPANDED linear samples."""
    import struct

    audioop = pytest.importorskip("audioop")  # removed in py3.13
    from rdfind_spark.functions import multimodal as m

    mt, at = m._mulaw_table(), m._alaw_table()
    for b in range(256):
        assert mt[b] == struct.unpack("<h", audioop.ulaw2lin(bytes([b]), 2))[0]
        assert at[b] == struct.unpack("<h", audioop.alaw2lin(bytes([b]), 2))[0]

    def wav(fmt_code, data):
        fmt = struct.pack("<IHHIIHH", 16, fmt_code, 1, 8000, 8000, 1, 8)
        body = (
            b"WAVE" + b"fmt " + fmt
            + b"data" + struct.pack("<I", len(data)) + data
        )
        return b"RIFF" + struct.pack("<I", len(body)) + body

    data = bytes(range(0, 256, 8))  # 32 codes
    rate, ch, bits, n, amp = m.parse_wav(wav(7, data))
    assert (rate, ch, bits, n) == (8000, 1, 8, 32)
    assert amp == sum(int(mt[b]) for b in data)
    rate, ch, bits, n, amp = m.parse_wav(wav(6, data))
    assert amp == sum(int(at[b]) for b in data)
    # other compressed formats stay loud
    with pytest.raises(NotImplementedError):
        m.parse_wav(wav(85, data))  # MP3-in-WAV


def test_parse_gif_png_truncation_sweep_is_loud_not_fatal():
    """Round-10 advice: arbitrary corpus bytes must never escape the
    DECODE_ERRORS contract.  Every strict prefix of a valid GIF and a
    valid PNG — which lands the walkers mid-header, mid-sub-block,
    mid-chunk, mid-CRC — must raise ValueError/NotImplementedError
    (the parsers' own documented contract), never IndexError or
    struct.error."""
    import struct

    from rdfind_spark.functions import multimodal as m

    pal = m._gif_palette(8)
    idx = [(5 * k + 3) % 8 for k in range(m.GIF_W * m.GIF_H)]
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    gif = m.encode_gif(idx, pal, m.GIF_W, m.GIF_H)
    # splice an extension block in so the sub-block walk is also swept
    gif = gif[: 13 + len(pal)] + gce + gif[13 + len(pal):]
    png = m.encode_png(
        bytes((7 * i + 3) % 256 for i in range(3 * m.PNG_W * m.PNG_H)),
        m.PNG_W, m.PNG_H, color_type=2, filter_type=4,
    )
    for name, parse, payload in (
        ("gif", m.parse_gif, gif),
        ("png", m.parse_png, png),
    ):
        whole = parse(payload)  # the untruncated fixture is valid
        for cut in range(len(payload)):
            try:
                got = parse(payload[:cut])
            except (ValueError, NotImplementedError):
                continue
            except Exception as exc:  # noqa: BLE001 - the point
                raise AssertionError(
                    f"{name} prefix {cut}: {type(exc).__name__}: {exc}"
                ) from exc
            # a prefix may parse only when the cut removed nothing the
            # decode needs (e.g. the GIF trailer byte) — then the
            # result must be byte-for-byte the full answer, never a
            # silently-wrong partial one
            assert got == whole, f"{name} prefix {cut} parsed wrong"
    # struct.error itself stays inside the walkers' safety net too
    assert struct.error in m.DECODE_ERRORS and IndexError in m.DECODE_ERRORS


def test_gif_png_stats_skip_malformed_payloads(spark):
    """The *_stats operators' per-row skip contract over a corpus with
    damaged blobs: good rows decode, truncated/garbage rows are
    dropped, the job never fails (round-10 advice)."""
    from rdfind_spark.functions import multimodal as m

    pal = m._gif_palette(8)
    idx = [(5 * k + 3) % 8 for k in range(m.GIF_W * m.GIF_H)]
    gif = m.encode_gif(idx, pal, m.GIF_W, m.GIF_H)
    png = m.encode_png(
        bytes((7 * i + 3) % 256 for i in range(3 * m.PNG_W * m.PNG_H)),
        m.PNG_W, m.PNG_H, color_type=2, filter_type=2,
    )
    rows = [
        (1, bytearray(gif)),
        (2, bytearray(gif[: len(gif) // 2])),   # truncated mid-stream
        (3, bytearray(b"GIF89a\x07")),            # dies in the header
        (4, bytearray(b"not an image at all")),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, payload BINARY")
    assert [r.doc_id for r in m.gif_stats(df).collect()] == [1]
    rows = [
        (1, bytearray(png)),
        (2, bytearray(png[:30])),                 # truncated IHDR
        (3, bytearray(m.PNG_SIG + b"\x00\x00")),  # chunk header cut
        (4, bytearray(b"not an image at all")),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, payload BINARY")
    assert [r.doc_id for r in m.png_stats(df).collect()] == [1]


def _naive_dct2(block):
    """Independent O(n^4) 2-D DCT-II straight off the textbook formula
    — the model the encoder's separable FDCT is checked against."""
    import math

    out = [[0.0] * 8 for _ in range(8)]
    for u in range(8):
        for v in range(8):
            s = 0.0
            for x in range(8):
                for y in range(8):
                    s += (
                        (block[x][y] - 128.0)
                        * math.cos((2 * x + 1) * u * math.pi / 16)
                        * math.cos((2 * y + 1) * v * math.pi / 16)
                    )
            cu = math.sqrt(0.5) if u == 0 else 1.0
            cv = math.sqrt(0.5) if v == 0 else 1.0
            out[u][v] = 0.25 * cu * cv * s
    return out


def test_jpeg_fdct_matches_independent_model():
    import numpy as np

    from rdfind_spark.functions import multimodal as m

    rng = __import__("random").Random(11)
    block = [[rng.randrange(256) for _ in range(8)] for _ in range(8)]
    got = m._fdct_block(np.array(block))
    want = _naive_dct2(block)
    for u in range(8):
        for v in range(8):
            assert abs(got[u][v] - want[u][v]) < 1e-9, (u, v)
    # and the IDCT inverts it (exactly, before quantization)
    back = m._idct_block(got)
    assert [[int(x) for x in row] for row in back] == block


def test_jpeg_huffman_tables_roundtrip_all_symbols():
    """Canonical Annex C assignment: encoder codes and the decoder's
    MINCODE/MAXCODE tables must invert each other for every DC and AC
    symbol, through the real bit-writer/reader incl. byte stuffing."""
    from rdfind_spark.functions import multimodal as m

    for bits, vals in ((m._DC_BITS, m._DC_VALS), (m._AC_BITS, m._AC_VALS)):
        codes = m._huff_codes(bits, vals)
        assert len(codes) == len(vals)
        dec = m._HuffDecoder(bits, vals)
        bitlist = []
        for sym in vals:
            code, ln = codes[sym]
            for i in range(ln - 1, -1, -1):
                bitlist.append((code >> i) & 1)
        while len(bitlist) % 8:
            bitlist.append(1)
        data = bytearray()
        for i in range(0, len(bitlist), 8):
            byte = 0
            for b in bitlist[i : i + 8]:
                byte = (byte << 1) | b
            data.append(byte)
            if byte == 0xFF:
                data.append(0x00)
        reader = m._BitReader(bytes(data))
        got = [dec.decode(reader) for _ in vals]
        assert got == list(vals)


def test_jpeg_roundtrip_arbitrary_content_within_quant_error():
    """Non-constant blocks through the REAL encode->decode path: with
    an all-ones quant table the only loss is FDCT/IDCT rounding, so
    every grayscale pixel must come back within ±2.  Exercises DC
    prediction across blocks, negative coefficients, ZRL runs, and
    EOB."""
    import numpy as np

    from rdfind_spark.functions import multimodal as m

    rng = __import__("random").Random(7)
    plane = np.array(
        [[rng.randrange(256) for _ in range(16)] for _ in range(16)],
        dtype=np.int64,
    )
    # a block that is zero except one late AC coefficient -> ZRL path
    plane[0:8, 8:16] = 128
    plane[7, 15] = 200
    payload = m.encode_jpeg([plane], 16, 16, quant=[1] * 64)
    w, h, nc, sr, sg, sb, rm = m.parse_jpeg(payload)
    assert (w, h, nc) == (16, 16, 1)
    # decode again via the plane-level path: re-parse and compare sums
    # against the original within the rounding budget (±2/pixel)
    assert abs(sr - int(plane.sum())) <= 2 * plane.size
    assert sr == sg == sb


def test_jpeg_loud_limits_and_truncation_sweep():
    """Unsupported-variant markers raise NotImplementedError; every
    strict prefix of a valid payload raises ValueError/
    NotImplementedError or parses to the identical full answer (the
    GIF/PNG discipline)."""
    import numpy as np
    import pytest as _pytest

    from rdfind_spark.functions import multimodal as m

    plane = np.full((8, 8), 99, dtype=np.int64)
    payload = m.encode_jpeg([plane], 8, 8)

    def _swap(marker_from: bytes, marker_to: bytes) -> bytes:
        assert marker_from in payload
        return payload.replace(marker_from, marker_to, 1)

    with _pytest.raises(NotImplementedError, match="SOF"):
        m.parse_jpeg(_swap(b"\xff\xc0", b"\xff\xc2"))  # progressive
    with _pytest.raises(ValueError):
        m.parse_jpeg(b"\x89PNG not a jpeg")
    # subsampling flag: corrupt the SOF0 component spec (0x11 -> 0x22)
    # SOF0 layout: FF C0 len(2) prec(1) h(2) w(2) nc(1) [id hv tq]...
    sof_at = payload.index(b"\xff\xc0")
    mutated = bytearray(payload)
    mutated[sof_at + 11] = 0x22  # first component h/v sampling
    with _pytest.raises(NotImplementedError, match="4:4:4"):
        m.parse_jpeg(bytes(mutated))

    whole = m.parse_jpeg(payload)
    for cut in range(len(payload)):
        try:
            got = m.parse_jpeg(payload[:cut])
        except (ValueError, NotImplementedError):
            continue
        except Exception as exc:  # noqa: BLE001
            raise AssertionError(
                f"jpeg prefix {cut}: {type(exc).__name__}: {exc}"
            ) from exc
        assert got == whole, f"jpeg prefix {cut} parsed wrong"


def test_jpeg_image_stats_end_to_end_with_duckdb_oracle(spark, sf_dir):
    """attach_jpeg -> REAL Huffman+IDCT decode over real parquet docs
    must equal the DuckDB rendering of jpeg_image_stats_sql — the
    same three-way check a registry entry gets (named round-12
    registration slot; COVERAGE.md round-12 plan)."""
    import duckdb

    from rdfind_spark.functions import multimodal as m

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(40)
    got = {
        r.doc_id: (
            r.width, r.height, r.n_components,
            r.sum_r, r.sum_g, r.sum_b, r.row_moment,
        )
        for r in m.jpeg_image_stats(docs).collect()
    }
    assert len(got) == 40
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM read_parquet('{sf_dir}/documents.parquet') "
        "LIMIT 40"
    )
    want = {
        r[0]: tuple(r[1:])
        for r in con.execute(m.jpeg_image_stats_sql()).fetchall()
    }
    assert got == want


def test_jpeg_stats_skips_malformed_payloads(spark):
    import numpy as np

    from rdfind_spark.functions import multimodal as m

    plane = np.full((8, 8), 50, dtype=np.int64)
    ok = m.encode_jpeg([plane] * 3, 8, 8)
    rows = [
        (1, bytearray(ok)),
        (2, bytearray(ok[: len(ok) // 2])),
        (3, bytearray(b"\xff\xd8\xff")),
        (4, bytearray(b"not an image")),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, payload BINARY")
    assert [r.doc_id for r in m.jpeg_stats(df).collect()] == [1]
