"""JSONL/CSV corpus I/O round-trips."""

from __future__ import annotations

import json

from rdfind_spark.sources import docs_io


def test_jsonl_roundtrip(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = str(tmp_path / "docs_jsonl")
    docs_io.write_documents_jsonl(docs.select("doc_id", "source", "lang", "text"), out)
    back = docs_io.read_documents_jsonl(spark, out)
    assert back.count() == docs.count()
    a = {r.doc_id: r.text for r in back.collect()}
    b = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}
    assert a == b


def test_jsonl_corrupt_lines_dropped(spark, tmp_path):
    p = tmp_path / "mixed.jsonl"
    lines = [
        json.dumps({"doc_id": 1, "source": "s", "lang": "en", "text": "hello"}),
        "{not json at all",
        json.dumps({"source": "no-id", "text": "dropped"}),
        json.dumps({"doc_id": 2, "source": "s", "lang": "en", "text": "world"}),
    ]
    p.write_text("\n".join(lines))
    got = docs_io.read_documents_jsonl(spark, str(p)).collect()
    assert sorted(r.doc_id for r in got) == [1, 2]


def test_jsonl_partitioned_write_prunes(spark, tmp_path):
    rows = [(1, "web", "en", "a"), (2, "book", "en", "b"), (3, "web", "en", "c")]
    df = spark.createDataFrame(rows, "doc_id long, source string, lang string, text string")
    out = str(tmp_path / "parts")
    docs_io.write_documents_jsonl(df, out, partition_by="source")
    web = docs_io.read_documents_jsonl(spark, out + "/source=web")
    assert sorted(r.doc_id for r in web.collect()) == [1, 3]


def test_csv_roundtrip_with_quoted_newlines(spark, tmp_path):
    rows = [(1, "s", "en", 'line one\nline "two"'), (2, "s", "en", "plain")]
    df = spark.createDataFrame(rows, "doc_id long, source string, lang string, text string")
    out = str(tmp_path / "csv")
    df.write.mode("overwrite").option("header", "true").option("escape", '"').csv(out)
    back = docs_io.read_documents_csv(spark, out)
    got = {r.doc_id: r.text for r in back.collect()}
    assert got == {1: 'line one\nline "two"', 2: "plain"}


def test_parquet_export_partitioned(spark, tmp_path):
    rows = [(1, "web", "en", "a"), (2, "book", "en", "b")]
    df = spark.createDataFrame(rows, "doc_id long, source string, lang string, text string")
    out = str(tmp_path / "pq")
    docs_io.write_documents_parquet(df, out)
    back = spark.read.parquet(out)
    assert back.count() == 2
    assert sorted(r.source for r in back.select("source").collect()) == ["book", "web"]


def test_orc_round_trip(spark, tmp_path):
    from rdfind_spark.sources.docs_io import (
        read_documents_orc,
        write_documents_orc,
    )

    df = spark.createDataFrame(
        [(1, "web", "en", "hello world"), (2, "book", "fr", "bonjour")],
        "doc_id long, source string, lang string, text string",
    )
    path = str(tmp_path / "docs_orc")
    write_documents_orc(df, path, partition_by="source")
    back = read_documents_orc(spark, path)
    got = {
        (r["doc_id"], r["source"], r["lang"], r["text"])
        for r in back.collect()
    }
    assert got == {(1, "web", "en", "hello world"), (2, "book", "fr", "bonjour")}
    # partitioned layout actually pruned on read
    one = read_documents_orc(spark, path + "/source=web")
    assert one.count() == 1


def test_upsert_snapshot_latest_wins_and_tombstones(spark):
    from rdfind_spark.sources.snapshot import upsert_snapshot

    prior = spark.createDataFrame(
        [(1, "old-a"), (2, "old-b"), (3, "old-c")], "doc_id long, text string"
    )
    updates = spark.createDataFrame(
        [(2, "new-b", False), (3, None, True), (4, "new-d", False)],
        "doc_id long, text string, deleted boolean",
    )
    out = {r["doc_id"]: r["text"] for r in upsert_snapshot(prior, updates, "doc_id").collect()}
    assert out == {1: "old-a", 2: "new-b", 4: "new-d"}  # 3 tombstoned


def test_compact_snapshot_reduces_files(spark, tmp_path):
    import os

    from rdfind_spark.sources.snapshot import compact_snapshot

    src = str(tmp_path / "many")
    dst = str(tmp_path / "few")
    spark.range(0, 1000).repartition(16).write.parquet(src)
    n = compact_snapshot(spark, src, dst, target_files=2)
    assert n == 1000
    files = [f for f in os.listdir(dst) if f.endswith(".parquet")]
    assert len(files) <= 2
    assert spark.read.parquet(dst).count() == 1000
