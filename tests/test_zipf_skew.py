"""Strict oracle parity for the CIND engine under Zipfian (DBpedia-
shaped) skew — the round-7 verdict's top item: the hot-mask
decomposition (operators/cind.py) tripped at its REAL thresholds
(HOT_LINE_K=512, deep part-2 class populated) and checked bit-exactly
against the same DuckDB oracle the registered queries face.

The fixture (scripts/zipf_fixture.py PARITY params) measures at
generation time: 16 hot join lines (top width 3,565 frequent
captures), 50 deep captures (captures in >= min_support distinct hot
lines), 18.9M hot pair-product that the plain equi-join would
materialize.  Larger regimes (3.4M triples, 15.0B avoided product,
staged-strategy agreement) are scripted in
scripts/zipf_cind_probe.py --depth and recorded in README."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest
from pyspark.sql import functions as F

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"),
)

CIND_COLS = [
    "dep_code",
    "dep_v1",
    "dep_v2",
    "ref_code",
    "ref_v1",
    "ref_v2",
    "support",
]


@pytest.fixture(scope="module")
def zipf_path(tmp_path_factory):
    from zipf_fixture import PARITY, generate

    path = str(tmp_path_factory.mktemp("zipf") / "triples.parquet")
    n = generate(path, **PARITY)
    assert n == 108_480
    return path


def test_skew_fixture_trips_real_hot_thresholds(spark, zipf_path):
    """The fixture must engage the mask path (>= min_overlap hot lines,
    so the deep check runs) AND populate the deep class — otherwise the
    parity test below silently degrades to the cold path only."""
    from rdfind_spark.operators import cind as cind_mod
    from rdfind_spark.operators.cind import build_capture_tables

    triples = spark.read.parquet(zipf_path)
    _, dcap_h, freq_h, frequent, capf = build_capture_tables(triples, 10)
    try:
        hot = (
            capf.groupBy("jv1", "jv2")
            .agg(F.count("*").alias("line_k"))
            .filter(F.col("line_k") > cind_mod.HOT_LINE_K)
        )
        widths = sorted((r.line_k for r in hot.collect()), reverse=True)
        n_deep = (
            capf.join(F.broadcast(hot.select("jv1", "jv2")), on=["jv1", "jv2"])
            .groupBy("h1", "h2")
            .agg(F.count("*").alias("n_lines"))
            .filter(F.col("n_lines") >= 10)
            .count()
        )
    finally:
        for df in (dcap_h, capf, freq_h, frequent):
            df.unpersist()
    assert len(widths) >= 10, widths
    assert widths[0] > 3000, widths[:5]
    assert n_deep > 0


def test_cind_minimal_matches_oracle_under_skew(spark, zipf_path):
    from check_oracle import normalize

    from rdfind_spark import oracle
    from rdfind_spark.operators.cind import discover_cinds

    triples = spark.read.parquet(zipf_path)
    out = discover_cinds(triples, 10, minimal=True)
    got = normalize(
        [[r[c] for c in CIND_COLS] for r in out.collect()],
        CIND_COLS,
        strict=True,
    )

    con = duckdb.connect()
    res = con.execute(
        oracle.cind_sql(
            10,
            minimal=True,
            triples_sql=(
                f"SELECT subj, pred, obj FROM read_parquet('{zipf_path}')"
            ),
        )
    )
    cols = [d[0] for d in res.description]
    ref = normalize(res.fetchall(), cols, strict=True)
    assert len(got) > 5000
    assert got == ref
