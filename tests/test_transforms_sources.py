"""Tests for the parity operators: asciify (T1), URL shortening (T2),
value hashing (T3), hash collisions (A16), N-Triples reading (S1-S6),
prefix parsing (S7), sinks + observe counters (S8-S11, T6)."""

from __future__ import annotations

import gzip
import os

from pyspark.sql import functions as F

from rdfind_spark.operators import transforms
from rdfind_spark.sources import sinks
from rdfind_spark.sources.triples import parse_prefixes, read_ntriples


def test_asciify_str_pure():
    assert transforms.asciify_str("plain ascii!") == "plain ascii!"
    # é = U+00E9 = 0xE9: chunks 0x69 ('i'), 0x01
    assert transforms.asciify_str("é") == "i\x01"
    # mixed string keeps ascii chars in place
    assert transforms.asciify_str("aéb") == "ai\x01b"
    # 3-chunk char: U+4E2D (中) = 0x4E2D → 0x2D, 0x1C, 0x01
    assert transforms.asciify_str("中") == "-\x1c\x01"


def test_asciify_triples_df(spark):
    df = spark.createDataFrame([("é", "p", "中")], ["subj", "pred", "obj"])
    row = transforms.asciify_triples(df).collect()[0]
    assert (row.subj, row.pred, row.obj) == ("i\x01", "p", "-\x1c\x01")


def test_shorten_urls(spark):
    prefixes = [("ex", "http://example.org/"), ("exa", "http://example.org/a/")]
    df = spark.createDataFrame(
        [
            ("<http://example.org/x>", "<http://example.org/a/y>", "plain"),
            ("<http://other.org/z>", "no-angle", "<http://example.org/>"),
        ],
        ["subj", "pred", "obj"],
    )
    rows = transforms.shorten_urls(df, prefixes).collect()
    assert (rows[0].subj, rows[0].pred, rows[0].obj) == ("ex:x", "exa:y", "plain")
    # unknown url and non-bracketed values unchanged; bare prefix shortens
    assert (rows[1].subj, rows[1].pred, rows[1].obj) == (
        "<http://other.org/z>",
        "no-angle",
        "ex:",
    )


def test_apply_hash_and_collisions(spark):
    df = spark.createDataFrame([("a", "b", "c"), ("a", "d", "e")], ["subj", "pred", "obj"])
    hashed = transforms.apply_hash(df).collect()
    assert all(r.subj.startswith("#") and len(r.subj) == 3 for r in hashed)
    # deterministic: same value → same hash
    assert hashed[0].subj == hashed[1].subj
    col = transforms.hash_collisions(df).collect()
    assert all(r.n_values > 1 for r in col)


_NT = """# a comment line
<http://ex.org/s1> <http://ex.org/p> <http://ex.org/o1> .
<http://ex.org/s2> <http://ex.org/p> "literal value" .
<http://ex.org/s3> <http://ex.org/p> "typed"^^<http://www.w3.org/2001/XMLSchema#string> .
<http://ex.org/s4> <http://ex.org/p> "lang"@en .
_:blank <http://ex.org/p> <http://ex.org/o2> .

"""


def test_read_ntriples_plain_and_gz(spark, tmp_path):
    plain = tmp_path / "data.nt"
    plain.write_text(_NT)
    with gzip.open(tmp_path / "data2.nt.gz", "wt") as f:
        f.write(_NT)
    for path in (str(plain), str(tmp_path / "data2.nt.gz")):
        rows = {
            (r.subj, r.pred, r.obj)
            for r in read_ntriples(spark, path).collect()
        }
        assert ("http://ex.org/s1", "http://ex.org/p", "http://ex.org/o1") in rows
        assert ("http://ex.org/s2", "http://ex.org/p", "literal value") in rows
        assert ("http://ex.org/s3", "http://ex.org/p", "typed") in rows
        assert ("http://ex.org/s4", "http://ex.org/p", "lang") in rows
        assert ("_:blank", "http://ex.org/p", "http://ex.org/o2") in rows
        assert len(rows) == 5  # comment + blank line dropped


_NQ = """# quad fixture: graph term is a 4th IRI/bnode before the dot
<http://ex.org/s1> <http://ex.org/p> <http://ex.org/o1> <http://ex.org/g1> .
<http://ex.org/s2> <http://ex.org/p> "lit in graph" <http://ex.org/g1> .
<http://ex.org/s3> <http://ex.org/p> "typed"^^<http://www.w3.org/2001/XMLSchema#string> _:g2 .
<http://ex.org/s4> <http://ex.org/p> <http://ex.org/o4> .
"""


def test_read_nquads_and_quad_lines_in_ntriples(spark, tmp_path):
    from rdfind_spark.sources.triples import read_nquads

    path = tmp_path / "data.nq"
    path.write_text(_NQ)
    # quad lines must NOT be silently dropped by the triple reader
    # (pre-fix behavior: the $-anchored pattern failed on the 4th term)
    triples = {
        (r.subj, r.pred, r.obj) for r in read_ntriples(spark, str(path)).collect()
    }
    assert triples == {
        ("http://ex.org/s1", "http://ex.org/p", "http://ex.org/o1"),
        ("http://ex.org/s2", "http://ex.org/p", "lit in graph"),
        ("http://ex.org/s3", "http://ex.org/p", "typed"),
        ("http://ex.org/s4", "http://ex.org/p", "http://ex.org/o4"),
    }
    quads = {
        (r.subj, r.pred, r.obj, r.graph)
        for r in read_nquads(spark, str(path)).collect()
    }
    assert ("http://ex.org/s1", "http://ex.org/p", "http://ex.org/o1", "http://ex.org/g1") in quads
    assert ("http://ex.org/s3", "http://ex.org/p", "typed", "_:g2") in quads
    # plain triple line keeps empty-string graph (no nulls, SURVEY §1.2)
    assert ("http://ex.org/s4", "http://ex.org/p", "http://ex.org/o4", "") in quads


def test_parse_prefixes(spark, tmp_path):
    p = tmp_path / "prefixes.ttl"
    p.write_text("@prefix ex: <http://ex.org/> .\nnot a prefix line\n")
    rows = parse_prefixes(spark, str(p)).collect()
    assert [(r.prefix, r.url) for r in rows] == [("ex", "http://ex.org/")]


def test_cind_pretty_and_text_sink(spark, tmp_path):
    df = spark.createDataFrame(
        [(10, "p1", "", 14, "p2", "y", 4)],
        ["dep_code", "dep_v1", "dep_v2", "ref_code", "ref_v1", "ref_v2", "support"],
    )
    pretty = sinks.cind_pretty(df).collect()[0].value
    assert pretty == "s[p=p1] < s[p=p2, o=y] (support=4)"
    out = str(tmp_path / "cinds_out")
    sinks.write_text(sinks.cind_pretty(df), out)
    files = [f for f in os.listdir(out) if f.startswith("part-")]
    assert len(files) == 1  # single_file pinning
    assert spark.read.text(out).collect()[0].value == pretty


def test_observe_count(spark):
    df = spark.range(100)
    counted, obs = sinks.observe_count(df, "n_rows")
    counted.write.format("noop").mode("overwrite").save()
    assert obs.get["n"] == 100
