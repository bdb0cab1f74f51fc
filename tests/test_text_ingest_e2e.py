"""The text-ingest front door, end to end: the reference's primary
usage is many gzipped N-Triples part files in, CINDs out
(``programs/RDFind.scala:141-237``).  These tests pin that the S1-S6
text path (multi-file glob + gzip + comment filter + parser) is
EQUIVALENT to the parquet melt — same triples, same CINDs — so the
sf0.01 wall-clock run in scripts/text_ingest_e2e.py measures a path
the suite proves correct.

The serializer (sinks.ntriples_lines) is the parser's inverse; the
escape round-trip is pinned on adversarial vectors because a regex
unescape that merely LOOKS right silently corrupts literals containing
backslash runs (caught during development: the backslash-halving pass
was an identity).
"""

from __future__ import annotations

import gzip
import os

from pyspark.sql import functions as F

from rdfind_spark.sources.sinks import ntriples_lines, write_ntriples
from rdfind_spark.sources.triples import (
    _parsed_quads,
    read_ntriples,
    triple_view,
)


def test_literal_escape_round_trip(spark):
    raw = [
        "plain", 'a"b', "a\\b", 'a\\"b', '\\"', '"\\', "a\\\\b", "",
        "x\\nx", "\\", '"""', "\\\\\\", 'ends with backslash\\',
    ]
    df = spark.createDataFrame(
        [("s", "p", o) for o in raw], "subj string, pred string, obj string"
    )
    back = [r.obj for r in _parsed_quads(ntriples_lines(df)).collect()]
    assert back == raw


def _export_nt_gz(triples, out_dir: str, n_files: int) -> str:
    """write_ntriples + rename the part files to the .nt.gz layout a
    user's dump directory would have; returns the glob."""
    write_ntriples(triples, out_dir, n_files=n_files)
    i = 0
    for name in sorted(os.listdir(out_dir)):
        if name.startswith("part-") and name.endswith(".gz"):
            os.rename(
                os.path.join(out_dir, name),
                os.path.join(out_dir, f"part-{i:04d}.nt.gz"),
            )
            i += 1
    assert i == n_files
    return os.path.join(out_dir, "*.nt.gz")


def test_text_path_reproduces_melt_triples(spark, sf_dir, tmp_path):
    """Full melt -> 4 .nt.gz part files -> glob read == original
    triples, with comment lines and blank lines injected (S5) and an
    extra plain-text .nt file mixed in (multi-codec S1/S2)."""
    out_dir = str(tmp_path / "dump")
    melt = triple_view(spark, sf_dir)
    glob = _export_nt_gz(melt, out_dir, n_files=4)

    # a 5th, uncompressed file with comments/blank lines + 1 real triple
    extra = tmp_path / "dump" / "extra.nt"
    extra.write_text(
        "# comment line\n\n<zzz:1> <hasName> \"Extra\" .\n# trailing\n"
    )

    got = read_ntriples(spark, [glob, str(extra)])
    expect = melt.unionByName(
        spark.createDataFrame(
            [("zzz:1", "hasName", "Extra")],
            "subj string, pred string, obj string",
        )
    )
    # multiset equality via exceptAll both ways (cheap at sf0.001)
    assert got.count() == expect.count()
    assert got.exceptAll(expect).count() == 0
    assert expect.exceptAll(got).count() == 0


def test_text_path_cinds_equal_parquet_path_cinds(spark, sf_dir, tmp_path):
    """The flagship through the front door: discover_cinds over the
    glob-read .nt.gz dump must equal discover_cinds over the parquet
    melt, row for row.  Restricted to the customer-dimension melt
    (region/nation/customer/supplier predicates) to keep the suite
    fast; the FULL-melt run at sf0.01 through the actual CLI lives in
    scripts/text_ingest_e2e.py with its wall-clock in COVERAGE.md."""
    from rdfind_spark.operators.cind import discover_cinds

    dims = ("hasName", "inRegion", "inNation", "inSegment")
    melt = triple_view(spark, sf_dir).filter(F.col("pred").isin(*dims))
    glob = _export_nt_gz(melt, str(tmp_path / "dims"), n_files=2)

    a = discover_cinds(melt, min_support=10, minimal=True)
    b = discover_cinds(read_ntriples(spark, glob), min_support=10, minimal=True)
    rows_a = sorted(map(tuple, a.collect()))
    rows_b = sorted(map(tuple, b.collect()))
    assert rows_a, "dimension melt must produce CINDs"
    assert rows_a == rows_b
