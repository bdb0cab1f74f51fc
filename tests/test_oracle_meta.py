"""Registry meta-tests: every oracle SQL string must execute in DuckDB
against the sf0.001 views (cheap guard — the full Spark-vs-DuckDB value
comparison is scripts/check_oracle.py / the driver's board)."""

from __future__ import annotations

import os

import duckdb
import pytest

import __spark_entry__ as entry
from rdfind_spark.sources.triples import TABLES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


def test_every_query_has_oracle_or_documented_exception():
    q = entry.queries()
    o = entry.oracle_sql()
    missing = set(q) - set(o)
    # the two custom stateful streaming operators are the only
    # rows-only entries (each pinned instead by an exact deterministic
    # micro-batch parity test)
    assert missing == {"stream_sessions", "stream_anomalies"}, missing


def test_all_oracle_sql_executes(con):
    failures = []
    for name, sql in entry.oracle_sql().items():
        try:
            res = con.execute(sql)
            cols = [d[0] for d in res.description]
            assert cols, name
            res.fetchall()
        except Exception as exc:  # pragma: no cover - failure reporting
            failures.append((name, str(exc)[:200]))
    assert not failures, failures


def test_oracle_column_names_are_lowercase_identifiers(con):
    # the driver sorts columns by name before hashing; weird casing or
    # unaliased expressions (e.g. "sum(l_quantity)") break the match
    bad = []
    for name, sql in entry.oracle_sql().items():
        cols = [d[0] for d in con.execute(sql).description]
        for c in cols:
            if not c.replace("_", "").isalnum() or c != c.lower():
                bad.append((name, c))
    assert not bad, bad
