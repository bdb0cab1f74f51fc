"""Row-transform parity operators (SURVEY §2.2): asciify (T1), URL
prefix shortening (T2), value hashing (T3), hash-collision census
(A16/T9).

Asciify and shortening are genuine per-character/trie logic, so they
run as Arrow-batched pandas UDFs (the reference's RichMapFunctions,
``operators/AsciifyTriples.scala:10-45`` and
``operators/ShortenUrls.scala:16-59``); everything else is column
expressions.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from rdfind_spark.util import StringTrie

TRIPLE_COLS = ("subj", "pred", "obj")


def asciify_str(s: str) -> str:
    """Fold a unicode string to 7-bit ASCII: every char > 0x7F expands
    into its 7-bit chunks, low chunk first (reimplements the observed
    behavior of ``operators/AsciifyTriples.scala:17-37``)."""
    if all(ord(c) <= 0x7F for c in s):
        return s
    out: list[str] = []
    for c in s:
        v = ord(c)
        if v <= 0x7F:
            out.append(c)
        else:
            while v:
                out.append(chr(v & 0x7F))
                v >>= 7
    return "".join(out)


def asciify_triples(triples: DataFrame) -> DataFrame:
    """T1: fold all three fields to ASCII (Arrow-batched pandas UDF;
    created lazily because pandas_udf registration needs an active
    session)."""

    @pandas_udf("string")
    def asciify_udf(col: pd.Series) -> pd.Series:
        return col.map(asciify_str)

    return triples.select(*[asciify_udf(F.col(c)).alias(c) for c in TRIPLE_COLS])


def build_prefix_trie(prefixes: list[tuple[str, str]]) -> StringTrie:
    """prefix table [(prefix, url)] → trie keyed '<url' → 'prefix:'
    (mirrors ``ShortenUrls.PrefixTrieCreator``)."""
    trie = StringTrie()
    for prefix, url in prefixes:
        trie.put(f"<{url}", f"{prefix}:")
    return trie


def shorten_urls(triples: DataFrame, prefixes: list[tuple[str, str]]) -> DataFrame:
    """T2: replace ``<url...>`` values whose url starts with a known
    prefix by ``prefix:rest`` (longest prefix wins, trailing '>'
    stripped).  The prefix trie is tiny → shipped in the UDF closure
    (Spark broadcasts it with the serialized task)."""
    trie = build_prefix_trie(prefixes)

    @pandas_udf("string")
    def shorten(col: pd.Series) -> pd.Series:
        def one(url: str) -> str:
            if url.endswith(">"):
                key, val = trie.longest_prefix(url)
                if key:
                    return val + url[len(key) : -1]
            return url

        return col.map(one)

    return triples.select(*[shorten(F.col(c)).alias(c) for c in TRIPLE_COLS])


HASH_LEN = 2  # chars kept from the md5 hex digest (reference: 2-char hash)


def hash_expr(col):
    """T3's value hash: '#' + md5-hex prefix (the reference derives 2
    chars from MurmurHash3, ``programs/RDFind.scala:626-630``; md5 is
    used here so the DuckDB oracle reproduces it bit-for-bit)."""
    return F.concat(F.lit("#"), F.substring(F.md5(col), 1, HASH_LEN))


def apply_hash(triples: DataFrame) -> DataFrame:
    """T3: replace every field by its short hash (collision-accepting
    compression for memory-bound runs)."""
    return triples.select(*[hash_expr(F.col(c)).alias(c) for c in TRIPLE_COLS])


def hash_collisions(triples: DataFrame) -> DataFrame:
    """A16 ``CheckHashCollisions``: for each short hash, how many
    distinct values map to it; rows with n_values > 1 are collisions
    (drives the reference's collision-escape machinery,
    ``util/HashCollisionHandler.scala:11-41``)."""
    values = (
        triples.select(F.col("subj").alias("value"))
        .unionByName(triples.select(F.col("pred").alias("value")))
        .unionByName(triples.select(F.col("obj").alias("value")))
        .distinct()
    )
    return (
        values.groupBy(
            F.substring(F.md5("value"), 1, HASH_LEN).alias("short_hash")
        )
        .agg(F.count("*").alias("n_values"))
        .filter(F.col("n_values") > 1)
    )


def hash_collisions_sql() -> str:
    """SQL body for composition under a ``triples`` CTE (see
    ``oracle._with_triples``)."""
    return f"""vals AS (
  SELECT DISTINCT value FROM (
    SELECT subj AS value FROM triples
    UNION ALL SELECT pred FROM triples
    UNION ALL SELECT obj FROM triples
  )
)
SELECT substr(md5(value), 1, {HASH_LEN}) AS short_hash, COUNT(*) AS n_values
FROM vals GROUP BY 1 HAVING COUNT(*) > 1"""
