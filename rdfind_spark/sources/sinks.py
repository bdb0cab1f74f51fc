"""Sinks + side-effect counters (SURVEY §2.1 S8-S11, §2.2 T6).

The reference writes CINDs/ARs as text (parallelism pinned to 1 for
``file:`` URIs, ``programs/RDFind.scala:507-522``), streams results to
the driver over RMI, and counts rows through accumulators.  Spark
equivalents: ``coalesce(1).write.text``, ``collect``/``toLocalIterator``,
and ``df.observe`` metrics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from rdfind_spark import condition_codes as cc


def cind_pretty(df: DataFrame) -> DataFrame:
    """Pretty-print CIND rows like ``s[p=a] < s[p=b] (support=N)``
    (``util/ConditionCodes.scala:102-107`` format) as a single text
    column."""
    caps = []
    for side in ("dep", "ref"):
        code = F.col(f"{side}_code")
        proj = (
            F.when(code.bitwiseAND(cc.SECONDARY_MASK) == cc.SUBJECT << 3, "s")
            .when(code.bitwiseAND(cc.SECONDARY_MASK) == cc.PREDICATE << 3, "p")
            .otherwise("o")
        )
        # value1 belongs to the lower primary bit, value2 to the higher
        conds = []
        for field, name in ((cc.SUBJECT, "s"), (cc.PREDICATE, "p"), (cc.OBJECT, "o")):
            has = code.bitwiseAND(F.lit(field)) != 0
            lower_bits = code.bitwiseAND(F.lit(field - 1)).bitwiseAND(
                F.lit(cc.PRIMARY_MASK)
            )
            is_first = F.bit_count(lower_bits) == 0
            val = F.when(is_first, F.col(f"{side}_v1")).otherwise(F.col(f"{side}_v2"))
            conds.append(F.when(has, F.concat(F.lit(f"{name}="), val)))
        cond_str = F.concat_ws(", ", *conds)
        caps.append(F.concat(proj, F.lit("["), cond_str, F.lit("]")))
    return df.select(
        F.concat(
            caps[0], F.lit(" < "), caps[1],
            F.lit(" (support="), F.col("support").cast("string"), F.lit(")"),
        ).alias("value")
    )


def ar_pretty(df: DataFrame) -> DataFrame:
    """Pretty-print association rules like ``p=a => o=b (support=N,
    confidence=C)`` (reference AR sink S9,
    ``programs/RDFind.scala:524-554``)."""
    field = {cc.SUBJECT: "s", cc.PREDICATE: "p", cc.OBJECT: "o"}
    ante = F.concat_ws(
        "",
        *[
            F.when(F.col("ante_code") == code, F.lit(name))
            for code, name in field.items()
        ],
    )
    cons = F.concat_ws(
        "",
        *[
            F.when(F.col("cons_code") == code, F.lit(name))
            for code, name in field.items()
        ],
    )
    return df.select(
        F.concat(
            ante, F.lit("="), F.col("antecedent"),
            F.lit(" => "), cons, F.lit("="), F.col("consequent"),
            F.lit(" (support="), F.col("support").cast("string"),
            F.lit(", confidence="), F.round("confidence", 4).cast("string"),
            F.lit(")"),
        ).alias("value")
    )


def ntriples_lines(df: DataFrame) -> DataFrame:
    """Serialize ``(subj, pred, obj)`` rows to N-Triples lines
    (``<subj> <pred> "obj" .``): the inverse of
    :func:`rdfind_spark.sources.triples.read_ntriples`, giving the
    engine a text EXPORT to match its text ingest (reference S8 writes
    results as text; this writes the triple relation itself, which is
    what lets the text front door be round-trip tested at scale).

    Subjects/predicates render as IRIs (they are key-like tokens in
    every supported melt — must not contain ``>`` or whitespace; a
    loud filter would hide data loss, so a violating row simply
    produces a line the parser rejects and the round-trip test
    catches).  Objects always render as literals with ``\\`` and ``"``
    escaped per the N-Triples grammar; literals containing raw
    newlines are unsupported (Spark text sinks are line-based — the
    N-Triples grammar itself forbids them unescaped)."""
    esc = F.regexp_replace(
        F.regexp_replace(F.col("obj"), r"\\", r"\\\\"), '"', '\\\\"'
    )
    return df.select(
        F.concat(
            F.lit("<"), F.col("subj"), F.lit("> <"), F.col("pred"),
            F.lit('> "'), esc, F.lit('" .'),
        ).alias("value")
    )


def write_ntriples(df: DataFrame, path: str, n_files: int = 8) -> None:
    """Write a triple relation as ``n_files`` gzipped N-Triples part
    files — the reference's primary input format (many ``.nt.gz``
    files, ``programs/RDFind.scala:141-237``), produced distributed:
    ``repartition(n_files)`` bounds file count without a driver-side
    collect, and the gzip codec is the native Hadoop one (S2)."""
    (
        ntriples_lines(df)
        .repartition(n_files)
        .write.mode("overwrite")
        .option("compression", "gzip")
        .text(path)
    )


def write_text(df: DataFrame, path: str, single_file: bool = True) -> None:
    """S8/S9 text sink, overwrite semantics; ``single_file`` mirrors the
    reference's parallelism-1 pinning for local files (keep False on a
    cluster so the write stays distributed)."""
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").text(path)


def write_parquet(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    path: str | None = None,
) -> None:
    """Bucketed parquet table (hash-bucketed + sorted on
    ``bucket_cols``): reads of this table are pre-partitioned, so
    equi-joins and aggregations on the bucket columns plan WITHOUT a
    shuffle Exchange — the 100 TB pattern for a capture table that
    several pipeline stages join on ``join_value`` (the reference
    re-shuffles per stage; bucketing pays the shuffle once at write
    time).  Catalyst only recognizes bucketing through the catalog,
    hence ``saveAsTable`` (in-memory catalog works; pass ``path`` for an
    external location)."""
    writer = (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .format("parquet")
    )
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def collect_rows(df: DataFrame) -> list:
    """S10 driver-collect sink (RMI RemoteCollector analogue)."""
    return df.collect()


def observe_count(df: DataFrame, name: str) -> tuple[DataFrame, Observation]:
    """T6 ``CountItems``: pass-through row counter; read
    ``observation.get`` after an action (Spark's accumulator-backed
    observe metrics)."""
    obs = Observation(name)
    return df.observe(obs, F.count(F.lit(1)).alias("n")), obs
