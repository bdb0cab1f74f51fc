"""Triple sources.

Two ways into the engine's core ``triples(subj, pred, obj)`` table:

1. ``triple_view`` — deterministic melt of the driver's TPC-H-ish star
   schema into triples (FIXTURES.md §3).  The SAME spec also renders to
   ANSI SQL (``triple_view_sql``) so the DuckDB oracle sees an
   identical input — one source of truth, two renderings.
2. ``read_ntriples`` — N-Triples/N-Quads text files (reference behavior:
   ``programs/RDFind.scala:204-237`` — comment filter, .gz transparent,
   glob paths; here all native to ``spark.read.text``).

Foreign-key edges give known-true CINDs by construction (e.g. every
``o[p=byCustomer]`` value appears in ``s[p=inNation]``'s value set).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# One melt rule: (table, subject_pieces, predicate, object_pieces).
# A piece starting with '$' is a column (cast to string); otherwise a
# string literal. Rendered identically into Spark and SQL.
TRIPLE_SPEC: list[tuple[str, tuple[str, ...], str, tuple[str, ...]]] = [
    ("region", ("region:", "$r_regionkey"), "hasName", ("$r_name",)),
    ("nation", ("nation:", "$n_nationkey"), "hasName", ("$n_name",)),
    ("nation", ("nation:", "$n_nationkey"), "inRegion", ("region:", "$n_regionkey")),
    ("customer", ("cust:", "$c_custkey"), "inNation", ("nation:", "$c_nationkey")),
    ("customer", ("cust:", "$c_custkey"), "inSegment", ("$c_mktsegment",)),
    ("supplier", ("supp:", "$s_suppkey"), "inNation", ("nation:", "$s_nationkey")),
    ("part", ("part:", "$p_partkey"), "hasBrand", ("$p_brand",)),
    ("part", ("part:", "$p_partkey"), "hasType", ("$p_type",)),
    ("orders", ("order:", "$o_orderkey"), "hasStatus", ("$o_orderstatus",)),
    ("orders", ("order:", "$o_orderkey"), "hasPriority", ("$o_orderpriority",)),
    ("orders", ("order:", "$o_orderkey"), "byCustomer", ("cust:", "$o_custkey")),
    (
        "lineitem",
        ("li:", "$l_orderkey", ":", "$l_linenumber"),
        "ofOrder",
        ("order:", "$l_orderkey"),
    ),
    (
        "lineitem",
        ("li:", "$l_orderkey", ":", "$l_linenumber"),
        "ofPart",
        ("part:", "$l_partkey"),
    ),
    (
        "lineitem",
        ("li:", "$l_orderkey", ":", "$l_linenumber"),
        "bySupplier",
        ("supp:", "$l_suppkey"),
    ),
    (
        "lineitem",
        ("li:", "$l_orderkey", ":", "$l_linenumber"),
        "returnFlag",
        ("$l_returnflag",),
    ),
    (
        "lineitem",
        ("li:", "$l_orderkey", ":", "$l_linenumber"),
        "lineStatus",
        ("$l_linestatus",),
    ),
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # NO spread_small_input here (unlike the documents/embeddings/events
    # loaders): the triple melt's per-row work is cheap concat/cast, so
    # paying a round-robin shuffle (+ its sort-before-repartition) of
    # the base strings per melt branch measured NET-SLOWER on the CIND
    # family (capture_overlaps 42.0→45.6 s min-of-3, slower in every
    # paired A/B draw), while the heavy aggregation downstream
    # parallelizes at its own exchanges anyway.
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def _pieces_to_col(pieces: tuple[str, ...]):
    cols = [
        F.col(p[1:]).cast("string") if p.startswith("$") else F.lit(p) for p in pieces
    ]
    return cols[0] if len(cols) == 1 else F.concat(*cols)


def _pieces_to_sql(pieces: tuple[str, ...]) -> str:
    parts = [
        f"CAST({p[1:]} AS VARCHAR)" if p.startswith("$") else f"'{p}'" for p in pieces
    ]
    return parts[0] if len(parts) == 1 else " || ".join(parts)


def triple_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Melt the star schema at ``sf_dir`` into ``(subj, pred, obj)``."""
    tables: dict[str, DataFrame] = {}
    out: DataFrame | None = None
    for table, subj, pred, obj in TRIPLE_SPEC:
        if table not in tables:
            tables[table] = load_table(spark, sf_dir, table)
        part = tables[table].select(
            _pieces_to_col(subj).alias("subj"),
            F.lit(pred).alias("pred"),
            _pieces_to_col(obj).alias("obj"),
        )
        out = part if out is None else out.unionByName(part)
    assert out is not None
    return out


def triple_view_sql() -> str:
    """The same melt as ANSI SQL over tables named like TABLES
    (DuckDB-compatible; used as the oracle's ``triples`` CTE body)."""
    selects = [
        f"SELECT {_pieces_to_sql(subj)} AS subj, '{pred}' AS pred, "
        f"{_pieces_to_sql(obj)} AS obj FROM {table}"
        for table, subj, pred, obj in TRIPLE_SPEC
    ]
    return "\nUNION ALL ".join(selects)


# --- N-Triples text path (reference S1-S6) -------------------------------

# N-Triples line with an OPTIONAL 4th graph term (IRI or blank node)
# before the terminating dot — i.e. N-Quads is a superset (reference
# accepts ``.nq`` inputs, ``programs/RDFind.scala:221``).  Group 7/8
# capture the graph label; a quad line without them would silently fail
# every group and be DROPPED, which is data loss, not an error.
_NT_PATTERN = (
    # (?s): Java regex treats NEL/LS/PS (U+0085/U+2028/U+2029) as line
    # terminators that a bare `.` will NOT match, so a literal
    # containing one would silently fail the whole line (data loss,
    # hypothesis-found).  The text source splits records on \n only,
    # so DOTALL is safe — no real record boundary can appear inside a
    # line.
    r"(?s)^\s*(?:<([^>]*)>|(_:\S+))\s+<([^>]*)>\s+"
    r"(?:<([^>]*)>|(_:\S+)|(\".*\"(?:\^\^<[^>]*>|@[\w-]+)?))"
    r"(?:\s+(?:<([^>]*)>|(_:\S+)))?\s*\.\s*$"
)


def _parsed_quads(lines: DataFrame) -> DataFrame:
    return (
        lines.filter(~F.col("value").startswith("#"))
        .filter(F.trim(F.col("value")) != "")
        .select(
            F.coalesce(
                F.nullif(F.regexp_extract("value", _NT_PATTERN, 1), F.lit("")),
                F.regexp_extract("value", _NT_PATTERN, 2),
            ).alias("subj"),
            F.regexp_extract("value", _NT_PATTERN, 3).alias("pred"),
            F.coalesce(
                F.nullif(F.regexp_extract("value", _NT_PATTERN, 4), F.lit("")),
                F.nullif(F.regexp_extract("value", _NT_PATTERN, 5), F.lit("")),
                # Strip the outer quotes + datatype/lang suffix, then
                # undo the N-Triples string escapes for quote and
                # backslash.  The \"-pass runs FIRST: in validly
                # escaped text every quote is \"-escaped and every raw
                # backslash is doubled, so a left-to-right scan always
                # lands the \" match on a true escape pair (never on
                # the tail of a \\ pair); the \\-pass then halves the
                # remaining backslash runs.  Escapes whose second char
                # is an ordinary letter (\n, \t) CANNOT be decoded this
                # way (a bare n is a legal literal char) and are kept
                # verbatim — consistent with the engine's plain-string
                # value semantics.
                F.regexp_replace(
                    F.regexp_replace(
                        F.regexp_replace(
                            F.regexp_extract("value", _NT_PATTERN, 6),
                            # (?s) for the same NEL/LS/PS reason as
                            # _NT_PATTERN
                            r'(?s)^"(.*)"(?:\^\^<[^>]*>|@[\w-]+)?$',
                            r"$1",
                        ),
                        r'\\"',
                        '"',
                    ),
                    r"\\\\",
                    r"\\",
                ),
            ).alias("obj"),
            F.coalesce(
                F.nullif(F.regexp_extract("value", _NT_PATTERN, 7), F.lit("")),
                F.regexp_extract("value", _NT_PATTERN, 8),
            ).alias("graph"),
        )
        .filter((F.col("subj") != "") & (F.col("pred") != ""))
    )


def read_ntriples(spark: SparkSession, paths: str | list[str]) -> DataFrame:
    """Read N-Triples/N-Quads text file(s) into ``(subj, pred, obj)``.

    Comment lines (``#``) are dropped (reference
    ``programs/RDFind.scala:211-213``); ``.gz`` decompresses natively;
    glob patterns in ``paths`` are expanded by Spark.  Literal objects
    keep their quoted lexical form minus datatype/lang suffix, matching
    the reference's use of plain string values.  N-Quads lines parse
    too — the graph term is accepted and dropped, mirroring the
    reference's quad→triple conversion (``programs/RDFind.scala:221``);
    use :func:`read_nquads` to keep the graph column.
    """
    return _parsed_quads(spark.read.text(paths)).drop("graph")


def read_nquads(spark: SparkSession, paths: str | list[str]) -> DataFrame:
    """Read N-Quads file(s) into ``(subj, pred, obj, graph)``; plain
    triple lines get ``graph = ''`` (empty-string discipline, SURVEY
    §1.2)."""
    return _parsed_quads(spark.read.text(paths))


def read_tsv_triples(spark: SparkSession, paths: str | list[str]) -> DataFrame:
    """Tab-separated ``subj\\tpred\\tobj`` lines (the reference's
    ``--tab-separated`` input variant, ``programs/RDFind.scala:219-226``);
    comment lines dropped like the NT path."""
    lines = spark.read.text(paths)
    parts = F.split(F.col("value"), "\t")
    return (
        lines.filter(~F.col("value").startswith("#"))
        .filter(F.size(parts) >= 3)
        .select(
            parts[0].alias("subj"),
            parts[1].alias("pred"),
            parts[2].alias("obj"),
        )
    )


def estimate_triple_count(
    spark: SparkSession, paths: str | list[str], sample_lines: int = 10000
) -> int:
    """S4 input-size estimation: read the first ``sample_lines``
    non-comment lines, extrapolate the total line count from the
    byte sizes (reference ``programs/RDFind.scala:101-136``).  Only an
    estimate — used by callers to size data structures up front."""
    import math

    sc = spark.sparkContext
    path_list = [paths] if isinstance(paths, str) else list(paths)
    conf = sc._jsc.hadoopConfiguration()
    total_bytes = 0
    uri = sc._jvm.java.net.URI
    fs_cls = sc._jvm.org.apache.hadoop.fs.FileSystem
    path_cls = sc._jvm.org.apache.hadoop.fs.Path
    for p in path_list:
        hp = path_cls(p)
        fs = fs_cls.get(uri(p if "://" in p else f"file://{p}"), conf)
        for status in fs.globStatus(hp) or []:
            total_bytes += status.getLen()
    sample = (
        spark.read.text(path_list)
        .filter(~F.col("value").startswith("#"))
        .limit(sample_lines)
        .select(F.length("value").alias("n"))
        .agg(F.count("*").alias("rows"), F.sum("n").alias("bytes"))
        .collect()[0]
    )
    if not sample.rows or not sample.bytes:
        return 0
    avg_line = sample.bytes / sample.rows + 1  # +1 newline
    return int(math.ceil(total_bytes / avg_line))


def parse_prefixes(spark: SparkSession, path: str) -> DataFrame:
    """Parse ``@prefix p: <url> .`` lines into ``(prefix, url)``
    (reference ``operators/ParseRdfPrefixes.scala:12-27``)."""
    pat = r"^@prefix\s+([^:\s]*):\s*<([^>]*)>\s*\.\s*$"
    return (
        spark.read.text(path)
        .select(
            F.regexp_extract("value", pat, 1).alias("prefix"),
            F.regexp_extract("value", pat, 2).alias("url"),
        )
        .filter(F.col("url") != "")
    )
