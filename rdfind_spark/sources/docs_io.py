"""Document-corpus I/O: JSONL (the training-data interchange standard),
CSV, and partitioned parquet export.

Scale discipline: every reader takes an EXPLICIT schema — schema
inference is a full extra pass over the data (at 100 TB, a second
100 TB scan before the first real job).  Readers accept globs and
``.gz`` transparently like the triple sources (S1-S3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOCUMENT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("source", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("text", T.StringType()),
    ]
)


def read_documents_jsonl(
    spark: SparkSession,
    paths: str | list[str],
    schema: T.StructType = DOCUMENT_SCHEMA,
) -> DataFrame:
    """Read a JSONL document corpus with a fixed schema (no inference
    pass).  Corrupt lines land in no row rather than failing the job
    (PERMISSIVE + drop-null-doc_id), matching the comment-tolerant
    discipline of the triple text sources."""
    return (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .json(paths)
        .filter(F.col("doc_id").isNotNull())
    )


def write_documents_jsonl(
    df: DataFrame, path: str, partition_by: str | None = None
) -> None:
    """JSONL export, optionally hive-partitioned (``source=...``
    directories) — the layout downstream tokenizer/packing jobs
    partition-prune on."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(partition_by)
    w.json(path)


def read_documents_csv(
    spark: SparkSession,
    paths: str | list[str],
    schema: T.StructType = DOCUMENT_SCHEMA,
    header: bool = True,
) -> DataFrame:
    """CSV corpus reader with explicit schema; multiline quoted text
    fields supported (the standard dump shape of annotation tools)."""
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("multiLine", "true")
        .option("escape", '"')
        .csv(paths)
        .filter(F.col("doc_id").isNotNull())
    )


def write_documents_parquet(
    df: DataFrame,
    path: str,
    partition_by: str | None = "source",
    max_records_per_file: int = 1_000_000,
) -> None:
    """Partitioned parquet export with a per-file row cap so one giant
    partition cannot produce a single unsplittable multi-GB file (the
    file-size discipline that keeps downstream scans parallel)."""
    w = df.write.mode("overwrite").option(
        "maxRecordsPerFile", max_records_per_file
    )
    if partition_by and partition_by in df.columns:
        w = w.partitionBy(partition_by)
    w.parquet(path)


def read_documents_orc(
    spark: SparkSession,
    paths: str | list[str],
    schema: T.StructType | None = None,
) -> DataFrame:
    """ORC corpus reader (Spark-native columnar alternative when the
    upstream warehouse is Hive/ORC).  ORC carries its own schema; an
    explicit one is applied on top when given so downstream code sees
    the same column contract as the other readers."""
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.orc(paths)


def write_documents_orc(
    df: DataFrame,
    path: str,
    partition_by: str | None = None,
    compression: str = "zlib",
) -> None:
    """ORC export (optionally hive-partitioned) — same layout discipline
    as the parquet writer; zlib is ORC's widely-readable default."""
    w = df.write.mode("overwrite").option("compression", compression)
    if partition_by and partition_by in df.columns:
        w = w.partitionBy(partition_by)
    w.orc(path)
