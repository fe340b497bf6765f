"""File-format sources/sinks beyond parquet (SURVEY §2.2: the reference has
NO file formats at all — ETS is RAM, Mnesia disc_copies is opaque; any
interchange surface is an engine addition).

Design rules applied here for the 100 TB case:

- schemas are ALWAYS explicit — ``inferSchema``/sampling passes re-read the
  whole input at scale and can flip types between runs (a determinism
  hazard), so every reader takes/declares a StructType;
- writes partition by a low-cardinality column (``lang``) so downstream
  per-language pipelines (lang-ID training splits, per-locale dedup) get
  partition pruning for free;
- JSONL is the interchange format for nested span documents (CSV cannot
  carry array<struct>); text-dir ingest assigns doc ids from file+line
  lineage, not from ordering (order of file listing is not a contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .tables import SPAN_TYPE

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

SPAN_DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("spans", T.ArrayType(SPAN_TYPE)),
    ]
)


def write_documents_csv(docs: DataFrame, path: str) -> None:
    """Flat corpus -> CSV, gzip'd, partitioned by lang. Quoting handles
    embedded delimiters/newlines; header on so the file is self-describing
    (the reader still never infers)."""
    (
        docs.write.mode("overwrite")
        .option("header", True)
        .option("compression", "gzip")
        .option("quoteAll", True)
        .option("escape", '"')
        .partitionBy("lang")
        .csv(path)
    )


def read_documents_csv(spark: SparkSession, path: str) -> DataFrame:
    df = (
        spark.read.schema(
            # lang comes back from the partition directory, not the file
            T.StructType([f for f in DOCUMENTS_SCHEMA.fields if f.name != "lang"])
        )
        .option("header", True)
        .option("quote", '"')
        .option("escape", '"')
        .option("multiLine", True)  # quoted embedded newlines in text
        .csv(path)
    )
    return df.select(*[f.name for f in DOCUMENTS_SCHEMA.fields])


def write_documents_jsonl(docs: DataFrame, path: str) -> None:
    """Nested span documents -> JSON lines (the only text format here that
    can carry array<struct>); zstd-compressed."""
    docs.write.mode("overwrite").option("compression", "gzip").json(path)


def read_documents_jsonl(
    spark: SparkSession, path: str, schema: T.StructType = SPAN_DOCS_SCHEMA
) -> DataFrame:
    return spark.read.schema(schema).json(path)


def read_text_dir(spark: SparkSession, path: str) -> DataFrame:
    """Raw text-file ingest: one row per line.

    doc_id = xxhash64(file, line-content, occurrence#) where occurrence#
    numbers repeated identical lines WITHIN a file (row_number over the
    (file, text) group). Repeated lines are common in raw web text; without
    the occurrence term they would collide on doc_id and a downstream
    dedup-by-doc_id would silently drop rows. The id SET is deterministic
    across re-ingest/partitioning: the k-th copy of a line always yields
    the same id, and which physical row is "k-th" is unobservable because
    the copies are byte-identical. Cost: one hash shuffle over the ingest
    (groups are per-(file,line) — tiny, skew-free).
    """
    lines = spark.read.text(path).select(
        F.col("value").alias("text"),
        F.input_file_name().alias("src_file"),
    )
    occ = F.row_number().over(
        Window.partitionBy("src_file", "text").orderBy(F.lit(1))
    )
    return lines.select(
        F.xxhash64("src_file", "text", occ.cast("string")).alias("doc_id"),
        "text",
        "src_file",
        F.octet_length("text").cast("long").alias("n_bytes"),
    )


def write_documents_orc(docs: DataFrame, path: str) -> None:
    """ORC sink (Spark-native columnar alternative to parquet — the
    Hive-ecosystem interchange format; zlib compression, same min/max
    stripe statistics story as parquet footers)."""
    docs.write.mode("overwrite").orc(path)


def read_documents_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def write_documents_partitioned(
    docs: DataFrame, path: str, partition_col: str = "lang"
) -> None:
    """Hive-layout partitioned parquet sink: one directory per
    ``partition_col`` value (``lang=en/part-*.parquet``). At corpus
    scale this IS the coarse pruning layer: a reader filtering on the
    partition column never lists — let alone opens — the other
    directories, independent of (and before) parquet row-group
    statistics. The Z-order/min-max audit (operators/layout.py) covers
    intra-file skipping; this covers directory-level skipping; real
    tables use both.
    """
    docs.write.mode("overwrite").partitionBy(partition_col).parquet(path)


def read_documents_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read the hive layout back; the partition column is reconstructed
    from directory names (string-typed — Spark's default with
    spark.sql.sources.partitionColumnTypeInference left alone)."""
    return spark.read.parquet(path)
