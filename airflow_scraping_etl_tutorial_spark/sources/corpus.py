"""Raw-corpus ingestion sources: JSONL and plain text — the formats
LLM training corpora actually arrive in (one JSON doc per line / one
document per file or per line).

Schema discipline (SURVEY.md §1.3: the reference validates shape, never
infers): every reader takes an EXPLICIT schema, never inferSchema — at
100 TB an inference pass is a full extra scan, and silent schema drift
is exactly what the reference's arity gate exists to catch. Malformed
lines are quarantined, not dropped: PERMISSIVE mode + a corrupt-record
column routes them to the alert path (the engine-wide form of P7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# The documents-table shape as a JSONL contract.
DOCUMENT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def read_jsonl_corpus(
    spark: SparkSession, path: str, schema: T.StructType = DOCUMENT_SCHEMA
) -> DataFrame:
    """JSONL reader with explicit schema + corrupt-line quarantine.

    Returns the typed columns plus `_corrupt_record` (null for good
    rows, the raw line for bad ones). Callers split on it:
    good = df.filter(col('_corrupt_record').isNull()).
    Scale: JSONL splits by newline, so a 100 TB corpus parallelizes to
    line-range tasks with no coordination.
    """
    full = schema.add("_corrupt_record", T.StringType())
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )


def jsonl_quality_split(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good, quarantined) split on the corrupt-record column — the
    load-vs-alert branch (C1/P7) for corpus ingestion.

    The parsed frame is cached first: Spark refuses queries that touch
    ONLY the internal corrupt-record column of a raw scan
    (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — materializing through cache is
    the documented contract for reading the quarantine side.
    """
    df = df.cache()
    good = df.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    bad = df.filter(F.col("_corrupt_record").isNotNull()).select("_corrupt_record")
    return good, bad


def read_text_corpus(spark: SparkSession, path: str) -> DataFrame:
    """Plain-text reader: one row per line, tagged with the source file
    and a deterministic per-file line number (the provenance columns a
    training pipeline needs for dedup lineage and filtering audits)."""
    from pyspark.sql import Window as W

    lines = spark.read.text(path).select(
        F.col("value").alias("text"),
        F.input_file_name().alias("source_file"),
    )
    w = W.partitionBy("source_file").orderBy(F.monotonically_increasing_id())
    return lines.withColumn("line_no", F.row_number().over(w))


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSONL sink (newline-delimited JSON part files)."""
    df.write.mode(mode).json(path)


def read_xml(
    spark: SparkSession, path: str, row_tag: str = "row"
) -> DataFrame:
    """XML source via Spark 4's NATIVE xml data source (spark-xml was
    merged upstream in 4.0 — no external jar, unlike Avro/Kafka which
    stay import-gated here). Schema is inferred per element under
    ``row_tag``; pass an explicit ``.schema(...)`` upstream when scans
    must prune (XML is row-wise text — at 100 TB prefer converting to
    parquet once and scanning that; this reader is the ingest edge,
    not the hot path)."""
    return spark.read.format("xml").option("rowTag", row_tag).load(path)


def write_xml(
    df: DataFrame, path: str, row_tag: str = "row", mode: str = "overwrite"
) -> None:
    """XML sink (native Spark 4 writer; one ``row_tag`` element per
    row). Complex types are nested elements; None fields are omitted —
    a read-back therefore infers the union of present fields."""
    df.write.mode(mode).format("xml").option("rowTag", row_tag).save(path)
