"""Semi-structured JSON access via Spark 4's native VARIANT type.

The reference extracts fields from the TWSE JSON document with
positional dict access (scrapy_develop.ipynb cell-2 — S2 in SURVEY §2);
this repo's primary path is the typed ``from_json(PAYLOAD_SCHEMA)``
in sources/twse.py. VARIANT (new in Spark 4.0) is the third option and
the right one when the payload schema is NOT fixed: the document is
parsed ONCE into a binary-shredded column, and each ``variant_get``
path access is evaluated against that encoding — no re-parse per field,
no up-front StructType to maintain, unlike chained
``get_json_object`` (re-parses the string per call) or ``from_json``
(fails closed on drift).

100 TB posture: variant columns store in parquet like any other binary
column and are Arrow-transferable; path extraction is JVM-side
whole-stage codegen (no UDF). Schema drift lands as NULL at the typed
``variant_get`` boundary (or is quarantined at parse time with
``try_parse_json``) instead of poisoning the whole file scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def to_variant(json_str: Column, strict: bool = True) -> Column:
    """Parse a JSON string column into a VARIANT column.

    strict=True (``parse_json``) raises on malformed input — right for
    trusted upstreams where corruption must fail loudly. strict=False
    (``try_parse_json``) yields NULL instead — pair it with
    ``variant_quarantine`` for the JSONL-style good/bad split.
    """
    return F.parse_json(json_str) if strict else F.try_parse_json(json_str)


def variant_quarantine(
    df: DataFrame, json_col: str, out_col: str = "v"
) -> tuple[DataFrame, DataFrame]:
    """(good, bad) split: rows whose JSON parses land in ``good`` with
    a VARIANT column ``out_col``; malformed rows land in ``bad``
    untouched (the corrupt-record quarantine pattern of
    sources/corpus.py::jsonl_quality_split, at expression level)."""
    parsed = df.withColumn(out_col, F.try_parse_json(F.col(json_col)))
    good = parsed.filter(F.col(out_col).isNotNull())
    bad = parsed.filter(F.col(out_col).isNull()).drop(out_col)
    return good, bad


def variant_payload_fields(
    df: DataFrame, json_col: str, strict: bool = True
) -> DataFrame:
    """Schema-free extraction of the TWSE payload's scalar fields plus
    the row count of its ``data`` grid — the VARIANT counterpart of
    sources/twse.py::payloads_to_df's typed path (reference:
    scrapy_develop.ipynb cell-2 reads the same four things
    positionally). One parse, four path reads.

    strict=False parses with ``try_parse_json`` so a malformed
    document yields an all-NULL row instead of failing the scan — the
    single-pass form of the quarantine posture (use
    ``variant_quarantine`` when the malformed rows themselves are
    needed)."""
    v = to_variant(F.col(json_col), strict=strict)
    return df.select(
        F.variant_get(v, "$.stat", "string").alias("stat"),
        F.variant_get(v, "$.title", "string").alias("title"),
        F.variant_get(v, "$.date", "string").alias("date"),
        F.array_size(
            F.variant_get(v, "$.data", "array<variant>")
        ).alias("n_rows"),
    )
