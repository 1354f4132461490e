"""VARIANT-path JSON access (functions/semistructured.py): the
schema-free extraction must agree with the typed from_json path on the
golden TWSE payloads, malformed documents must quarantine instead of
failing the scan, and typed path access must degrade to NULL (not
error) on schema drift. Also pins Spark 4 collation semantics the text
operators could lean on (UNICODE_CI grouping == lower() grouping for
ASCII corpora)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from airflow_scraping_etl_tutorial_spark.functions.semistructured import (
    to_variant,
    variant_payload_fields,
    variant_quarantine,
)
from airflow_scraping_etl_tutorial_spark.sources.golden import (
    GOLDEN_CLOSED,
    GOLDEN_OK,
)
from airflow_scraping_etl_tutorial_spark.sources.twse import payloads_to_df


def test_variant_fields_agree_with_typed_path(spark):
    payloads = [GOLDEN_OK, GOLDEN_CLOSED]
    raw = spark.createDataFrame(
        [Row(doc=json.dumps(p, ensure_ascii=False)) for p in payloads]
    )
    got = {
        r.stat: (r.title, r.date, r.n_rows)
        for r in variant_payload_fields(raw, "doc").collect()
    }
    want = {
        r.stat: (r.title, r.date, len(r.data) if r.data is not None else None)
        for r in payloads_to_df(spark, payloads).collect()
    }
    assert got == want


def test_variant_quarantine_splits_malformed(spark):
    raw = spark.createDataFrame(
        [
            Row(doc='{"stat": "OK"}'),
            Row(doc="{not json at all"),
            Row(doc='{"stat": "OK", "date": "20220819"}'),
        ]
    )
    good, bad = variant_quarantine(raw, "doc")
    assert good.count() == 2
    assert [r.doc for r in bad.collect()] == ["{not json at all"]


def test_variant_typed_access_drifts_to_null(spark):
    """A path that is absent or of the wrong type yields NULL through
    variant_get's typed read — drift degrades per-field, it does not
    fail the scan (the advantage over a closed from_json schema)."""
    raw = spark.createDataFrame([Row(doc='{"stat": 7, "data": "oops"}')])
    out = raw.select(
        F.variant_get(to_variant(F.col("doc")), "$.title", "string").alias("t"),
        F.variant_get(
            to_variant(F.col("doc")), "$.stat", "string"
        ).alias("s"),  # int coerces to string
    ).collect()[0]
    assert out.t is None
    assert out.s == "7"


def test_parse_json_strict_raises_on_malformed(spark):
    raw = spark.createDataFrame([Row(doc="{broken")])
    with pytest.raises(Exception, match="(?i)json|variant|malformed"):
        raw.select(to_variant(F.col("doc"))).collect()


def test_unicode_ci_collation_groups_like_lower(spark):
    """Spark 4 collations: grouping on a UNICODE_CI-collated column
    merges case variants exactly as grouping on lower() does — the
    engine-native form of the text operators' case folding."""
    df = spark.createDataFrame(
        [Row(w=x) for x in ["Alpha", "ALPHA", "alpha", "Beta", "beta", "gamma"]]
    )
    via_collate = {
        r.k.lower(): r.n
        for r in df.groupBy(
            F.collate(F.col("w"), "UNICODE_CI").alias("k")
        ).agg(F.count("*").alias("n")).collect()
    }
    via_lower = {
        r.k: r.n
        for r in df.groupBy(F.lower("w").alias("k"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert via_collate == via_lower == {"alpha": 3, "beta": 2, "gamma": 1}
