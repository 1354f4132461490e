"""Staged wave-4 catalog entries (plans/llm_ops3.py): value-level
oracle comparison at sf0.001 — the same gate tools/check_correctness.py
applies to the live catalog, run in pytest because the module is not in
registry._QUERY_MODULES until round 4 (driver-budget staging; see the
module docstring)."""

from __future__ import annotations

import duckdb
import pytest

from airflow_scraping_etl_tutorial_spark.plans import llm_ops3  # noqa: F401  (registers)
from airflow_scraping_etl_tutorial_spark.plans.registry import _REGISTRY
from airflow_scraping_etl_tutorial_spark.sources.tables import TABLES

from staged_oracle import assert_matches_oracle, duck_views

SF_DIR = "/root/testdata/sf0.001"

STAGED = [
    "q142_table_checksum_reconciliation",
    "q143_ann_recall_audit",
    "q144_knn_label_agreement",
    "q145_langid_confusion",
    "q146_distinctive_terms",
    "q147_scd2_version_history",
    "q148_merge_upsert_audit",
    "q149_referential_integrity_audit",
    "q150_dataset_profile",
    "q151_label_centroid_separation",
    "q152_numeric_correlation_matrix",
    "q153_rfm_segmentation",
]


@pytest.fixture(scope="module")
def duck():
    con = duck_views(SF_DIR)
    yield con
    con.close()  # free DuckDB memory: 20+ live module connections
    # degrade the process allocator (the sharded-sweep lesson)




@pytest.mark.parametrize("name", STAGED)
def test_staged_query_matches_oracle(spark, duck, name):
    assert_matches_oracle(spark, duck, _REGISTRY[name], SF_DIR)


def test_staged_wave_promoted_into_driver_contract(monkeypatch):
    """Round 4 promoted the staged wave: llm_ops3 must be in the live
    registry (staging via SPARK_GRAFT_EXTRA_MODULES is over for it)."""
    monkeypatch.delenv("SPARK_GRAFT_EXTRA_MODULES", raising=False)
    from airflow_scraping_etl_tutorial_spark.plans.registry import _QUERY_MODULES

    assert "llm_ops3" in ",".join(_QUERY_MODULES)
