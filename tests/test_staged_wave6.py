"""Wave-6 catalog entries (plans/llm_ops5.py): value-level oracle
comparison at sf0.001 — the same gate tools/check_correctness.py
applies to the whole catalog, kept as pytest coverage after the
module's round-6 promotion into registry._QUERY_MODULES."""

from __future__ import annotations

import duckdb
import pytest

from airflow_scraping_etl_tutorial_spark.plans import llm_ops5  # noqa: F401  (registers)
from airflow_scraping_etl_tutorial_spark.plans.registry import _REGISTRY
from airflow_scraping_etl_tutorial_spark.sources.tables import TABLES

from staged_oracle import assert_matches_oracle, duck_views

SF_DIR = "/root/testdata/sf0.001"

STAGED = [
    "q184_session_shape_profile",
    "q185_dup_cluster_size_histogram",
    "q186_greedy_vs_transitive_dedup",
    "q187_neyman_allocation",
    "q188_late_arrival_audit",
    "q189_heaps_law_fit",
    "q190_value_outlier_audit",
    "q191_asof_tolerance_join",
    "q192_docs_embeddings_coverage",
    "q193_token_gini",
    "q194_pareto_skyline",
    "q195_mom_revenue_growth",
    "q196_hapax_rate_by_source",
    "q197_embedding_anisotropy_audit",
    "q198_knn_hubness_audit",
    "q199_psi_value_drift",
    "q200_session_entry_conversion",
    "q201_dup_graph_triangles",
    "q202_scd2_point_in_time_join",
    "q203_weighted_sample",
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


def test_wave6_registered_in_driver_contract(monkeypatch):
    """Round 6 promoted wave 6: the driver must see the wave without
    any SPARK_GRAFT_EXTRA_MODULES assistance. Membership + tiering
    only — position assertions broke when CORRECTNESS_r06 landed."""
    monkeypatch.delenv("SPARK_GRAFT_EXTRA_MODULES", raising=False)
    from staged_oracle import assert_live_and_tiered

    assert_live_and_tiered(STAGED, "llm_ops5")
