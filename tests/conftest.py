from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, "/root/repo")

from airflow_scraping_etl_tutorial_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"

# --- Test tiering (r14 VERDICT item 2) -------------------------------
#
# The full suite has grown past the driver's verification window (1312
# tests / ~53 min at r14 — VERIFY_r14 truncated at ~76% with zero
# failures, leaving test status unattestable). The DEFAULT run
# (`python -m pytest tests/ -x -q`, the driver's command) therefore
# executes the FAST tier only: the contract surface — registry/bench
# gate/plan cache/vectorized-kernel pinning/operator semantics/TWSE
# pipeline — in well under 10 minutes. The SLOW tier (marked-skipped by
# default, visible as `s` in the output) is the per-wave oracle
# value-comparison files plus the whole-catalog smoke and the heaviest
# integration files, all of which duplicate coverage the driver attests
# separately through CORRECTNESS_rN / tools/check_correctness.py
# sweeps.
#
# Full-suite cadence: run before promoting a wave or cutting a round —
#     SPARK_GRAFT_FULL_TESTS=1 python -m pytest tests/ -q
# (same command the r14-and-earlier rounds ran by default).
_SLOW_FILES = frozenset(
    {
        # whole-catalog smoke: every one of the 462 queries executes
        # (~16 min) — the check_correctness sweeps run them all WITH
        # value verification, so the fast tier keeps only the
        # registry/metadata checks
        "test_catalog.py",
        # stream==batch equivalence integration runs (~4.5 min)
        "test_streaming.py",
        # whole-catalog oracle linting (DuckDB parse of all 462 oracle
        # texts, ~2 min) — re-verified by every check_correctness run
        "test_oracle_lint.py",
        # heavyweight property/integration files (30-70 s each)
        "test_property_dedup.py",
        "test_multimodal.py",
        "test_notify_datasource.py",
    }
)


def pytest_collection_modifyitems(config, items):
    if os.environ.get("SPARK_GRAFT_FULL_TESTS"):
        return
    skip = pytest.mark.skip(
        reason="slow tier — run with SPARK_GRAFT_FULL_TESTS=1 (full-suite cadence)"
    )
    for item in items:
        base = os.path.basename(str(item.fspath))
        if base.startswith("test_staged_wave") or base in _SLOW_FILES:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
