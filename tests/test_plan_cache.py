"""The r14 load() plan cache (sources/tables.py): repeated loads of an
unchanged fixture reuse the SAME DataFrame plan (skipping the per-call
listing + footer schema inference), while overwriting the fixture
invalidates the entry via the mtime key — a stale plan must never
serve a rewritten file."""

from __future__ import annotations

import os
import time

import pyarrow as pa
import pyarrow.parquet as pq

from airflow_scraping_etl_tutorial_spark.sources import tables


def _write_orders(path: str, keys: list[int]) -> None:
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(keys, pa.int64()),
                "o_totalprice": pa.array([float(k) for k in keys], pa.float64()),
            }
        ),
        path,
    )


def test_repeated_load_reuses_plan(spark, sf_dir):
    a = tables.load(spark, sf_dir, "nation")
    b = tables.load(spark, sf_dir, "nation")
    assert a is b  # identical plan object: no re-listing, no footer read


def test_overwrite_invalidates_cache(spark, tmp_path):
    p = str(tmp_path / "orders.parquet")
    _write_orders(p, [1, 2, 3])
    first = tables.load(spark, str(tmp_path), "orders")
    assert first.count() == 3
    # ensure the rewrite lands a strictly newer mtime_ns even on coarse
    # filesystem timestamp granularity
    time.sleep(0.02)
    _write_orders(p, [1, 2, 3, 4, 5])
    os.utime(p)
    second = tables.load(spark, str(tmp_path), "orders")
    assert second is not first
    assert second.count() == 5


def test_rewrite_evicts_superseded_entries(spark, tmp_path):
    """Rewriting a fixture N times leaves exactly ONE cache entry for
    the path (r15: superseded mtime keys are evicted on insert — a
    long-lived session must not accumulate dead plans)."""
    p = str(tmp_path / "orders.parquet")
    for n in (2, 3, 4):
        time.sleep(0.02)
        _write_orders(p, list(range(n)))
        os.utime(p)
        tables.load(spark, str(tmp_path), "orders")
    entries = [
        k
        for k in tables._PLAN_CACHE
        if k[0] == id(spark) and k[1] == p
    ]
    assert len(entries) == 1


def test_cache_result_still_recomputes_from_files(spark, sf_dir):
    """The cache holds PLANS, not results: two actions on the cached
    DataFrame both execute (no persisted blocks are created)."""
    df = tables.load(spark, sf_dir, "region")
    n1 = df.count()
    n2 = tables.load(spark, sf_dir, "region").count()
    assert n1 == n2 > 0
    assert not df.storageLevel.useMemory and not df.storageLevel.useDisk
