"""Source-path tests: the distributed (mapInPandas) TWSE backfill
fetcher with the HTTP call stubbed at the module seam (local mode runs
executors in-process, so the monkeypatch reaches the UDF), and the
table catalog's events ns->µs conversion."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import airflow_scraping_etl_tutorial_spark.sources.twse as twse
from airflow_scraping_etl_tutorial_spark.pipeline.investment import (
    clean_long,
    pivot_to_sink_schema,
)
from airflow_scraping_etl_tutorial_spark.sources.golden import GOLDEN_CLOSED, GOLDEN_OK
from airflow_scraping_etl_tutorial_spark.sources.tables import load

SF_DIR = "/root/testdata/sf0.001"


def test_distributed_backfill_fetch(spark, monkeypatch):
    """A 3-day backfill through the executor-side fan-out: each date is
    fetched in a mapInPandas batch; a failing day degrades to a
    null-stat row (alert route), not a job failure."""
    payloads = {"20220819": GOLDEN_OK, "20220820": GOLDEN_CLOSED}

    def fake_fetch(url: str, timeout: float = 30.0) -> dict:
        date = url.rsplit("=", 1)[-1]
        if date == "20990101":
            raise OSError("unreachable")
        return payloads[date]

    monkeypatch.setattr(twse, "_http_get_json", fake_fetch)
    df = twse.fetch_payloads_distributed(
        spark, ["20220819", "20220820", "20990101"]
    )
    rows = {r.date: r for r in df.collect()}
    assert rows["20220819"].stat == "OK"
    assert rows["20220820"].stat != "OK"
    assert rows["20990101"].stat is None  # failed fetch -> null-stat row

    # and the good day flows through the normal transform unchanged
    wide = pivot_to_sink_schema(clean_long(df))
    assert wide.count() == 1
    assert wide.first().dt == "20220819"


def test_events_ts_microsecond_conversion(spark):
    """tables.load converts TIMESTAMP(NANOS) -> TimestampType exactly
    (integer ns->µs division, cross-checked against DuckDB's reading
    of the same file)."""
    import duckdb

    e = load(spark, SF_DIR, "events")
    assert dict(e.dtypes)["ts"] == "timestamp"
    got = {
        r.event_id: r.us
        for r in e.select("event_id", F.unix_micros("ts").alias("us"))
        .orderBy("event_id")
        .limit(5)
        .collect()
    }
    duck = dict(
        duckdb.sql(
            f"SELECT event_id, CAST(EPOCH_US(ts) AS BIGINT) FROM "
            f"read_parquet('{SF_DIR}/events.parquet') ORDER BY event_id LIMIT 5"
        ).fetchall()
    )
    assert got == duck
