"""Sink tests: CSV, partitioned parquet, idempotent day overwrite, and
the gated JDBC path (no driver jar in this container — the error must be
clear, not a silent no-op)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from airflow_scraping_etl_tutorial_spark.sources.sinks import (
    overwrite_day_partitions,
    read_jdbc,
    write_csv,
    write_parquet_partitioned,
)
from airflow_scraping_etl_tutorial_spark.sources.tables import load

SF_DIR = "/root/testdata/sf0.001"


def test_csv_sink_round_trip(spark, tmp_path):
    nation = load(spark, SF_DIR, "nation")
    write_csv(nation, str(tmp_path / "csv"), mode="overwrite")
    back = spark.read.option("header", "true").option("inferSchema", "true").csv(
        str(tmp_path / "csv")
    )
    assert back.count() == nation.count()
    assert set(back.columns) == set(nation.columns)


def test_partitioned_parquet_and_day_overwrite(spark, tmp_path):
    path = str(tmp_path / "months")
    orders = load(spark, SF_DIR, "orders").withColumn(
        "dt", F.date_format("o_orderdate", "yyyyMM")
    )
    two_months = orders.filter(F.col("dt").isin("199506", "199507"))
    assert two_months.count() > 4
    write_parquet_partitioned(two_months, path, ("dt",), mode="overwrite")
    n_before = spark.read.parquet(path).count()

    # rerun month 1 with HALF its rows: dynamic overwrite must replace
    # only that partition (fewer rows), leaving month 2 untouched
    m1 = orders.filter(F.col("dt") == "199506")
    half = m1.limit(max(m1.count() // 2, 1))
    overwrite_day_partitions(half, path)
    after = spark.read.parquet(path)
    assert after.filter(F.col("dt") == 199507).count() == two_months.filter(
        F.col("dt") == "199507"
    ).count()
    assert after.count() < n_before


def test_jdbc_gated_with_clear_error(spark):
    with pytest.raises(Exception, match="(?i)driver|jdbc|class"):
        read_jdbc(spark, "jdbc:postgresql://nowhere/db", "t").collect()
