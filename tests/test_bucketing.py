"""Bucketed-table co-located join: writing both join sides bucketed on
the key lets the sort-merge join run with ZERO exchanges — the
pre-shuffled layout a 100 TB pipeline uses for its hottest repeated
join keys. This test proves the engine produces that plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from airflow_scraping_etl_tutorial_spark.sources.tables import load

SF_DIR = "/root/testdata/sf0.001"


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    # tables land in the session's default warehouse (./spark-warehouse,
    # gitignored); warehouse dir is a static conf and can't be moved here
    orders = load(spark, SF_DIR, "orders")
    lineitem = load(spark, SF_DIR, "lineitem")
    (
        orders.write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable("orders_b")
    )
    (
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey")
        .write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable("lineitem_b")
    )
    # disable broadcast so the join strategy is sort-merge over buckets
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("lineitem_b").join(
            spark.table("orders_b"), "o_orderkey"
        )
        n = joined.count()
        assert n == lineitem.count()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "ShuffleExchange" not in plan and "Exchange hashpartitioning" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64MB")
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")
