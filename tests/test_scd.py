"""SCD2 / merge-emulation tests with hand-checkable histories."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from airflow_scraping_etl_tutorial_spark.operators.scd import merge_upsert, scd2_apply


def test_merge_upsert_semantics(spark):
    current = spark.createDataFrame(
        [Row(k=1, v="a"), Row(k=2, v="b"), Row(k=3, v="c")]
    )
    updates = spark.createDataFrame([Row(k=2, v="B2"), Row(k=4, v="d")])
    out = {r.k: r.v for r in merge_upsert(current, updates, "k").collect()}
    assert out == {1: "a", 2: "B2", 3: "c", 4: "d"}


def test_merge_upsert_idempotent(spark):
    current = spark.createDataFrame([Row(k=1, v="a")])
    updates = spark.createDataFrame([Row(k=1, v="A")])
    once = merge_upsert(current, updates, "k")
    twice = merge_upsert(once, updates, "k")
    assert [(r.k, r.v) for r in twice.collect()] == [(1, "A")]


def test_scd2_builds_versioned_history(spark):
    day = lambda d: f"2024-01-0{d}"  # noqa: E731
    snap = lambda d, price: Row(part_id=7, price=price, snap_date=day(d))  # noqa: E731
    updates = spark.createDataFrame(
        [snap(1, 10.0), snap(2, 10.0), snap(3, 12.0), snap(4, 12.0), snap(5, 11.0)]
    ).withColumn("snap_date", F.to_date("snap_date"))

    hist = scd2_apply(
        None, updates, key="part_id", effective_ts="snap_date", tracked_cols=("price",)
    ).orderBy("effective_from")
    rows = hist.collect()
    # 3 versions: 10.0 (d1-d3), 12.0 (d3-d5), 11.0 (d5-open)
    assert [(r.price, str(r.effective_from), r.effective_to and str(r.effective_to), r.is_current) for r in rows] == [
        (10.0, "2024-01-01", "2024-01-03", False),
        (12.0, "2024-01-03", "2024-01-05", False),
        (11.0, "2024-01-05", None, True),
    ]


def test_scd2_incremental_application(spark):
    updates1 = spark.createDataFrame(
        [Row(part_id=1, price=10.0, snap_date="2024-01-01")]
    ).withColumn("snap_date", F.to_date("snap_date"))
    hist1 = scd2_apply(None, updates1, "part_id", "snap_date", ("price",))

    updates2 = spark.createDataFrame(
        [Row(part_id=1, price=15.0, snap_date="2024-02-01")]
    ).withColumn("snap_date", F.to_date("snap_date"))
    hist2 = scd2_apply(hist1, updates2, "part_id", "snap_date", ("price",)).orderBy(
        "effective_from"
    )
    rows = hist2.collect()
    assert len(rows) == 2
    assert rows[0].price == 10.0 and not rows[0].is_current
    assert str(rows[0].effective_to) == "2024-02-01"
    assert rows[1].price == 15.0 and rows[1].is_current


def test_scd2_null_moves_detected(spark):
    """Updates that only move/null values across tracked columns must
    open a new version (regression: a raw xxhash64 fingerprint skips
    NULL inputs, so (X, NULL) -> (NULL, X) hashed identically and the
    change was dropped as 'unchanged')."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("a", T.StringType()),
            T.StructField("b", T.StringType()),
            T.StructField("ts", T.StringType()),
        ]
    )
    updates = spark.createDataFrame(
        [(1, "X", None, "2024-01-01"), (1, None, "X", "2024-01-02")], schema
    ).withColumn("ts", F.to_date("ts"))
    hist = scd2_apply(None, updates, key="k", effective_ts="ts", tracked_cols=("a", "b"))
    assert hist.count() == 2  # the value-move IS a change


def test_scd2_nulling_a_column_detected(spark):
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("a", T.StringType()),
            T.StructField("ts", T.StringType()),
        ]
    )
    updates = spark.createDataFrame(
        [(1, "X", "2024-01-01"), (1, None, "2024-01-02")], schema
    ).withColumn("ts", F.to_date("ts"))
    hist = scd2_apply(None, updates, key="k", effective_ts="ts", tracked_cols=("a",))
    assert hist.count() == 2
