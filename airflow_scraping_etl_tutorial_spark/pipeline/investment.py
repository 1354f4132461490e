"""The reference ETL (scrape -> branch -> clean -> validate -> load ->
notify) re-expressed as ONE declarative Spark plan.

Reference lifecycle (dags/Final_app.py:79-149): five Airflow tasks with
XCom handoffs and Jinja-templated INSERTs. Engine lifecycle (SURVEY.md
§3.4): a single DataFrame flows

    payload -> filter(stat='OK') -> explode(data) -> drop 合計
            -> de-comma/cast Decimal(38,0) -> pivot to 13 columns
            -> validate -> idempotent write -> notify

Differences from the reference, by design:
- fetch once, not twice (Final_app.py:26 + :45 double-fetch);
- pivot keys on the 單位名稱 category VALUES, not row position
  (Final_app.py:50-66 breaks if TWSE reorders rows; we don't);
- money is DecimalType(38,0) not TEXT (exact arithmetic beyond float
  range — the reason the reference chose TEXT, README.md:292);
- loads are idempotent: dynamic partition overwrite on dt replaces
  any existing rows for the same day (the reference's retry policy
  double-inserts, Final_app.py:18 + no PK in create_table.sql);
- validation is a DataFrame predicate (P7), routing is driver control
  flow on action results (C1), notification is a callback (S7/S8).

Scale: a single day is one tiny document, but the same plan handles a
20-year backfill unchanged — explode/pivot/write are set-oriented and
the sink is partitioned by dt, so each day lands in its own partition
and reruns replace exactly that partition.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.twse import CATEGORIES, TOTAL_ROW_LABEL

EXPECTED_VALUES_PER_DAY = 12  # 4 categories x 3 measures (Final_app.py:53)

MONEY = "decimal(38,0)"

# Sink schema = reference create_table.sql:2-16, strongly typed.
SINK_COLUMNS = ("dt",) + tuple(
    f"{prefix}_{measure}" for _, prefix in CATEGORIES for measure in ("buy", "sell", "dif")
)


def clean_long(payloads: DataFrame) -> DataFrame:
    """Payload documents -> long-form (dt, unit_name, buy, sell, dif).

    Columnar re-expression of Final_app.py:48-51: explode the nested
    array (P4), drop the pre-aggregated 合計 row by VALUE not position
    (P1), strip thousands separators (P3), cast to exact decimals.
    Market-closed days (stat != 'OK', P8) simply produce no rows.
    """
    de_comma = lambda c: F.regexp_replace(c, ",", "").cast(MONEY)  # noqa: E731
    return (
        payloads.filter(F.col("stat") == "OK")
        .select(F.col("date").alias("dt"), F.explode("data").alias("row"))
        .select(
            "dt",
            F.col("row")[0].alias("unit_name"),
            de_comma(F.col("row")[1]).alias("buy"),
            de_comma(F.col("row")[2]).alias("sell"),
            de_comma(F.col("row")[3]).alias("dif"),
        )
        .filter(F.col("unit_name") != TOTAL_ROW_LABEL)
    )


def pivot_to_sink_schema(long_df: DataFrame) -> DataFrame:
    """Long (4 rows/day) -> wide (1 row/day, 13 columns): reference P5.

    Keys on the category value (robust to payload reordering). Explicit
    pivot value list: no distinct-scan job, stable column order.
    """
    labels = [label for label, _ in CATEGORIES]
    wide = (
        long_df.groupBy("dt")
        .pivot("unit_name", labels)
        .agg(F.first("buy").alias("buy"), F.first("sell").alias("sell"), F.first("dif").alias("dif"))
    )
    selects = [F.col("dt")]
    for label, prefix in CATEGORIES:
        for measure in ("buy", "sell", "dif"):
            selects.append(F.col(f"`{label}_{measure}`").alias(f"{prefix}_{measure}"))
    return wide.select(*selects)


def validate(long_df: DataFrame) -> DataFrame:
    """Schema-drift gate (reference P7: len(data)==12, Final_app.py:53)
    plus the dif=buy-sell invariant the source embeds (§1.2).

    Returns one row per dt with boolean verdicts; empty input -> empty
    output (the market-closed no-op, C2).
    """
    return (
        long_df.groupBy("dt")
        .agg(
            (F.count(F.lit(1)) * 3).alias("n_values"),
            F.sum(F.when(F.col("dif") != F.col("buy") - F.col("sell"), 1).otherwise(0)).alias(
                "n_bad_dif"
            ),
        )
        .select(
            "dt",
            "n_values",
            (F.col("n_values") == EXPECTED_VALUES_PER_DAY).alias("arity_ok"),
            (F.col("n_bad_dif") == 0).alias("dif_ok"),
        )
    )


@dataclass
class RunResult:
    """Outcome of one pipeline run (the engine's answer to the DAG's
    branch routes: loaded / market closed / validation alert)."""

    route: str  # 'loaded' | 'market_closed' | 'alert'
    days_loaded: int
    alerts: list[str]


def run_daily_load(
    spark: SparkSession,
    payloads: DataFrame,
    sink_path: str,
    notify: Callable[[str], None] | None = None,
) -> RunResult:
    """End-to-end daily load with branch semantics and idempotent write.

    Control flow (reference C1) happens HERE, on action results — not in
    the plan: Catalyst owns the dataflow, the driver owns routing.
    """
    long_df = clean_long(payloads).cache()  # reused by validate + pivot: fetch once (vs S1 double-fetch)
    try:
        checks = validate(long_df).collect()
        if not checks:
            # stat != 'OK' everywhere: market closed -> no-op (C2/DummyOperator).
            return RunResult(route="market_closed", days_loaded=0, alerts=[])

        bad = [r.dt for r in checks if not (r.arity_ok and r.dif_ok)]
        good_dts = [r.dt for r in checks if r.arity_ok and r.dif_ok]
        if bad and notify:
            # Reference S8: fixed-text Telegram alert '資料格式有變動...'
            notify(f"資料格式有變動，請確認資料格式: dt={sorted(bad)}")
        if not good_dts:
            return RunResult(route="alert", days_loaded=0, alerts=sorted(bad))

        wide = pivot_to_sink_schema(long_df.filter(F.col("dt").isin(good_dts)))
        # Idempotent daily append: partition-overwrite on dt (SURVEY §7
        # hard-part 1 — Delta MERGE without Delta). Rerunning a day
        # replaces exactly that day's partition; other days untouched.
        (
            wide.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("dt")
            .parquet(sink_path)
        )
        if notify:
            # Reference S7: success notification with the loaded date(s).
            notify(f"每日盤後資訊已完成更新: dt={sorted(good_dts)}")
        return RunResult(
            route="loaded" if not bad else "alert",
            days_loaded=len(good_dts),
            alerts=sorted(bad),
        )
    finally:
        long_df.unpersist()


def read_sink(spark: SparkSession, sink_path: str, dt: str | None = None) -> DataFrame:
    """Read back the sink (reference S3/S4). A dt filter prunes to one
    partition — the engine form of `SELECT * WHERE dt='20220819'`.

    dt is re-cast to string: Spark's partition-column type inference
    reads dt=20220819 directories back as int, which would silently
    change the sink schema between write and read.
    """
    df = spark.read.parquet(sink_path).withColumn("dt", F.col("dt").cast("string"))
    return df.filter(F.col("dt") == dt) if dt else df
