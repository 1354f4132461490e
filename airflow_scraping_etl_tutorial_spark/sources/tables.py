"""Table catalog over the driver fixtures (TESTDATA.md).

Spark reads the parquet footers directly — schema comes from the file,
filters and projections are pushed into the scan by Catalyst (check with
``df.explain``: ``PushedFilters`` / ``ReadSchema``). At 100 TB the same
loader points at a partitioned directory tree and partition pruning
applies; nothing here changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at ANY scale factor (TPC-H
# dims scale with SF but region/nation are constant; customer/supplier/
# part stay well under executor memory until extreme SFs — AQE demotes
# the hint if runtime stats disagree).
BROADCAST_DIMS = frozenset({"region", "nation"})


def ensure_session_defaults(spark: SparkSession) -> None:
    """Pin the runtime-settable confs every catalog query depends on.

    Queries must be correct even when the CALLER built the session (the
    driver harness does) — session.py's builder defaults only cover our
    own entry points. All three are runtime-settable SQLConfs:
    - nanosAsLong: some fixture drops land events.ts as parquet
      TIMESTAMP(NANOS), unreadable by Spark otherwise (harmless when
      the fixture is µs-typed — load() normalizes either way);
    - session timezone UTC: timestamp formatting must agree with the
      UTC-naive DuckDB oracle;
    - AQE on (default since 3.2, pinned anyway — plans are designed
      around runtime coalescing/skew handling).
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table as a DataFrame.

    Contract: events.ts is ALWAYS TimestampType (an instant) after
    load(), regardless of the on-disk representation. Fixture drops
    have landed ts three different ways across rounds:

    - parquet TIMESTAMP(NANOS): Spark reads it only as a raw long
      (nanosAsLong, pinned by ensure_session_defaults). Convert
      ns -> µs with exact integer division (`div`, not `/` — a double
      division loses precision above 2^53); the values carry only µs
      precision so truncation is lossless.
    - parquet timestamp[us] without timezone: Spark 4 reads this as
      TIMESTAMP_NTZ, which instant functions (unix_micros,
      window, from_utc_timestamp) reject. Cast to TimestampType —
      the session timezone is pinned UTC (ensure_session_defaults),
      so the wall-clock values are reinterpreted as UTC instants,
      identical to what the UTC-naive DuckDB oracle computes.
    - parquet timestamp[us] with timezone: already TimestampType;
      the cast is a no-op.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    ensure_session_defaults(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        ts_dtype = dict(df.dtypes).get("ts")
        if ts_dtype == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_dtype is not None and ts_dtype != "timestamp":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view (for SQL-form queries)."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
