"""SparkSession factory.

Scale posture: these configs are the local[N] test harness defaults; on a
real cluster the same builder is used but master/memory come from
spark-submit. The knobs that matter at 100 TB are set here declaratively
so every entry point (tests, bench, driver harness) gets the same plan
behavior:

- AQE on (runtime shuffle-partition coalescing, skew-join splitting,
  broadcast demotion/promotion) — replaces hand-tuned partition counts.
- shuffle.partitions sized to cores locally; AQE coalesces down, and on
  a big cluster the initial number is raised by config, not code.
- Arrow on: every pandas_udf / applyInPandas boundary is Arrow-batched.
- Session timezone pinned to UTC so timestamp semantics are identical to
  the DuckDB oracle (duckdb timestamps are UTC-naive).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "airflow_scraping_etl_tutorial_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's standard config.

    ``SPARK_GRAFT_CPUS`` (driver contract) controls local parallelism;
    defaults to all cores.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", "32"))

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
        # Files: pack small test files into few tasks; at 100 TB this is
        # the knob that bounds scan-task count (default 128MB is kept on
        # clusters; local override keeps task count sane for tiny SFs).
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        # Parquet TIMESTAMP(NANOS) (the events fixture) is otherwise
        # unreadable by Spark; read as long and convert in the loader.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    # Extra driver jars (e.g. the Postgres JDBC driver for the
    # reference's real sink — tests/test_postgres_live.py). Comma-
    # separated jar paths; only effective for the process that CREATES
    # the session, like every other builder config.
    extra_jars = os.environ.get("SPARK_GRAFT_EXTRA_JARS")
    if extra_jars:
        builder = builder.config("spark.jars", extra_jars)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
