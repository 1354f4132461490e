"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-
insensitive value-hash -> CORRECTNESS_r{N}.json).

The actual catalog lives in
``airflow_scraping_etl_tutorial_spark/plans/`` — one registered entry
per operator from SURVEY.md §2 (relational, scalar functions, TWSE
pipeline semantics, LLM-data ops, streaming-in-batch-form).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from airflow_scraping_etl_tutorial_spark.plans import all_queries

SF_SMOKE_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    specs = all_queries()
    return specs["q01_flagship_revenue_by_region_year"].fn(spark, SF_SMOKE_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query — every catalog entry
    has one (round 2 eliminated all rows-only entries: LSH/ANN replay
    the same md5-derived hashes, the iterative clustering is mirrored
    by a recursive CTE, UDTF/UDAF/mapInPandas ops are re-expressed
    relationally)."""
    return {
        name: spec.oracle for name, spec in all_queries().items() if spec.oracle is not None
    }
