"""Registry of (name -> QuerySpec) used by the driver contract.

Register with the ``@query`` decorator::

    @query("q_foo", oracle="SELECT ...")
    def q_foo(spark, sf_dir) -> DataFrame: ...

Rules enforced by convention (driver compare is column-name sorted +
value-hashed):
- every computed/aggregate column is aliased identically on both sides;
- money aggregates are rounded to 2 decimals on both sides (double sums
  are order-dependent in the last ulp; rounding makes them comparable);
- timestamps are projected as DATE or formatted string on both sides
  (Spark timestamps are session-TZ instants, DuckDB's are naive).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, "QuerySpec"] = {}

# Modules that register queries on import (order = SURVEY.md §2 order).
_QUERY_MODULES = (
    "airflow_scraping_etl_tutorial_spark.plans.relational",
    "airflow_scraping_etl_tutorial_spark.plans.relational2",
    "airflow_scraping_etl_tutorial_spark.plans.functions_catalog",
    "airflow_scraping_etl_tutorial_spark.plans.twse_queries",
    "airflow_scraping_etl_tutorial_spark.plans.llm_ops",
    "airflow_scraping_etl_tutorial_spark.plans.streaming_queries",
)


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: SparkQuery
    oracle: str | None  # None => non-SQL-expressible; driver does rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: register a (spark, sf_dir) -> DataFrame query builder."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, doc=(fn.__doc__ or "").strip(), tags=tags
        )
        return fn

    return deco


def all_queries() -> dict[str, QuerySpec]:
    """Import all catalog modules and return the full registry."""
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)
    return dict(_REGISTRY)
