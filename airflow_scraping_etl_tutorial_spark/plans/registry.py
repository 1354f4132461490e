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


# Queries with a fully-green row in CORRECTNESS_r01.json. The round-1
# driver evaluated exactly the first 50 entries of ``queries()`` in dict
# order before its budget cut off, leaving 42 catalog entries with no
# correctness row at all. ``all_queries()`` therefore yields entries in
# driver-priority tiers (registration order within each tier), so a
# budget-capped driver run spends its rows where they add signal:
#   tier 0 — no driver row yet AND explicitly flagged by VERDICT.md
#            (round-1 reds q29/q54/q87, array/JSON/math q35-q42, TWSE
#            q50-q53, LLM-data q60-q92, streaming q80-q84, multimodal
#            q93);
#   tier 1 — round-2 additions with no driver row (q94-q102);
#   tier 2 — already-attested round-1 greens.
_ROUND1_GREEN = frozenset(
    f"q{i:02d}" for i in [*range(1, 29), *range(30, 35), *range(43, 50), *range(55, 60), 88, 89]
)
_ROUND2_EXTRA = frozenset(f"q{i}" for i in [*range(94, 99), 99, *range(100, 115)])


def _priority(name: str) -> int:
    key = name.split("_", 1)[0]
    if key in _ROUND1_GREEN:
        return 2
    if key in _ROUND2_EXTRA:
        return 1
    return 0


def all_queries() -> dict[str, QuerySpec]:
    """Import all catalog modules and return the full registry,
    driver-priority ordered (see _ROUND1_GREEN)."""
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)
    order = {n: i for i, n in enumerate(_REGISTRY)}
    names = sorted(_REGISTRY, key=lambda n: (_priority(n), order[n]))
    return {n: _REGISTRY[n] for n in names}
