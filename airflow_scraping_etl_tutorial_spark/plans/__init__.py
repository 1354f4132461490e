"""Query catalog: every operator from SURVEY.md §2 as a named query.

Each entry pairs an idiomatic-PySpark plan builder with (where
SQL-expressible) an equivalent ANSI-SQL oracle string for DuckDB.
The driver harness (``__spark_entry__.py``) exposes both.
"""

from .registry import QuerySpec, all_queries, query

__all__ = ["QuerySpec", "all_queries", "query"]
