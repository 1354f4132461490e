"""SQL UDFs (operators/udx.py::register_sql_udfs): the engine-native
UDF kind — the body inlines at analysis time, so the plan must contain
ZERO Python-eval nodes, and the P3/P8 semantics must match the
pipeline's expression forms on reference-shaped values."""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import Row


def _register(spark):
    from airflow_scraping_etl_tutorial_spark.operators.udx import (
        register_sql_udfs,
    )

    register_sql_udfs(spark)


def test_de_comma_money_matches_python_reference(spark):
    _register(spark)
    vals = ["1,234", "0", "12,345,678,901,234,567", "7", "abc", None, "1,2,3"]
    df = spark.createDataFrame([Row(s=v) for v in vals])
    df.createOrReplaceTempView("_decomma_in")
    got = {
        r.s: r.v
        for r in spark.sql(
            "SELECT s, de_comma_money(s) AS v FROM _decomma_in"
        ).collect()
    }
    for v in vals:
        if v is None or not v.replace(",", "").isdigit():
            assert got[v] is None, v
        else:
            assert got[v] == Decimal(v.replace(",", "")), v


def test_is_market_open_matches_reference_branch(spark):
    _register(spark)
    from airflow_scraping_etl_tutorial_spark.sources.golden import (
        GOLDEN_CLOSED,
        GOLDEN_OK,
    )

    rows = spark.sql(
        "SELECT is_market_open(:ok) AS a, is_market_open(:closed) AS b",
        args={"ok": GOLDEN_OK["stat"], "closed": GOLDEN_CLOSED["stat"]},
    ).collect()[0]
    assert rows.a is True and rows.b is False


def test_sql_udf_inlines_with_no_python_nodes(spark):
    """The defining property of the SQL UDF kind: calls are Catalyst
    expressions, not Python workers — no BatchEvalPython /
    ArrowEvalPython in the executed plan."""
    _register(spark)
    df = spark.createDataFrame([Row(s="1,234")]).selectExpr(
        "de_comma_money(s) AS v", "is_market_open('OK') AS o"
    )
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
