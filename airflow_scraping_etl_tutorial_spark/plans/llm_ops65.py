"""LLM-ops wave 66 (STAGED for round-11 registration): driver stamps
for the two Spark-4-native engine surfaces round 10 added —

- q438: VARIANT JSON extraction — each order row is serialized to a
  JSON document and read back through Spark's native VARIANT type
  (``parse_json`` once, typed ``variant_get`` path reads including an
  array index and an array length), vs DuckDB building and extracting
  the same document with its json functions. Proves the shredded
  binary path yields the SAME typed scalars as string-based JSON
  access — the engine surface q40-q42 (from_json / get_json_object)
  do NOT cover.
- q439: SQL-UDF de-comma pipeline — the P3 scrub as a pure-Catalyst
  SQL UDF (operators/udx.py::register_sql_udfs) applied to
  comma-grouped money strings built with format_number, summed per
  order status in Decimal(38,0). The oracle replays the full
  format -> replace -> cast round-trip with DuckDB's format('{:,}').
  Proves the CREATE FUNCTION ... RETURN expression kind computes
  identically to the inline expression — with zero Python workers
  (plan property asserted in tests/test_sql_udfs.py).

This module is in registry.STAGED_MODULES, not yet _QUERY_MODULES
(same staging protocol as waves 12-65): value-checked via

    SPARK_GRAFT_EXTRA_MODULES=airflow_scraping_etl_tutorial_spark.plans.llm_ops65 \\
        python tools/check_correctness.py /root/testdata/sf0.01

and by tests/test_staged_wave66.py; round 11 promotes it with one line.

Output-hardening doctrine (as waves 6-65): the JSON round-trip
compares typed extractions (string / DECIMAL(18,2) / int), never raw
JSON text (key order and whitespace are engine-specific); money stays
in the decimal lane end-to-end (decimal cents, Decimal(38,0) sums);
every aggregate is cast on BOTH sides (DuckDB SUM(BIGINT) is HUGEINT
— the round-6 lesson).

Reference parity: the reference's crawl step positionally indexes the
TWSE JSON document (dags/scrapy_develop.ipynb cell-2) and its clean
step strips thousands separators with str.replace (cell-4 /
dags/Final_app.py:52-58); q438/q439 are those two hops on the engine's
newest native surfaces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load
from .registry import query

_KEY_CAP = 2048  # bounded deterministic slice of the dense orderkey space


@query(
    "q438_variant_json_extraction",
    oracle=f"""
    WITH js AS (
      SELECT o_orderkey,
             json_object('status', o_orderstatus,
                         'total', CAST(o_totalprice AS DECIMAL(18,2)),
                         'tags', json_array(o_orderstatus, o_orderpriority))
               AS doc
      FROM orders
      WHERE o_orderkey <= {_KEY_CAP}
    )
    SELECT o_orderkey,
           json_extract_string(doc, '$.status') AS status,
           CAST(json_extract(doc, '$.total') AS DECIMAL(18,2)) AS total,
           json_extract_string(doc, '$.tags[1]') AS prio_tag,
           CAST(json_array_length(json_extract(doc, '$.tags')) AS INT)
             AS n_tags
    FROM js
    ORDER BY o_orderkey
    """,
    tags=("json", "variant", "semistructured"),
)
def q438_variant_json_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serialize -> parse_json once -> typed variant_get reads. Each
    engine builds its OWN document from the same base rows and
    extracts typed scalars, so key order / whitespace differences in
    the serialized text cannot leak into the comparison. Money enters
    the attested DOUBLE -> DECIMAL(18,2) lane BEFORE serialization, so
    the decimal survives the JSON number round-trip exactly on both
    sides; the array path read and array_size cover the non-scalar
    access shapes. Scale: one parse per row, then O(1) shredded path
    reads — no re-parse per field, unlike chained get_json_object."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= _KEY_CAP)
    js = o.select(
        "o_orderkey",
        F.to_json(
            F.struct(
                F.col("o_orderstatus").alias("status"),
                F.col("o_totalprice").cast("decimal(18,2)").alias("total"),
                F.array(
                    F.col("o_orderstatus"), F.col("o_orderpriority")
                ).alias("tags"),
            )
        ).alias("doc"),
    )
    v = F.parse_json(F.col("doc"))
    return js.select(
        "o_orderkey",
        F.variant_get(v, "$.status", "string").alias("status"),
        F.variant_get(v, "$.total", "decimal(18,2)").alias("total"),
        F.variant_get(v, "$.tags[1]", "string").alias("prio_tag"),
        F.array_size(F.variant_get(v, "$.tags", "array<variant>")).alias(
            "n_tags"
        ),
    ).orderBy("o_orderkey")


@query(
    "q439_sql_udf_decomma_totals",
    oracle="""
    SELECT o_orderstatus AS status,
           CAST(SUM(CAST(replace(format('{:,}',
                  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)),
                  ',', '')
                AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS total_cents,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders
    GROUP BY 1
    ORDER BY 1
    """,
    tags=("sql-udf", "decimal", "string"),
)
def q439_sql_udf_decomma_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's de-comma scrub (Final_app.py:52-58 str.replace)
    as a SQL UDF inside a full aggregation: exact cents are formatted
    WITH thousands separators (format_number), scrubbed back through
    de_comma_money (CREATE FUNCTION ... RETURN — inlined by Catalyst,
    zero Python), and summed in Decimal(38,0) per order status. The
    oracle replays the identical format -> replace -> cast round-trip
    with DuckDB's format('{:,}'), so a UDF that mangled any grouping
    edge (0, <1000, 15-digit values) would hash-mismatch."""
    from ..operators.udx import register_sql_udfs

    register_sql_udfs(spark)
    o = load(spark, sf_dir, "orders")
    commified = o.select(
        F.col("o_orderstatus").alias("status"),
        F.format_number(
            (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast(
                "bigint"
            ),
            0,
        ).alias("cents_str"),
    )
    return (
        commified.selectExpr("status", "de_comma_money(cents_str) AS cents")
        .groupBy("status")
        .agg(
            F.sum("cents").cast("decimal(38,0)").alias("total_cents"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("status")
    )
