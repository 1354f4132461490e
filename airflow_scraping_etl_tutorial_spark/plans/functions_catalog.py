"""Scalar-function coverage (SURVEY.md §2.4-2.8: string / date / math /
array / map / JSON functions) as oracle-checked queries.

All expressions are built-in pyspark.sql.functions — JVM-side, inside
whole-stage codegen; no Python UDFs anywhere on these paths. Each query
exercises a function family end-to-end against the DuckDB oracle, with
cross-engine gotchas handled explicitly (regex flags, 1-based indexing,
rounding of libm results).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load
from .registry import query

# ---------------------------------------------------------------------------
# String functions  (reference P3 de-comma scrub, P8 equality — generalized)
# ---------------------------------------------------------------------------


@query(
    "q30_string_functions",
    oracle="""
    SELECT c_custkey,
           UPPER(c_name) AS name_upper,
           LOWER(c_mktsegment) AS seg_lower,
           LENGTH(c_name) AS name_len,
           SUBSTRING(c_name, 1, 8) AS name_prefix,
           CONCAT(c_mktsegment, '#', CAST(c_custkey AS VARCHAR)) AS seg_key,
           REPLACE(c_name, 'Customer', 'Cust') AS name_short,
           REGEXP_REPLACE(c_name, '[0-9]', '', 'g') AS name_nodigits,
           CAST(STRPOS(c_name, '#') AS INTEGER) AS hash_pos,
           TRIM(CONCAT(' ', c_mktsegment, ' ')) AS seg_trim,
           LPAD(CAST(c_custkey AS VARCHAR), 10, '0') AS key_padded,
           REVERSE(c_mktsegment) AS seg_rev
    FROM customer ORDER BY c_custkey
    """,
    tags=("functions", "string"),
)
def q30_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family: upper/lower/length/substring/concat/replace/
    regexp_replace/instr/trim/lpad/reverse.

    The reference's only string ops are `replace(',', '')` (P3) and fixed
    equality (P8); this generalizes the family. Note regexp_replace:
    Spark replaces ALL matches by default, DuckDB needs the 'g' flag —
    the oracle carries it."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.length("c_name").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.concat("c_mktsegment", F.lit("#"), F.col("c_custkey").cast("string")).alias(
            "seg_key"
        ),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("name_short"),
        F.regexp_replace("c_name", "[0-9]", "").alias("name_nodigits"),
        F.instr("c_name", "#").alias("hash_pos"),
        F.trim(F.concat(F.lit(" "), F.col("c_mktsegment"), F.lit(" "))).alias("seg_trim"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("key_padded"),
        F.reverse("c_mktsegment").alias("seg_rev"),
    ).orderBy("c_custkey")


@query(
    "q31_string_split_decomma",
    oracle="""
    WITH t AS (
      SELECT p_partkey, p_type,
             STRING_SPLIT(p_type, ' ') AS words
      FROM part
    )
    SELECT p_partkey, p_type,
           CAST(LEN(words) AS INTEGER) AS n_words,
           words[1] AS first_word,
           words[-1] AS last_word,
           REPLACE(CAST(p_partkey AS VARCHAR), ',', '') AS decommad
    FROM t ORDER BY p_partkey
    """,
    tags=("functions", "string", "array"),
)
def q31_string_split_decomma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """split + element access + the reference's exact de-comma scrub (P3:
    `i[j].replace(',', '')` -> regexp_replace/replace, columnar)."""
    p = load(spark, sf_dir, "part")
    words = F.split(F.col("p_type"), " ")
    return p.select(
        "p_partkey",
        "p_type",
        F.size(words).alias("n_words"),
        F.element_at(words, 1).alias("first_word"),
        F.element_at(words, -1).alias("last_word"),
        F.replace(F.col("p_partkey").cast("string"), F.lit(","), F.lit("")).alias(
            "decommad"
        ),
    ).orderBy("p_partkey")


# ---------------------------------------------------------------------------
# Date / time functions  (reference P9 strftime, P10 timezone shift)
# ---------------------------------------------------------------------------


@query(
    "q32_date_functions",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate AS DATE) AS order_date,
           STRFTIME(o_orderdate, '%Y%m%d') AS yyyymmdd,
           CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS y,
           CAST(EXTRACT(MONTH FROM o_orderdate) AS INTEGER) AS m,
           CAST(EXTRACT(DAY FROM o_orderdate) AS INTEGER) AS d,
           CAST(EXTRACT(QUARTER FROM o_orderdate) AS INTEGER) AS q,
           CAST((EXTRACT(ISODOW FROM o_orderdate) % 7) + 1 AS INTEGER) AS dow,
           CAST(o_orderdate + INTERVAL 7 DAY AS DATE) AS plus_week,
           CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month_start,
           CAST(LAST_DAY(CAST(o_orderdate AS DATE)) AS DATE) AS month_end,
           CAST(DATE_DIFF('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INTEGER)
             AS days_to_2002
    FROM orders
    WHERE o_orderkey < 1000
    ORDER BY o_orderkey
    """,
    tags=("functions", "date"),
)
def q32_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date family incl. the reference's exact `strftime('%Y%m%d')`
    partition-key format (P9: Final_app.py:23). dayofweek is normalized
    to Spark's 1=Sunday convention on the oracle side."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 1000)
    return o.select(
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("order_date"),
        F.date_format("o_orderdate", "yyyyMMdd").alias("yyyymmdd"),
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        F.quarter("o_orderdate").alias("q"),
        F.dayofweek("o_orderdate").alias("dow"),
        F.date_add(F.col("o_orderdate").cast("date"), 7).alias("plus_week"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
        F.last_day("o_orderdate").alias("month_end"),
        F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate").cast("date")).alias(
            "days_to_2002"
        ),
    ).orderBy("o_orderkey")


@query(
    "q33_date_parse_roundtrip",
    oracle="""
    WITH t AS (
      SELECT o_orderkey, STRFTIME(o_orderdate, '%Y%m%d') AS dt_str FROM orders
    )
    SELECT o_orderkey, dt_str,
           CAST(STRPTIME(dt_str, '%Y%m%d') AS DATE) AS parsed_date
    FROM t WHERE o_orderkey < 500 ORDER BY o_orderkey
    """,
    tags=("functions", "date"),
)
def q33_date_parse_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """yyyyMMdd string -> date -> string round trip: exactly the dt
    format the reference stores as TEXT (create_table.sql) and P9
    produces. to_date restores real date semantics our engine uses for
    partition pruning."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    return o.select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyyMMdd").alias("dt_str"),
        F.to_date(F.date_format("o_orderdate", "yyyyMMdd"), "yyyyMMdd").alias(
            "parsed_date"
        ),
    ).orderBy("o_orderkey")


@query(
    "q34_timezone_conversion",
    oracle="""
    SELECT event_id,
           STRFTIME(ts, '%Y-%m-%d %H:%M:%S') AS ts_utc,
           STRFTIME(ts + INTERVAL 8 HOUR, '%Y-%m-%d %H:%M:%S') AS ts_taipei
    FROM events WHERE event_id < 500 ORDER BY event_id
    """,
    tags=("functions", "date", "timezone"),
)
def q34_timezone_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UTC -> Asia/Taipei conversion — the reference's time_zone.py:15-17
    does `astimezone(timezone(timedelta(hours=8)))`; the engine form is
    from_utc_timestamp (Taipei has no DST, so +8h is exact). Output as
    formatted strings: instant-vs-naive timestamp semantics differ across
    engines, strings don't."""
    e = load(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    return e.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_utc"),
        F.date_format(F.from_utc_timestamp("ts", "Asia/Taipei"), "yyyy-MM-dd HH:mm:ss").alias(
            "ts_taipei"
        ),
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# Math functions  (reference §1.2: buy-sell arithmetic on >float-range ints)
# ---------------------------------------------------------------------------


@query(
    "q35_math_functions",
    oracle="""
    SELECT p_partkey,
           ROUND(ABS(p_retailprice - 1000), 2) AS abs_dev,
           CAST(CEIL(p_retailprice) AS BIGINT) AS price_ceil,
           CAST(FLOOR(p_retailprice) AS BIGINT) AS price_floor,
           ROUND(SQRT(p_retailprice), 6) AS price_sqrt,
           ROUND(LN(p_retailprice), 6) AS price_ln,
           ROUND(POW(p_size, 2), 2) AS size_sq,
           p_size % 7 AS size_mod,
           CAST(SIGN(p_retailprice - 1000) AS INTEGER) AS dev_sign,
           ROUND(LEAST(p_retailprice, 500.0), 2) AS capped_lo,
           ROUND(GREATEST(p_retailprice, 1500.0), 2) AS capped_hi
    FROM part ORDER BY p_partkey
    """,
    tags=("functions", "math"),
)
def q35_math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family. sqrt/ln are libm calls rounded to 6 dp on both sides
    (cross-libm last-ulp differences are real)."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.round(F.abs(F.col("p_retailprice") - 1000), 2).alias("abs_dev"),
        F.ceil("p_retailprice").alias("price_ceil"),
        F.floor("p_retailprice").alias("price_floor"),
        F.round(F.sqrt("p_retailprice"), 6).alias("price_sqrt"),
        F.round(F.log("p_retailprice"), 6).alias("price_ln"),
        F.round(F.pow("p_size", F.lit(2)), 2).alias("size_sq"),
        (F.col("p_size") % 7).alias("size_mod"),
        F.signum(F.col("p_retailprice") - 1000).cast("int").alias("dev_sign"),
        F.round(F.least("p_retailprice", F.lit(500.0)), 2).alias("capped_lo"),
        F.round(F.greatest("p_retailprice", F.lit(1500.0)), 2).alias("capped_hi"),
    ).orderBy("p_partkey")


@query(
    "q36_decimal_exact_arithmetic",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS exact_sum,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem
    """,
    tags=("functions", "math", "decimal"),
)
def q36_decimal_exact_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact decimal aggregation — the engine's answer to the reference's
    all-TEXT schema ('amounts exceed float range', README.md:292):
    DecimalType(38,x) gives exact arithmetic past double range, restoring
    the math the TEXT model gave up. Sum is order-independent in decimal,
    so no rounding crutch is needed."""
    li = load(spark, sf_dir, "lineitem")
    return li.agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .cast("decimal(38,2)")
        .alias("exact_sum"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# Conditional expressions  (reference C1 branch logic, data-plane form)
# ---------------------------------------------------------------------------


@query(
    "q37_case_when_branching",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice >= 300000 THEN 'large'
                WHEN o_totalprice >= 100000 THEN 'medium'
                ELSE 'small' END AS size_class,
           CASE o_orderstatus WHEN 'F' THEN 'finished'
                              WHEN 'O' THEN 'open'
                              ELSE 'other' END AS status_name,
           COALESCE(NULLIF(o_orderpriority, '4-NOT SPECIFIED'), 'unspecified')
             AS priority_clean
    FROM orders ORDER BY o_orderkey
    """,
    tags=("functions", "conditional"),
)
def q37_case_when_branching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """when/otherwise + nullif/coalesce: the data-plane form of the
    reference's BranchPythonOperator routing (C1) — conditionals live in
    the plan, not the orchestrator."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 300000, "large")
        .when(F.col("o_totalprice") >= 100000, "medium")
        .otherwise("small")
        .alias("size_class"),
        F.when(F.col("o_orderstatus") == "F", "finished")
        .when(F.col("o_orderstatus") == "O", "open")
        .otherwise("other")
        .alias("status_name"),
        F.coalesce(
            F.nullif(F.col("o_orderpriority"), F.lit("4-NOT SPECIFIED")),
            F.lit("unspecified"),
        ).alias("priority_clean"),
    ).orderBy("o_orderkey")


# ---------------------------------------------------------------------------
# Array / higher-order functions  (over the embeddings fixture)
# ---------------------------------------------------------------------------


@query(
    "q38_array_functions",
    oracle="""
    SELECT vec_id,
           CAST(LEN(embedding) AS INTEGER) AS dim,
           ROUND(CAST(embedding[1] AS DOUBLE), 6) AS first_elem,
           ROUND(CAST(embedding[64] AS DOUBLE), 6) AS last_elem,
           ROUND(LIST_SUM(LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE))), 4)
             AS vec_sum,
           ROUND(LIST_MAX(LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE))), 6)
             AS vec_max,
           CAST(LEN(LIST_FILTER(embedding, x -> x > 0)) AS INTEGER) AS n_positive
    FROM embeddings ORDER BY vec_id
    """,
    tags=("functions", "array", "hof"),
)
def q38_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array + higher-order functions over the embedding column: size,
    element_at, aggregate (in-order fold — deterministic), transform,
    filter. These are the building blocks of the vector ops in §2.10;
    all run JVM-side, no UDFs."""
    e = load(spark, sf_dir, "embeddings")
    dbl = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 6).alias("first_elem"),
        F.round(F.element_at("embedding", 64).cast("double"), 6).alias("last_elem"),
        F.round(
            F.aggregate(dbl, F.lit(0.0), lambda acc, x: acc + x), 4
        ).alias("vec_sum"),
        F.round(F.array_max(dbl), 6).alias("vec_max"),
        F.size(F.filter(F.col("embedding"), lambda x: x > 0)).alias("n_positive"),
    ).orderBy("vec_id")


@query(
    "q39_explode_posexplode",
    oracle="""
    SELECT vec_id,
           CAST(UNNEST(RANGE(LEN(embedding))) AS INTEGER) AS pos,
           ROUND(CAST(UNNEST(embedding) AS DOUBLE), 6) AS elem
    FROM embeddings
    WHERE vec_id < 20
    ORDER BY vec_id, pos
    """,
    tags=("functions", "array", "explode"),
)
def q39_explode_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode: array -> (pos, elem) rows. This is the engine form of
    the reference's 2-level flatten loop (P4: Final_app.py:48-51) —
    set-oriented, parallel, no driver loop."""
    e = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 20)
    return (
        e.select("vec_id", F.posexplode("embedding").alias("pos", "elem"))
        .select("vec_id", "pos", F.round(F.col("elem").cast("double"), 6).alias("elem"))
        .orderBy("vec_id", "pos")
    )


# ---------------------------------------------------------------------------
# JSON functions  (reference S2: res['stat'] / res['data'] field extraction)
# ---------------------------------------------------------------------------


@query(
    "q40_json_extraction",
    oracle="""
    SELECT event_id,
           CAST(JSON_EXTRACT_STRING(props, '$.k') AS INTEGER) AS k_value,
           CASE WHEN JSON_EXTRACT(props, '$.k') IS NOT NULL THEN TRUE ELSE FALSE END
             AS has_k
    FROM events WHERE event_id < 2000 ORDER BY event_id
    """,
    tags=("functions", "json"),
)
def q40_json_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction from a string column — the engine form of the
    reference's `res['stat']` / `res['data']` dict access (S2). For fixed
    schemas prefer from_json (typed struct, codegen); get_json_object is
    the ad-hoc path probe."""
    e = load(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_value"),
        F.get_json_object("props", "$.k").isNotNull().alias("has_k"),
    ).orderBy("event_id")


@query(
    "q41_from_json_typed",
    oracle="""
    SELECT event_type,
           ROUND(AVG(CAST(JSON_EXTRACT_STRING(props, '$.k') AS INTEGER)), 6) AS avg_k,
           CAST(MAX(CAST(JSON_EXTRACT_STRING(props, '$.k') AS INTEGER)) AS INTEGER) AS max_k,
           COUNT(*) AS n
    FROM events GROUP BY 1 ORDER BY 1
    """,
    tags=("functions", "json", "agg"),
)
def q41_from_json_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_json with an explicit schema -> typed struct column, then
    aggregate on the extracted field. Explicit schema = no inference scan,
    malformed rows -> null (the engine's schema gate, see P7)."""
    e = load(spark, sf_dir, "events")
    parsed = e.withColumn("p", F.from_json("props", "k INT"))
    return (
        parsed.groupBy("event_type")
        .agg(
            F.round(F.avg("p.k"), 6).alias("avg_k"),
            F.max("p.k").alias("max_k"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Map functions
# ---------------------------------------------------------------------------


@query(
    "q42_map_functions",
    oracle="""
    SELECT event_id, 'k' AS first_key,
           CAST(JSON_EXTRACT_STRING(props, '$.k') AS INTEGER) AS k_val,
           1 AS n_keys
    FROM events WHERE event_id < 100 ORDER BY event_id
    """,
    tags=("functions", "map"),
)
def q42_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map column ops: parse JSON into map<string,int>, then map_keys /
    element_at / size — the typed form of the reference's `params` map
    (§1.1). Oracle projects the same scalars (DuckDB maps hash
    differently, so compare scalar projections)."""
    e = load(spark, sf_dir, "events").filter(F.col("event_id") < 100)
    m = F.from_json("props", "map<string,int>")
    return e.select(
        "event_id",
        F.element_at(F.map_keys(m), 1).alias("first_key"),
        F.element_at(m, "k").alias("k_val"),
        F.size(m).alias("n_keys"),
    ).orderBy("event_id")
