"""Relational coverage, wave 3: the remaining TPC-H planner shapes
expressible on the fixture subset (no partsupp table; lineitem carries
no commitdate/receiptdate/shipmode and customer no phone, so Q4/Q12/Q22
keep their JOIN/AGG shapes with adapted predicates — the plan shape,
not the benchmark constant, is what the engine must handle).

Reference motivation: the reference README's stated "join/aggregate
into ML training sets" use (README.md:21,260) — these are the standard
shapes any relational engine feeding a training pipeline must plan
well: semi-join EXISTS (Q4), full-scan conditional agg (Q6/Q12/Q14),
nation-pair volume (Q7), market-share ratio-of-sums (Q8), correlated
per-group threshold (Q17), disjunctive pushdown (Q19), anti-join with
scalar subquery (Q22).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.compare import money_sum
from ..sources.tables import load
from .registry import query

# ---------------------------------------------------------------------------
# TPC-H Q4 shape: EXISTS semi-join + priority count
# ---------------------------------------------------------------------------


@query(
    "q115_tpch_q4_late_shipment_priority",
    oracle="""
    SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= DATE '1996-07-01'
      AND o.o_orderdate <  DATE '1996-10-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY 1 ORDER BY 1
    """,
    tags=("join", "semi", "tpch", "exists"),
)
def q115_tpch_q4_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order priority checking): quarter of orders,
    EXISTS-semi-join to lineitems shipped >60 days after the order date
    (the fixture's l_shipdate stands in for commit/receipt lateness),
    counted per priority.

    Scale: the EXISTS compiles to a LeftSemi join on l_orderkey with
    the date predicate evaluated join-side — lineitem is never
    aggregated, and the semi join short-circuits per matching key. The
    orders date filter is pushed to the scan."""
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-07-01") & (F.col("o_orderdate") < "1996-10-01")
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("bigint").alias("order_count"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# TPC-H Q6 shape: tight scan-filter-agg (the pushdown benchmark)
# ---------------------------------------------------------------------------


@query(
    "q116_tpch_q6_forecast_revenue",
    oracle="""
    SELECT CAST(ROUND(SUM(CAST((l_extendedprice * l_discount) AS DECIMAL(18,6))), 2)
             AS DOUBLE) AS promo_discount_revenue,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem
    WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    tags=("scan", "filter", "agg", "tpch"),
)
def q116_tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecasting revenue change): the canonical
    scan-dominated query — every predicate (date range, discount band,
    quantity cap) must reach the parquet scan as a pushed filter, and
    the projection must prune to the 4 referenced columns; the agg
    itself is one map-side-combined partial. Money goes through the
    decimal-exact pattern (functions/compare.py)."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        money_sum(F.col("l_extendedprice") * F.col("l_discount")).alias(
            "promo_discount_revenue"
        ),
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
    )


# ---------------------------------------------------------------------------
# TPC-H Q7 shape: nation-pair volume shipping
# ---------------------------------------------------------------------------


@query(
    "q117_tpch_q7_volume_shipping",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(EXTRACT(YEAR FROM l.l_shipdate) AS INT) AS l_year,
           CAST(ROUND(SUM(CAST((l.l_extendedprice * (1 - l.l_discount))
             AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_3'))
      AND l.l_shipdate >= DATE '1996-01-01' AND l.l_shipdate < DATE '1998-01-01'
    GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """,
    tags=("join", "agg", "tpch"),
)
def q117_tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping): revenue between two trading nations
    in both directions, split by supplier-nation / customer-nation /
    ship year.

    Scale: both nation dims broadcast twice under different aliases
    (Catalyst plans two independent BroadcastHashJoins); the symmetric
    nation-pair disjunction is a post-join filter on broadcast columns
    — the only shuffles are lineitem⋈orders and the final 3-key
    groupBy."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_3"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(
            money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# ---------------------------------------------------------------------------
# TPC-H Q8 shape: market share (ratio of conditional to total revenue)
# ---------------------------------------------------------------------------


@query(
    "q118_tpch_q8_market_share",
    oracle="""
    WITH all_rev AS (
      SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INT) AS o_year,
             n1.n_name AS supp_nation,
             CAST((l.l_extendedprice * (1 - l.l_discount)) AS DECIMAL(18,6)) AS rev
      FROM lineitem l
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
      JOIN region r   ON n2.n_regionkey = r.r_regionkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
      JOIN part p     ON l.l_partkey = p.p_partkey
      WHERE r.r_name = 'AMERICA' AND p.p_type = 'STANDARD'
        AND o.o_orderdate >= DATE '1996-01-01'
        AND o.o_orderdate <  DATE '1998-01-01'
    )
    SELECT o_year,
           ROUND(
             CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN rev
                           ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
             / CAST(SUM(rev) AS DOUBLE), 6) AS mkt_share
    FROM all_rev GROUP BY 1 ORDER BY 1
    """,
    tags=("join", "agg", "tpch", "ratio"),
)
def q118_tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): one nation's share of
    STANDARD-part revenue sold into AMERICA, per order year — an
    8-table star with a ratio-of-conditional-sums on top.

    Scale: every dim broadcasts; lineitem⋈orders is the lone fact-fact
    shuffle. The share divides two exact decimal sums as one double op
    (order-independent, oracle-identical) rather than averaging
    doubles."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_regionkey").alias("n2_region")
    )
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")
    nation_rev = F.when(
        F.col("supp_nation") == "NATION_3", rev
    ).otherwise(F.lit(0).cast("decimal(18,6)"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .join(F.broadcast(r), F.col("n2_region") == F.col("r_regionkey"))
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.round(
                F.sum(nation_rev).cast("double") / F.sum(rev).cast("double"), 6
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


# ---------------------------------------------------------------------------
# TPC-H Q14 shape: promo revenue percentage
# ---------------------------------------------------------------------------


@query(
    "q119_tpch_q14_promo_revenue",
    oracle="""
    SELECT ROUND(
             100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                 THEN CAST((l.l_extendedprice * (1 - l.l_discount)) AS DECIMAL(18,6))
                 ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
             / CAST(SUM(CAST((l.l_extendedprice * (1 - l.l_discount))
                 AS DECIMAL(18,6))) AS DOUBLE), 6) AS promo_revenue_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= DATE '1996-09-01' AND l.l_shipdate < DATE '1996-10-01'
    """,
    tags=("join", "agg", "tpch", "ratio"),
)
def q119_tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): percentage of one month's revenue
    from PROMO parts. Part broadcasts; the month filter is pushed to
    the lineitem scan; the ratio is one double division of two exact
    decimal sums."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-09-01") & (F.col("l_shipdate") < "1996-10-01")
    )
    p = load(spark, sf_dir, "part")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(
        F.lit(0).cast("decimal(18,6)")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                F.lit(100.0) * F.sum(promo).cast("double") / F.sum(rev).cast("double"),
                6,
            ).alias("promo_revenue_pct")
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q17 shape: correlated per-group threshold
# ---------------------------------------------------------------------------


@query(
    "q120_tpch_q17_small_quantity_revenue",
    oracle="""
    WITH pa AS (
      SELECT l_partkey,
             0.2 * (CAST(SUM(l_quantity) AS DOUBLE) / COUNT(*)) AS qty_threshold
      FROM lineitem GROUP BY 1
    )
    SELECT CAST(ROUND(CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))), 2)
             AS DOUBLE) / 7.0, 4) AS DOUBLE) AS avg_yearly,
           CAST(COUNT(*) AS BIGINT) AS n_small_lines
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN pa    ON l.l_partkey = pa.l_partkey
    WHERE p.p_brand = 'Brand#3' AND l.l_quantity < pa.qty_threshold
    """,
    tags=("join", "agg", "tpch", "correlated"),
)
def q120_tpch_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue): lineitems under 20% of
    their part's average quantity, for one brand — the correlated
    scalar subquery decorrelated into an aggregate + self-join.

    Scale: the per-part average is a map-side-combined groupBy of the
    fact (two longs per part), then joins back on the same l_partkey
    hash partitioning AQE reuses; quantities are integer-valued doubles
    so SUM stays exact (functions/compare.py doctrine) and the 0.2×
    threshold is one deterministic double op. The brand filter prunes
    via the broadcast part dim."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    pa = li.groupBy(F.col("l_partkey").alias("pa_partkey")).agg(
        (
            F.lit(0.2) * (F.sum("l_quantity").cast("double") / F.count(F.lit(1)))
        ).alias("qty_threshold")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(pa, li.l_partkey == pa.pa_partkey)
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            F.round(
                F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,6)")), 2)
                .cast("double")
                / F.lit(7.0),
                4,
            )
            .cast("double")
            .alias("avg_yearly"),
            F.count(F.lit(1)).cast("bigint").alias("n_small_lines"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q19 shape: disjunction-of-conjunctions pushdown
# ---------------------------------------------------------------------------


@query(
    "q121_tpch_q19_disjunctive_predicates",
    oracle="""
    SELECT CAST(ROUND(SUM(CAST((l.l_extendedprice * (1 - l.l_discount))
             AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity >= 1 AND l.l_quantity <= 11)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 20
           AND l.l_quantity >= 10 AND l.l_quantity <= 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 30
           AND l.l_quantity >= 20 AND l.l_quantity <= 30)
    """,
    tags=("join", "filter", "tpch", "disjunction"),
)
def q121_tpch_q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue): OR of three brand/size/quantity
    conjunctions straddling the join — the planner test is that the
    single-side conjuncts (p_size ranges, l_quantity bands) are split
    OUT of the OR and pushed below the join as derived filters
    (p_size <= 30, quantity in [1,30]) while the cross-side OR
    evaluates post-join. Part broadcasts either way."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 20)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 30)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q22 shape: anti-join + scalar subquery
# ---------------------------------------------------------------------------


@query(
    "q122_tpch_q22_inactive_customers",
    oracle="""
    WITH threshold AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
               AS avg_bal
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c.c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(ROUND(SUM(CAST(c.c_acctbal AS DECIMAL(18,6))), 2) AS DOUBLE)
             AS totacctbal
    FROM customer c, threshold t
    WHERE c.c_acctbal > t.avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderdate >= DATE '2000-07-01')
    GROUP BY 1 ORDER BY 1
    """,
    tags=("join", "anti", "subquery", "tpch"),
)
def q122_tpch_q22_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (global sales opportunity): above-average-balance
    customers with no RECENT orders, grouped by market segment (the
    fixture has no phone column and every customer has some order, so
    segment keeps the group-by-code shape and a date-bounded NOT EXISTS
    keeps the anti join non-vacuous). Two planner features compose: a
    scalar subquery (global decimal-exact mean, broadcast as a one-row
    cross join) and an anti join against recent orders on the customer
    key."""
    c = load(spark, sf_dir, "customer")
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= "2000-07-01")
        .select("o_custkey")
    )
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_bal")
        )
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("numcust"),
            money_sum(F.col("c_acctbal")).alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# TPC-H Q12 shape: dual conditional counts by class
# ---------------------------------------------------------------------------


@query(
    "q123_shipping_delay_buckets",
    oracle="""
    SELECT o.o_orderpriority,
           CAST(SUM(CASE WHEN DATE_DIFF('day', CAST(o.o_orderdate AS DATE),
                                 CAST(l.l_shipdate AS DATE)) < 30
                         THEN 1 ELSE 0 END) AS BIGINT) AS fast_lines,
           CAST(SUM(CASE WHEN DATE_DIFF('day', CAST(o.o_orderdate AS DATE),
                                 CAST(l.l_shipdate AS DATE)) BETWEEN 30 AND 89
                         THEN 1 ELSE 0 END) AS BIGINT) AS normal_lines,
           CAST(SUM(CASE WHEN DATE_DIFF('day', CAST(o.o_orderdate AS DATE),
                                 CAST(l.l_shipdate AS DATE)) >= 90
                         THEN 1 ELSE 0 END) AS BIGINT) AS late_lines
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= DATE '1996-01-01' AND l.l_shipdate < DATE '1997-01-01'
    GROUP BY 1 ORDER BY 1
    """,
    tags=("join", "agg", "tpch", "conditional"),
)
def q123_shipping_delay_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping modes and order priority): per
    priority, lineitem counts bucketed by ship delay (the fixture has
    no shipmode/receiptdate; datediff(ship, order) keeps the
    dual-conditional-SUM-over-join shape). One fact-fact join, then a
    3-way conditional count collapsing map-side."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.sum(F.when(delay < 30, 1).otherwise(0)).cast("bigint").alias(
                "fast_lines"
            ),
            F.sum(F.when(delay.between(30, 89), 1).otherwise(0))
            .cast("bigint")
            .alias("normal_lines"),
            F.sum(F.when(delay >= 90, 1).otherwise(0)).cast("bigint").alias(
                "late_lines"
            ),
        )
        .orderBy("o_orderpriority")
    )
