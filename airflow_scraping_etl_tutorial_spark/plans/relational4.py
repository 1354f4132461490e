"""Relational coverage, wave 4: the TPC-H planner shapes that in the
full benchmark hang off partsupp — re-expressed on the fixture subset
with lineitem as the part↔supplier bridge (the fixture has no partsupp
table, no ps_supplycost / ps_availqty). What survives the adaptation is
exactly what the engine must plan well: agg-on-agg (Q13), scalar-max
subquery join-back (Q15), distinct-count with NOT-IN anti-join (Q16),
correlated quantity-threshold semi-join (Q20), global-fraction HAVING
(Q11), and per-group argmin join-back (Q2).

Reference motivation: the reference README's stated "join/aggregate
into ML training sets" use (/root/reference/README.md:21,260).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.compare import money_sum
from ..sources.tables import load
from .registry import query

# ---------------------------------------------------------------------------
# TPC-H Q9 shape: product profit by nation and year
# ---------------------------------------------------------------------------


@query(
    "q131_tpch_q9_product_profit",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(EXTRACT(YEAR FROM l.l_shipdate) AS INT) AS o_year,
           CAST(ROUND(SUM(CAST((l.l_extendedprice * (1 - l.l_discount))
             AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_profit
    FROM lineitem l
    JOIN part p     ON l.l_partkey = p.p_partkey AND p.p_name LIKE '%widget%'
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=("join", "multiway", "tpch", "agg"),
)
def q131_tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit): lineitem joined through
    part (name LIKE filter), supplier, nation, profit summed per
    (nation, ship-year). No ps_supplycost in the fixture, so profit is
    the revenue side only — the 4-way star join + two-key rollup is the
    planner shape under test.

    Scale: part/supplier/nation are dims — all three broadcast, so the
    only shuffle is the final (nation, year) hash agg on 25×7 groups.
    The LIKE filter prunes part BEFORE the broadcast, shrinking the
    build side; lineitem is scanned once, never shuffled."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(p.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .join(
            F.broadcast(s.select("s_suppkey", "s_nationkey")),
            li.l_suppkey == F.col("s_suppkey"),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").cast("int").alias("o_year"),
        )
        .agg(
            money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "sum_profit"
            )
        )
        .orderBy("nation", "o_year")
    )


# ---------------------------------------------------------------------------
# TPC-H Q12 shape: conditional priority counts per class
# ---------------------------------------------------------------------------


@query(
    "q132_tpch_q12_priority_by_class",
    oracle="""
    SELECT l.l_returnflag AS ship_class,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= DATE '1997-01-01' AND l.l_shipdate < DATE '1998-01-01'
    GROUP BY 1 ORDER BY 1
    """,
    tags=("join", "tpch", "conditional-agg"),
)
def q132_tpch_q12_priority_by_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping modes / order priority): one year of
    lineitems joined to orders, priority split into high/low via
    conditional sums per class (the fixture's l_returnflag stands in
    for l_shipmode). The shape under test is join + CASE-WHEN partial
    aggregation.

    Scale: the date filter is pushed to the lineitem scan; both
    conditional sums fold into ONE map-side partial agg (2 counters ×
    3 groups per task), so the shuffle after the join moves 3 rows per
    task regardless of data size. The join itself shuffles on
    l_orderkey/o_orderkey — at 100 TB co-locate the two facts by
    bucketing both on orderkey (sources/sinks.py bucketed writer)."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.select("l_orderkey", "l_returnflag")
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.col("l_returnflag").alias("ship_class"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
        .orderBy("ship_class")
    )


# ---------------------------------------------------------------------------
# TPC-H Q13 shape: customer order-count distribution (agg-on-agg)
# ---------------------------------------------------------------------------


@query(
    "q133_tpch_q13_customer_distribution",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
      SELECT c.c_custkey,
             CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c
      LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        AND o.o_orderpriority <> '4-NOT SPECIFIED'
      GROUP BY 1) t
    GROUP BY 1 ORDER BY custdist DESC, c_count DESC
    """,
    tags=("join", "outer", "tpch", "agg-on-agg"),
)
def q133_tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer distribution): LEFT OUTER join customer to
    a filtered orders set — the filter lives in the JOIN CONDITION, not
    a WHERE (a WHERE would silently turn the outer join inner) — count
    orders per customer including the zero-order customers, then
    aggregate the counts into a histogram.

    Scale: two cascaded shuffles (custkey, then c_count) is the
    canonical agg-on-agg plan; the first agg shrinks data to one row
    per customer, so the second shuffle is tiny. COUNT(o_orderkey)
    counts non-null matches only — exactly the outer-join-aware count
    the benchmark tests."""
    c = load(spark, sf_dir, "customer").select("c_custkey")
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "4-NOT SPECIFIED")
        .select("o_custkey", "o_orderkey")
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("bigint").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).cast("bigint").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q15 shape: top supplier via scalar-max subquery
# ---------------------------------------------------------------------------


@query(
    "q134_tpch_q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(ROUND(SUM(CAST((l_extendedprice * (1 - l_discount))
               AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
      GROUP BY 1)
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s.s_suppkey
    """,
    tags=("join", "subquery", "tpch", "scalar"),
)
def q134_tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): quarterly revenue per supplier, then
    the supplier(s) whose revenue equals the global max — the view +
    scalar-subquery shape. Revenue goes through the decimal-exact money
    pattern, so the equality against MAX is a comparison of
    bit-identical doubles in both engines (a raw double SUM here would
    be an order-dependent equality — the classic Q15 trap).

    Scale: the revenue agg is one shuffle on l_suppkey; the MAX is a
    1-row aggregate broadcast back (cross-join of one row), and the
    supplier dim is broadcast — no second data-sized shuffle. The
    revenue intermediate is computed ONCE and reused for both the max
    and the join via localCheckpoint."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    revenue = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "total_revenue"
            )
        )
        .localCheckpoint(eager=True)
    )
    mx = revenue.agg(F.max("total_revenue").alias("_mx"))
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.join(F.broadcast(mx), F.col("total_revenue") == F.col("_mx"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# TPC-H Q16 shape: supplier variety with NOT-IN exclusion
# ---------------------------------------------------------------------------


@query(
    "q135_tpch_q16_supplier_variety",
    oracle="""
    SELECT p.p_brand, p.p_type, CAST(p.p_size AS INT) AS p_size,
           CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#13'
      AND p.p_type NOT LIKE 'PROMO%'
      AND p.p_size IN (1, 4, 9, 17, 25, 33, 41, 49)
      AND l.l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    tags=("join", "anti", "distinct", "tpch"),
)
def q135_tpch_q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (part/supplier variety): distinct suppliers per
    (brand, type, size) bucket over the lineitem bridge (the fixture
    has no partsupp), excluding a brand, a type prefix, and the
    "complaint" suppliers (negative acctbal stands in for the LIKE
    '%Complaints%' list) via NOT IN → left-anti join.

    Scale: part (filtered) broadcasts; the complaint-supplier list is
    a tiny broadcast anti-join build side (NOT IN over a non-nullable
    key is exactly anti-join semantics). The COUNT(DISTINCT) shuffles
    (brand, type, size, suppkey) pairs once, then a second tiny shuffle
    counts them — Spark's two-phase distinct-agg expansion, which is
    the right plan: dedup happens map-side first."""
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13")
        & (~F.col("p_type").like("PROMO%"))
        & (F.col("p_size").isin(1, 4, 9, 17, 25, 33, 41, 49))
    )
    bad = load(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0)
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(bad.select("s_suppkey"), li.l_suppkey == F.col("s_suppkey"), "left_anti")
        .join(
            F.broadcast(p.select("p_partkey", "p_brand", "p_type", "p_size")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_brand", "p_type", F.col("p_size").cast("int").alias("p_size"))
        .agg(F.count_distinct("l_suppkey").cast("bigint").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


# ---------------------------------------------------------------------------
# TPC-H Q20 shape: correlated quantity-threshold semi-join chain
# ---------------------------------------------------------------------------


@query(
    "q136_tpch_q20_excess_shippers",
    oracle="""
    WITH pair AS (
      SELECT l_suppkey, l_partkey,
             SUM(CASE WHEN l_shipdate >= DATE '1996-01-01'
                       AND l_shipdate <  DATE '1997-01-01'
                      THEN l_quantity ELSE 0 END) AS qty_96,
             SUM(l_quantity) AS qty_all
      FROM lineitem GROUP BY 1, 2)
    SELECT n.n_name AS nation,
           CAST(COUNT(DISTINCT s.s_suppkey) AS BIGINT) AS n_excess_suppliers
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE s.s_suppkey IN (
      SELECT pr.l_suppkey FROM pair pr
      JOIN part p ON pr.l_partkey = p.p_partkey AND p.p_name LIKE '%rod%'
      WHERE pr.qty_96 > 0.5 * pr.qty_all)
    GROUP BY 1 ORDER BY 1
    """,
    tags=("join", "semi", "tpch", "correlated"),
)
def q136_tpch_q20_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (excess inventory): suppliers who shipped more
    than half of their all-time volume of a '%rod%' part inside one
    year — the correlated-threshold semi-join chain (pair-level agg →
    threshold filter → part semi → supplier semi → nation rollup). The
    fixture has no ps_availqty, so the 50%-of-own-volume predicate
    replays Q20's "availqty > half the year's shipments" correlation
    against the pair's own history.

    Scale: the pair agg is ONE shuffle of (suppkey, partkey) with both
    sums computed in the same pass (conditional + total — no second
    scan); quantities are integer-valued doubles, so the sums and the
    0.5× comparison are exact. The qualifying-supplier set collapses to
    distinct keys before a broadcast semi-join into supplier; nation
    broadcasts."""
    li = load(spark, sf_dir, "lineitem")
    in_96 = (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    pair = li.groupBy("l_suppkey", "l_partkey").agg(
        F.sum(F.when(in_96, F.col("l_quantity")).otherwise(0.0)).alias("qty_96"),
        F.sum("l_quantity").alias("qty_all"),
    )
    rods = load(spark, sf_dir, "part").filter(F.col("p_name").like("%rod%"))
    excess = (
        pair.filter(F.col("qty_96") > 0.5 * F.col("qty_all"))
        .join(F.broadcast(rods.select("p_partkey")), F.col("l_partkey") == F.col("p_partkey"))
        .select("l_suppkey")
        .distinct()
    )
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    return (
        s.join(excess, s.s_suppkey == excess.l_suppkey, "left_semi")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.count_distinct("s_suppkey").cast("bigint").alias("n_excess_suppliers"))
        .orderBy("nation")
    )


# ---------------------------------------------------------------------------
# TPC-H Q11 shape: global-fraction HAVING over grouped value
# ---------------------------------------------------------------------------


@query(
    "q137_tpch_q11_important_parts",
    oracle="""
    WITH val AS (
      SELECT l.l_partkey,
             SUM(CAST((l.l_extendedprice * (1 - l.l_discount))
               AS DECIMAL(18,6))) AS v
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      JOIN region r   ON n.n_regionkey = r.r_regionkey AND r.r_name = 'ASIA'
      GROUP BY 1),
    tot AS (SELECT CAST(SUM(v) AS DOUBLE) AS t FROM val)
    SELECT v.l_partkey AS p_partkey,
           CAST(ROUND(v.v, 2) AS DOUBLE) AS part_value
    FROM val v, tot
    WHERE CAST(v.v AS DOUBLE) > tot.t * 0.001
    ORDER BY part_value DESC, p_partkey
    """,
    tags=("join", "tpch", "having", "scalar"),
)
def q137_tpch_q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock): per-part value of lineitems
    supplied by one region's suppliers, keeping parts worth more than a
    fixed fraction of the region's total — grouped agg + global scalar
    threshold. Value is an exact decimal sum in BOTH the per-part rows
    and the total, so the fraction comparison is a deterministic
    double compare cross-engine (raw double sums would make the
    threshold order-dependent).

    Scale: supplier/nation/region broadcast (region filter prunes the
    build side to one region's suppliers BEFORE broadcast); the only
    data shuffle is the partkey agg. The total is a 1-row aggregate of
    the already-grouped values — model-sized — broadcast back via
    crossJoin; the grouped intermediate is localCheckpoint'ed so the
    threshold pass doesn't recompute the join."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    dim = (
        s.join(n, s.s_nationkey == n.n_nationkey)
        .join(r, F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey")
    )
    val = (
        li.join(F.broadcast(dim), li.l_suppkey == dim.s_suppkey)
        .groupBy("l_partkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,6)"
                )
            ).alias("v")
        )
        .localCheckpoint(eager=True)
    )
    tot = val.agg(F.sum("v").cast("double").alias("t"))
    return (
        val.crossJoin(F.broadcast(tot))
        .filter(F.col("v").cast("double") > F.col("t") * 0.001)
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.round("v", 2).cast("double").alias("part_value"),
        )
        .orderBy(F.desc("part_value"), "p_partkey")
    )


# ---------------------------------------------------------------------------
# TPC-H Q2 shape: per-group argmin join-back (min-cost supplier)
# ---------------------------------------------------------------------------


@query(
    "q138_tpch_q2_min_cost_supplier",
    oracle="""
    WITH cost AS (
      SELECT l.l_partkey, l.l_suppkey,
             CAST(FLOOR(
               CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,6)))
                    * 1000000 AS BIGINT) AS DOUBLE)
               / CAST(CAST(SUM(l.l_quantity) AS BIGINT) AS DOUBLE)
               + 0.5) AS BIGINT) AS unit_micros
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      JOIN region r   ON n.n_regionkey = r.r_regionkey AND r.r_name = 'EUROPE'
      GROUP BY 1, 2),
    mn AS (SELECT l_partkey, MIN(unit_micros) AS min_micros FROM cost GROUP BY 1)
    SELECT p.p_partkey, p.p_name, s.s_suppkey, s.s_name,
           (CAST(c.unit_micros AS DOUBLE) / CAST(1000000 AS DOUBLE)) AS unit_cost
    FROM cost c
    JOIN mn  ON c.l_partkey = mn.l_partkey AND c.unit_micros = mn.min_micros
    JOIN part p ON c.l_partkey = p.p_partkey AND p.p_size = 17
    JOIN supplier s ON c.l_suppkey = s.s_suppkey
    ORDER BY p.p_partkey, s.s_suppkey
    """,
    tags=("join", "tpch", "argmin", "correlated"),
)
def q138_tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (minimum-cost supplier): for size-17 parts, the
    European supplier(s) whose observed unit cost (total extendedprice
    over total quantity on the lineitem bridge — the fixture's
    stand-in for ps_supplycost) equals the per-part minimum, ALL ties
    kept — the correlated-MIN subquery shape. The unit cost is
    FLOOR(m/q + 0.5) on exact shared integers (micros of the decimal
    price sum over the integral quantity sum) — pure IEEE ops, and
    the MIN equality join compares the integer micros themselves. The
    earlier mean-of-ratios form cast each l_extendedprice/l_quantity
    DOUBLE to DECIMAL(18,6) per row, and at sf0.1 a power-of-two
    quantity (49465.05/32 = 1545.7828125) landed that cast on an
    exact scale-6 midpoint where Spark rounds half-up and DuckDB
    half-to-even — the cast-a-dyadic-quotient trap; scale before
    dividing, round once on shared integers.

    Scale: the region-pruned supplier set broadcasts into the lineitem
    scan, the (partkey, suppkey) agg is the one data shuffle, and the
    per-part MIN is an agg over the already-grouped pairs (tiny); both
    join-backs are broadcasts. Same plan family as q134's scalar max,
    generalized to per-group."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    dim = (
        s.select("s_suppkey", "s_nationkey")
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(r, F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey")
    )
    from ..functions.compare import DEC

    m = (F.sum(F.col("l_extendedprice").cast(DEC)) * 1000000).cast("bigint")
    q = F.sum("l_quantity").cast("bigint")
    micros = F.floor(
        m.cast("double") / q.cast("double") + F.lit(0.5)
    ).cast("bigint")
    cost = (
        li.join(F.broadcast(dim), li.l_suppkey == dim.s_suppkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(micros.alias("unit_micros"))
        .localCheckpoint(eager=True)
    )
    mn = cost.groupBy(F.col("l_partkey").alias("_pk")).agg(
        F.min("unit_micros").alias("min_micros")
    )
    p = load(spark, sf_dir, "part").filter(F.col("p_size") == 17)
    sup = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        cost.join(
            F.broadcast(mn),
            (cost.l_partkey == F.col("_pk"))
            & (cost.unit_micros == F.col("min_micros")),
        )
        .join(
            F.broadcast(p.select("p_partkey", "p_name")),
            cost.l_partkey == F.col("p_partkey"),
        )
        .join(F.broadcast(sup), cost.l_suppkey == F.col("s_suppkey"))
        .select(
            "p_partkey",
            "p_name",
            "s_suppkey",
            "s_name",
            (F.col("unit_micros").cast("double") / F.lit(1000000.0)).alias(
                "unit_cost"
            ),
        )
        .orderBy("p_partkey", "s_suppkey")
    )
