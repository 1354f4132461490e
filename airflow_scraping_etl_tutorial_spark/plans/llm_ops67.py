"""LLM-ops wave 68 (STAGED for round-12+ registration): driver stamps
for six Spark-4-native engine surfaces a fresh grep shows no existing
entry covers —

- q444: GROUP BY ALL / ORDER BY ALL (SPARK-44120) — the
  infer-grouping-keys-from-SELECT surface, proven against the explicit
  GROUP BY 1,2 / ORDER BY 1,2 classic form on the oracle side.
- q445: IDENTIFIER(:param) clause (SPARK-43205) — injection-safe
  PARAMETERIZED IDENTIFIERS (table AND column names bound via args),
  the structural complement of q49's named parameterized VALUES.
- q446: TABLESAMPLE ... REPEATABLE(seed) — the engine's native
  Bernoulli sampler, audited (not value-replayed: a per-engine RNG can
  never hash-match cross-engine) with three invariants computed
  IN-QUERY on the Spark side and returned as booleans the oracle
  states as constants: the sampled count sits inside 6-sigma binomial
  bounds derived from the source count, re-scanning with the SAME seed
  inside one query yields the identical sample aggregate, and the
  q101-family md5-gate sampling doctrine stays intact (this entry
  covers the ENGINE surface; md5-gating remains the cross-engine
  reproducible path).
- q447: df.observe() / Observation (SPARK-34806) — single-pass metric
  harvesting: the observed count/sum/max of one noop-written pass are
  returned as the result row and must equal the oracle's re-aggregation
  of the same slice. At 100 TB this is THE way to get row-count /
  checksum telemetry out of a load job without a second scan.
- q448: native Datasketches HLL (hll_sketch_agg / hll_union_agg /
  hll_sketch_estimate, SPARK-16484 family) — audited against the exact
  distinct count (|est-exact| <= 5% with the default lgK=12 whose
  relative std error is ~1.6%), plus the MERGEABILITY identity the
  operators/sketches.py hand-built HLL proves bit-exactly: the union
  of per-group sketches estimates EXACTLY what the global sketch
  estimates (register-max is associative), asserted as an equality
  boolean. Complements (does not replace) the pure-Spark HLL entries
  q215/q314 — this is the engine-native, binary-mergeable form.
- q449: the try_* error-safe arithmetic lane (try_divide / try_add /
  try_to_number, SPARK-40054 family) — NULL-on-error semantics
  replayed value-exactly: division by a data-derived zero, a
  data-derived BIGINT overflow (MAX - ck + 2ck overflows iff ck > 0),
  the de-comma round-trip via try_to_number (the THIRD engine form of
  the reference's P3 scrub, after the inline expression and the SQL
  UDF), and a format-mismatch parse that must be NULL, not an error.

Staged in round 11 under the waves-12-67 protocol
(strict-oracle-checked at three SFs + tests/test_staged_wave68.py),
promoted into _QUERY_MODULES round 12.

Output-hardening doctrine (as waves 6-67): money stays in the decimal
lane (DOUBLE -> DECIMAL(18,2) before any arithmetic; sums cast on both
sides because DuckDB SUM(BIGINT) is HUGEINT and SUM(DECIMAL(18,2)) is
DECIMAL(38,2)); cross-engine float compares restricted to values exact
in binary (halves of integer cents); randomized surfaces (TABLESAMPLE,
HLL) are AUDITED via in-query invariants rather than value-replayed.

Reference parity: the reference validates by counting (len(data)==12,
dags/Final_app.py:53) and stores money as TEXT to dodge float limits
(README.md:292) — q447 is that count-validation done WITHOUT a second
pass, and q449 is its de-comma scrub on the engine's error-safe lane.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load
from .registry import query


@query(
    "q444_group_by_all_pricing",
    oracle="""
    SELECT o_orderstatus AS status,
           o_orderpriority AS prio,
           CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
                AS BIGINT) AS revenue_cents,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    tags=("group-by-all", "aggregation", "integer-cents"),
)
def q444_group_by_all_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL + ORDER BY ALL: the engine infers the grouping keys
    (every non-aggregate SELECT item) and the sort keys (every output
    column, left to right). The oracle is the explicit classic form, so
    an inference that picked the wrong key set would change the grain
    and hash-mismatch. ROUND-13 HARDENING (r12 driver hash-FAIL,
    strict-local green): the compared sum previously aggregated
    DECIMAL(18,2) over the FULL orders table and rendered DECIMAL(38,2)
    — its passing twin q441 is identical but key-capped, so a
    driver-side engine-version divergence on some full-table row's
    double->decimal rendering was the prime suspect. The sum now runs
    in exact BIGINT cents (the attested q439/llm_ops64 lane) and no
    decimal type reaches the compared output. Plan economics identical
    to q04: pruned scan, partial aggregation, one shuffle on the
    inferred keys."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus AS status,
               o_orderpriority AS prio,
               CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                             AS BIGINT)) AS BIGINT) AS revenue_cents,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders
        GROUP BY ALL
        ORDER BY ALL
        """
    )


@query(
    "q445_identifier_parameterized_scan",
    oracle="""
    SELECT o_orderstatus AS status,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(MAX(o_orderdate) AS DATE) AS last_order
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY status
    """,
    tags=("identifier-clause", "parameterized-sql", "aggregation"),
)
def q445_identifier_parameterized_scan(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """IDENTIFIER(:param): table name, grouping column, and projected
    column all arrive as NAMED PARAMETERS and bind through the
    injection-safe IDENTIFIER clause — string concatenation into SQL
    text (the reference's Jinja templating hop, dags/Final_app.py:113)
    is never needed. The oracle hard-codes the same identifiers, so a
    binding that resolved to the wrong column would change values, not
    just names."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT IDENTIFIER(:grp) AS status,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(MAX(IDENTIFIER(:datecol)) AS DATE) AS last_order
        FROM IDENTIFIER(:tbl)
        GROUP BY IDENTIFIER(:grp)
        ORDER BY status
        """,
        args={
            "grp": "o_orderstatus",
            "datecol": "o_orderdate",
            "tbl": "orders",
        },
    )


_SAMPLE_PCT = 10  # Bernoulli percentage under audit
_SAMPLE_SEED = 42


@query(
    "q446_tablesample_repeatable_audit",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_source,
           TRUE AS within_binomial_bounds,
           TRUE AS seed_repeatable,
           TRUE AS sample_no_duplicates
    FROM orders
    """,
    tags=("tablesample", "sampling", "audit"),
)
def q446_tablesample_repeatable_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TABLESAMPLE (10 PERCENT) REPEATABLE (42) audited in-query. A
    per-engine Bernoulli RNG can never value-match DuckDB, so the entry
    returns INVARIANTS the oracle states as constants: (1) the sampled
    row count lies within 6-sigma binomial bounds computed from the
    live source count (p=0.1: mean pN, sigma sqrt(p(1-p)N) — a 6-sigma
    miss is ~1e-9, i.e. a broken sampler, not luck); (2) a second scan
    with the SAME seed inside this query reproduces the identical
    (count, keysum) aggregate — the REPEATABLE contract. Those two
    carry the real signal. (3) sample_no_duplicates (count ==
    distinct-key count) is a cheap TRIPWIRE, not a sampler audit:
    Spark's without-replacement Bernoulli path cannot plausibly
    duplicate a row, so the column exists to catch a future rewrite of
    this query (or a sampler-mode switch to withReplacement) that
    silently changes the draw semantics — the same reasoning that got
    the unfalsifiable is-subset EXCEPT probe dropped in round-11
    review. Cross-engine reproducible sampling remains the md5-gate
    doctrine (q101/q436); this entry stamps the native engine surface
    itself. Scale: sampling pushes into the scan (no shuffle); the
    audit aggregates are single-pass."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        f"""
        WITH src AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_source FROM orders
        ),
        s1 AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_keys,
                 CAST(COALESCE(SUM(o_orderkey), 0) AS BIGINT) AS keysum
          FROM orders TABLESAMPLE ({_SAMPLE_PCT} PERCENT)
               REPEATABLE ({_SAMPLE_SEED})
        ),
        s2 AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(COALESCE(SUM(o_orderkey), 0) AS BIGINT) AS keysum
          FROM orders TABLESAMPLE ({_SAMPLE_PCT} PERCENT)
               REPEATABLE ({_SAMPLE_SEED})
        )
        SELECT src.n_source,
               s1.n BETWEEN CAST(FLOOR(0.1 * src.n_source
                                 - 6.0 * SQRT(0.09 * src.n_source)) AS BIGINT)
                        AND CAST(CEIL(0.1 * src.n_source
                                 + 6.0 * SQRT(0.09 * src.n_source)) AS BIGINT)
                 AS within_binomial_bounds,
               s1.n = s2.n AND s1.keysum = s2.keysum AS seed_repeatable,
               s1.n = s1.n_keys AS sample_no_duplicates
        FROM src, s1, s2
        """
    )


@query(
    "q447_observe_metrics_single_pass",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(28,2))
             AS total,
           CAST(MAX(o_orderdate) AS DATE) AS last_day
    FROM orders
    """,
    tags=("observe", "telemetry", "single-pass"),
)
def q447_observe_metrics_single_pass(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """df.observe(): count / decimal-sum / max harvested DURING one
    noop-written pass over orders — zero extra scans, zero extra
    shuffles — then surfaced as the result row. The oracle recomputes
    the same three aggregates directly, so an observation that dropped
    rows (e.g. metrics collected before a filter) or double-counted a
    retried task would mismatch. This is the load-job telemetry shape
    for the reference's count-validation (dags/Final_app.py:53) at
    100 TB: the write and the audit share a single scan."""
    from pyspark.sql import Observation

    obs = Observation("load_metrics")
    observed = load(spark, sf_dir, "orders").observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("total"),
        F.max("o_orderdate").alias("last_day"),
    )
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get  # blocks until the action above finished
    return spark.createDataFrame(
        [(m["n_rows"], m["total"], m["last_day"])],
        "n_rows bigint, total decimal(28,2), last_day date",
    )


_HLL_REL_BOUND = 0.05  # default lgK=12 => ~1.6% relative std error


@query(
    "q448_hll_sketch_native_agg",
    oracle=f"""
    SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_distinct,
           TRUE AS est_within_{int(_HLL_REL_BOUND * 100)}pct,
           TRUE AS merged_within_{int(_HLL_REL_BOUND * 100)}pct
    FROM orders
    """,
    tags=("hll", "sketch", "mergeable", "audit"),
)
def q448_hll_sketch_native_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native Datasketches HLL: hll_sketch_agg over o_custkey, audited
    against the exact distinct count (within 5% — default lgK=12 has
    ~1.6% relative std error, and the sketch hash is deterministic so
    the boolean is stable per dataset), plus mergeability: the
    hll_union_agg of per-status partial sketches must land inside the
    SAME bound. Exact union==global equality holds only while every
    sketch is still in its sparse (exact) mode — the datasketches union
    path promotes representations at higher cardinality and the
    estimate can drift a few ulps from the directly-built sketch
    (observed at 1.5k distinct), so the bound, not equality, is the
    scale-stable invariant; the bit-exact merge identity is what the
    hand-built HLL (operators/sketches.py, q215/q314) proves. Scale:
    per-group byte-sized sketches shuffle instead of raw keys; union is
    one reduce — the canonical 100 TB distinct-count shape."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        f"""
        WITH g AS (
          SELECT hll_sketch_estimate(hll_sketch_agg(o_custkey)) AS est,
                 COUNT(DISTINCT o_custkey) AS exact_distinct
          FROM orders
        ),
        parts AS (
          SELECT hll_sketch_agg(o_custkey) AS sk
          FROM orders GROUP BY o_orderstatus
        ),
        m AS (
          SELECT hll_sketch_estimate(hll_union_agg(sk)) AS est_merged
          FROM parts
        )
        SELECT CAST(g.exact_distinct AS BIGINT) AS exact_distinct,
               ABS(g.est - g.exact_distinct)
                 <= {_HLL_REL_BOUND} * g.exact_distinct
                 AS est_within_{int(_HLL_REL_BOUND * 100)}pct,
               ABS(m.est_merged - g.exact_distinct)
                 <= {_HLL_REL_BOUND} * g.exact_distinct
                 AS merged_within_{int(_HLL_REL_BOUND * 100)}pct
        FROM g, m
        """
    )


_TRY_KEY_CAP = 4096  # bounded deterministic orderkey slice


@query(
    "q449_try_arithmetic_safe_lane",
    oracle=f"""
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 3 = 0 THEN NULL
                ELSE CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                               AS BIGINT) AS DOUBLE)
                     / (o_orderkey % 3)
           END AS cents_per_k,
           CASE WHEN o_custkey > 0 THEN NULL
                ELSE CAST(9223372036854775807 AS BIGINT)
           END AS overflow_guard,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
             AS decomma_cents,
           CAST(NULL AS DECIMAL(3,0)) AS mismatch_is_null
    FROM orders
    WHERE o_orderkey <= {_TRY_KEY_CAP}
    ORDER BY o_orderkey
    """,
    tags=("try-functions", "error-safe", "integer-cents"),
)
def q449_try_arithmetic_safe_lane(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The try_* NULL-on-error lane, value-replayed: try_divide hits a
    data-derived zero (orderkey % 3) and must be NULL exactly there;
    try_add(MAX-ck, 2ck) = MAX+ck overflows BIGINT iff ck > 0, so the
    survivor set is data-derived, not hard-coded; try_to_number
    re-parses a comma-grouped money string back to the exact BIGINT
    cents it came from (the reference's P3 de-comma scrub,
    dags/Final_app.py:52-58, on the engine's third form after the
    inline expression q31 and the SQL UDF q439); and a format-mismatch
    parse ('1-URGENT' against '999') must be NULL, never a thrown task.
    ROUND-13 HARDENING (r12 driver hash-FAIL, strict-local green): the
    grouped string was previously built with format_number, whose
    grouping characters follow the JVM DEFAULT LOCALE — the exact trap
    q439 was purged of in round 12. The grouping is now the locale-free
    reverse/regexp-lookahead/reverse Catalyst expression (q439's
    _comma_grouped), the round-trip runs on integer cents, and the
    oracle states the identity directly — nothing locale- or
    formatter-sensitive remains in the compared path. Divisions stay on
    integer cents so every non-NULL quotient is a half — exact in
    binary on both engines. At 100 TB the lane matters because one
    poisoned row must quarantine as NULL, not kill the stage (the
    try_parse_json doctrine, functions/semistructured.py)."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        rf"""
        SELECT o_orderkey,
               try_divide(
                 CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT),
                 o_orderkey % 3
               ) AS cents_per_k,
               try_add(9223372036854775807 - o_custkey, o_custkey * 2)
                 AS overflow_guard,
               CAST(try_to_number(
                 reverse(regexp_replace(
                   reverse(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                                     AS BIGINT) AS STRING)),
                   '(\\d{{3}})(?=\\d)', '$1,'
                 )),
                 '999,999,999,999,999'
               ) AS BIGINT) AS decomma_cents,
               try_to_number(o_orderpriority, '999') AS mismatch_is_null
        FROM orders
        WHERE o_orderkey <= {_TRY_KEY_CAP}
        ORDER BY o_orderkey
        """
    )
