"""LLM-ops wave 69 (round 12): driver stamps for the mutation-layer
properties q147/q148 do NOT cover (round-11 VERDICT item 7 — the
merge path's REPLAY contract was pytest-only, tests/test_scd.py).

- q450: IDEMPOTENT MERGE upsert (operators/scd.py::merge_upsert).
  q148 stamps single-application MERGE semantics; this entry applies
  the SAME update batch TWICE — merge(merge(current, upd), upd) —
  while the oracle computes the single-application closed form as a
  FULL OUTER JOIN + COALESCE, so the replay-safety of the reference's
  daily load (re-running a day must change nothing) is value-checked:
  an append-flavored implementation duplicates every matched key and
  fails rows + hash, one that dropped unmatched current rows fails
  rows. Covers both MERGE branches (WHEN MATCHED UPDATE and WHEN NOT
  MATCHED INSERT).
- q451: SCD2 validity intervals at ROW grain
  (operators/scd.py::scd2_apply). q147 checks aggregate invariants
  (version histogram, one open version per key); this entry emits the
  history TABLE itself — every (key, version, effective_from,
  effective_to, is_current) row — so the change-detection boundary
  and interval endpoints are value-checked row-for-row. The oracle
  replays change-detection with LAG and interval-closing with LEAD.

Reference parity: dags/insert_data.py loads each day exactly once and
dags/Final_app.py re-runs must not double-load (the branch +
ON CONFLICT shape); q450 is that contract as a distributed MERGE,
q451 is its keep-history generalization.

Output-hardening doctrine (as waves 6-68): money in the attested
DOUBLE -> DECIMAL(18,2) -> BIGINT-cents lane; timestamps projected as
DATE on both sides; every aggregate cast on BOTH sides (DuckDB
SUM(BIGINT) is HUGEINT).

Scale: merge_upsert is one anti-join + union — the snapshot shuffles
once on the business key and the (small) update batch broadcasts;
scd2_apply is one shuffle on the key with two window passes inside
the same partitioning. Neither collects anything to the driver; both
run identically on a 1000-executor cluster (SCALE.md S5 story).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.scd import merge_upsert, scd2_apply
from ..sources.tables import load
from .registry import query

_CUR_CAP = 1024  # snapshot slice: dense keys [0, _CUR_CAP]
_NEW_CAP = 1400  # insert slice: keys (_CUR_CAP, _NEW_CAP]
_BUMP = 999  # cents delta applied by the matched-update branch

# The attested money lane (llm_ops64/65): DOUBLE -> DECIMAL(18,2) ->
# exact BIGINT cents.
_CENTS = "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"


@query(
    "q450_merge_upsert_idempotent",
    oracle=f"""
    WITH base AS (
      SELECT o_orderkey AS k, o_orderstatus AS status,
             {_CENTS} AS total_cents
      FROM orders
    ),
    cur AS (SELECT * FROM base WHERE k <= {_CUR_CAP}),
    upd AS (
      SELECT k, 'U' AS status,
             CAST(total_cents + {_BUMP} AS BIGINT) AS total_cents
      FROM cur WHERE k % 7 = 0
      UNION ALL
      SELECT k, status, total_cents FROM base
      WHERE k > {_CUR_CAP} AND k <= {_NEW_CAP}
    )
    SELECT CAST(COALESCE(u.k, c.k) AS BIGINT) AS o_orderkey,
           COALESCE(u.status, c.status) AS status,
           CAST(COALESCE(u.total_cents, c.total_cents) AS BIGINT)
             AS total_cents
    FROM cur c FULL OUTER JOIN upd u ON c.k = u.k
    ORDER BY o_orderkey
    """,
    tags=("merge", "upsert", "idempotent", "mutation"),
)
def q450_merge_upsert_idempotent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """merge_upsert applied TWICE with the same update batch against
    the single-application FULL OUTER closed form. current = the dense
    orderkey snapshot [0, 1024]; updates = every 7th snapshot key with
    status 'U' and cents bumped (the WHEN MATCHED branch) plus keys
    (1024, 1400] verbatim (the WHEN NOT MATCHED branch). MERGE
    semantics make the second application a no-op — kept = current
    MINUS update keys is unchanged when the update keys are already
    the updates' own rows — so an implementation that appended instead
    of upserting (the classic double-load bug the reference guards
    with ON CONFLICT) duplicates 147+ matched keys and fails rows +
    hash, and one that dropped unmatched current rows fails rows.
    Scale: each application is one left_anti + unionByName — the
    snapshot shuffles once on the key (or not at all when AQE
    broadcasts the small update side); nothing touches the driver."""
    base = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey"),
        F.col("o_orderstatus").alias("status"),
        F.expr(_CENTS).alias("total_cents"),
    )
    current = base.filter(F.col("o_orderkey") <= _CUR_CAP)
    matched = current.filter(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey",
        F.lit("U").alias("status"),
        (F.col("total_cents") + _BUMP).cast("bigint").alias("total_cents"),
    )
    inserts = base.filter(
        (F.col("o_orderkey") > _CUR_CAP) & (F.col("o_orderkey") <= _NEW_CAP)
    )
    updates = matched.unionByName(inserts)
    once = merge_upsert(current, updates, "o_orderkey")
    twice = merge_upsert(once, updates, "o_orderkey")  # idempotence stamp
    return twice.select(
        F.col("o_orderkey").cast("bigint").alias("o_orderkey"),
        "status",
        F.col("total_cents").cast("bigint").alias("total_cents"),
    ).orderBy("o_orderkey")


@query(
    "q451_scd2_validity_intervals",
    oracle="""
    WITH snaps AS (
      SELECT l_orderkey AS k, CAST(l_shipdate AS DATE) AS snap_day,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
      FROM lineitem GROUP BY 1, 2
    ),
    changed AS (
      SELECT k, snap_day, qty,
             LAG(qty) OVER (PARTITION BY k ORDER BY snap_day) AS prev_qty
      FROM snaps
    ),
    versions AS (
      SELECT k, snap_day, qty FROM changed
      WHERE prev_qty IS NULL OR prev_qty != qty
    )
    SELECT CAST(k AS BIGINT) AS l_orderkey,
           CAST(qty AS BIGINT) AS qty,
           snap_day AS effective_from,
           LEAD(snap_day) OVER (PARTITION BY k ORDER BY snap_day)
             AS effective_to,
           LEAD(snap_day) OVER (PARTITION BY k ORDER BY snap_day) IS NULL
             AS is_current
    FROM versions
    ORDER BY l_orderkey, effective_from
    """,
    tags=("scd2", "history", "mutation", "window"),
)
def q451_scd2_validity_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """scd2_apply over deterministic daily snapshots: per-order
    shipped quantity by ship DAY (the (key, day) aggregation makes
    effective_from unique per key — the round-8 lineitem lesson:
    (l_orderkey, l_linenumber) is NOT unique, so raw rows would tie).
    A version opens when qty changes vs the key's previous version
    (scd2_apply detects this with a null-disambiguated xxhash64
    fingerprint; the oracle replays it as LAG != current — equivalent
    for a non-null single column), closes at the next version's
    effective_from, and the open version is is_current. Scale: one
    shuffle on the key; both window passes reuse that partitioning
    (a single sort, no extra exchange)."""
    li = load(spark, sf_dir, "lineitem")
    snaps = (
        li.groupBy(
            F.col("l_orderkey"),
            F.to_date("l_shipdate").alias("snap_day"),
        )
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("qty"))
    )
    hist = scd2_apply(
        None, snaps, key="l_orderkey", effective_ts="snap_day",
        tracked_cols=("qty",),
    )
    return hist.select(
        F.col("l_orderkey").cast("bigint").alias("l_orderkey"),
        F.col("qty").cast("bigint").alias("qty"),
        F.col("effective_from"),
        F.col("effective_to"),
        F.col("is_current"),
    ).orderBy("l_orderkey", "effective_from")
