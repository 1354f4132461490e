"""Persisted-intermediate bookkeeping for multi-consumer operators.

Operators like minhash_near_duplicates persist() an intermediate that
several branches of the returned plan re-read (signatures feed the LSH
self-join AND both verify lookups). The persist is correct — without it
the shingle/hash map work runs 3x — but the cached blocks outlive the
operator call, and a long-lived session that never calls
spark.catalog.clearCache() leaks them.

Two release paths, because DataFrame transformations don't propagate
Python attributes (an `.orderBy`/`.select` on an operator's return value
yields a NEW DataFrame without the tag):

- `release_intermediates(df)` — exact-handle form; only works on the
  very DataFrame an operator returned, BEFORE any further
  transformation.
- `release_session_intermediates(spark)` — session-scoped registry
  form; every `tag_intermediates` call also records its handles in a
  per-session registry, so callers that chained transformations (or
  lost the original handle entirely) can still drain every persisted
  intermediate their session accumulated. This is what bench.py-style
  run-a-query-then-clean loops should call; it is the targeted
  equivalent of `spark.catalog.clearCache()` that touches only
  operator-tagged blocks.
"""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame, SparkSession

_ATTR = "_sg_persisted_intermediates"

# session-id -> list of persisted handles still outstanding. Keyed by
# id() with a weakref kill-switch so a torn-down session's entry dies
# with it rather than pinning JVM-side DataFrames forever.
_SESSION_HANDLES: dict[int, list[DataFrame]] = {}


def _session_bucket(spark: SparkSession) -> list[DataFrame]:
    key = id(spark)
    if key not in _SESSION_HANDLES:
        _SESSION_HANDLES[key] = []
        weakref.finalize(spark, _SESSION_HANDLES.pop, key, None)
    return _SESSION_HANDLES[key]


def tag_intermediates(result: DataFrame, *persisted: DataFrame) -> DataFrame:
    """Record persisted upstream DataFrames on the result (merging with
    any handles already tagged by an upstream operator) AND in the
    session-scoped registry (so the handles survive callers' chained
    transformations dropping the attribute)."""
    existing = list(getattr(result, _ATTR, ()))
    setattr(result, _ATTR, existing + list(persisted))
    _session_bucket(result.sparkSession).extend(persisted)
    return result


def release_intermediates(result: DataFrame, blocking: bool = False) -> int:
    """Unpersist every intermediate tagged on `result`. Only the EXACT
    DataFrame an operator returned carries the tag — after any further
    transformation, use `release_session_intermediates` instead. Call
    AFTER the result has been materialized. Returns the number
    released."""
    handles = getattr(result, _ATTR, ())
    for df in handles:
        df.unpersist(blocking=blocking)
    n = len(handles)
    if handles:
        bucket = _SESSION_HANDLES.get(id(result.sparkSession), [])
        for df in handles:
            if df in bucket:
                bucket.remove(df)
        setattr(result, _ATTR, [])
    return n


def release_session_intermediates(spark: SparkSession, blocking: bool = False) -> int:
    """Unpersist EVERY operator-tagged intermediate this session has
    accumulated (whether or not the caller still holds the tagged
    result). Safe whenever no tagged plan is mid-materialization —
    an unpersisted plan re-executes rather than erroring. Returns the
    number released."""
    bucket = _SESSION_HANDLES.get(id(spark), [])
    n = len(bucket)
    while bucket:
        bucket.pop().unpersist(blocking=blocking)
    return n


def _checkpointed_rdds(spark: SparkSession):
    sc = spark.sparkContext._jsc.sc()
    jmap = spark._jvm.scala.collection.JavaConverters.mapAsJavaMap(
        sc.getPersistentRDDs()
    )
    return [rdd for rdd in jmap.values() if rdd.isLocallyCheckpointed()]


def snapshot_checkpoints(spark: SparkSession) -> frozenset[int]:
    """RDD ids of every locally-checkpointed RDD alive right now. Take
    one BEFORE running scoped work, then pass it as `protect` to
    `release_session_checkpoints` so the sweep frees only checkpoints
    created inside the scope — pre-existing live checkpointed
    DataFrames (whose truncated lineage could never be recomputed)
    keep their blocks (r13 ADVICE: the session-wide sweep is a
    foot-gun for callers that hold live checkpoints across it)."""
    return frozenset(rdd.id() for rdd in _checkpointed_rdds(spark))


def release_session_checkpoints(
    spark: SparkSession,
    blocking: bool = False,
    protect: frozenset[int] = frozenset(),
) -> int:
    """Unpersist the RDD blocks behind every localCheckpoint() this
    session still holds (minus `protect`, see `snapshot_checkpoints`).
    localCheckpoint truncates lineage by PERSISTING
    the RDD outside the DataFrame-cache registry, so neither
    `release_session_intermediates` nor `spark.catalog.clearCache()`
    frees those blocks — absent this call they are reclaimed only when
    the ContextCleaner GCs the reference, i.e. nondeterministically
    across a long single-session sweep (r12 ADVICE). Walks
    `sc.getPersistentRDDs` and unpersists exactly the locally
    checkpointed entries, leaving DataFrame-cached blocks to
    clearCache. Safe between queries: a released checkpoint's
    DataFrame must not be re-read afterwards (its lineage is gone),
    which holds for run-a-query-then-clean loops that rebuild each
    plan from its spec. Callers that DO hold live checkpointed
    DataFrames across the sweep must scope it:
    ``snap = snapshot_checkpoints(spark)`` before the scoped work,
    ``release_session_checkpoints(spark, protect=snap)`` after.
    Returns the number released."""
    n = 0
    for rdd in _checkpointed_rdds(spark):
        if rdd.id() not in protect:
            rdd.unpersist(blocking)
            n += 1
    return n
