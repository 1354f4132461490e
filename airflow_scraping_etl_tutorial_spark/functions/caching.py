"""Persisted-intermediate bookkeeping for multi-consumer operators.

Operators like minhash_near_duplicates persist() an intermediate that
several branches of the returned plan re-read (signatures feed the LSH
self-join AND both verify lookups). The persist is correct — without it
the shingle/hash map work runs 3x — but the cached blocks outlive the
operator call, and a long-lived session that never calls
spark.catalog.clearCache() leaks them.

The contract here: an operator that persists intermediates tags the
returned DataFrame with the persisted handles; callers release them
with `release_intermediates(df)` once the result has been materialized
(collected/written). bench.py's clearCache-per-query achieves the same
thing wholesale; this is the targeted form for library callers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_ATTR = "_sg_persisted_intermediates"


def tag_intermediates(result: DataFrame, *persisted: DataFrame) -> DataFrame:
    """Record persisted upstream DataFrames on the result (merging with
    any handles already tagged by an upstream operator)."""
    existing = list(getattr(result, _ATTR, ()))
    setattr(result, _ATTR, existing + list(persisted))
    return result


def release_intermediates(result: DataFrame, blocking: bool = False) -> int:
    """Unpersist every intermediate tagged on `result`. Call AFTER the
    result has been materialized — the plan re-executes from scratch if
    it is evaluated again later. Returns the number released."""
    handles = getattr(result, _ATTR, ())
    for df in handles:
        df.unpersist(blocking=blocking)
    n = len(handles)
    if handles:
        setattr(result, _ATTR, [])
    return n
