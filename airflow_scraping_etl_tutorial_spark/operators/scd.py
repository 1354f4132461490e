"""Slowly-changing-dimension (SCD2) upserts and MERGE emulation on
plain parquet — the general form of the pipeline's idempotent daily
load (SURVEY.md §7 hard-part 1: "idempotent append without Delta").

`merge_upsert` is the MERGE INTO ... WHEN MATCHED UPDATE / WHEN NOT
MATCHED INSERT equivalent; `scd2_apply` keeps full history with
effective_from/effective_to validity intervals. Both are pure
DataFrame compositions (anti-join + union + window), so they run
anywhere parquet runs; on a Delta/Iceberg deployment the same call
sites swap to native MERGE and the rest of the pipeline is unchanged.

Scale: both shapes shuffle once on the business key. The rewrite
rewrites the WHOLE snapshot — the right call at dimension scale
(dimensions are small); for fact-sized mutable tables use the
partition-overwrite path instead (sinks.overwrite_day_partitions),
which touches only dirty partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def merge_upsert(current: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """MERGE emulation: rows from `updates` win on key collision, rows
    only in `current` survive (anti-join + union — no per-row lookups).
    """
    kept = current.join(updates.select(key), key, "left_anti")
    return kept.unionByName(updates)


def scd2_apply(
    history: DataFrame | None,
    updates: DataFrame,
    key: str,
    effective_ts: str,
    tracked_cols: tuple[str, ...],
) -> DataFrame:
    """Type-2 SCD: append-only history with validity intervals.

    history: previous SCD2 table (or None on first load) with columns
    [key, *tracked_cols, effective_from, effective_to, is_current].
    updates: new snapshots, one row per (key, effective_ts).

    A new version opens whenever any tracked column changed vs the
    key's previous version (lag window over the combined stream);
    unchanged snapshots are dropped, intervals are closed by the next
    version's start (open versions get effective_to = NULL).
    """
    new = updates.select(
        F.col(key),
        *[F.col(c) for c in tracked_cols],
        F.col(effective_ts).alias("effective_from"),
    )
    if history is not None:
        old = history.select(key, *tracked_cols, "effective_from")
        combined = old.unionByName(new)
    else:
        combined = new

    w = W.partitionBy(key).orderBy("effective_from")
    # Null-disambiguated fingerprint: xxhash64 SKIPS null inputs (the
    # seed passes through unchanged), so hash(X, NULL) == hash(NULL, X)
    # and nulling a tracked column leaves the raw hash unchanged — an
    # update that only moves/nulls values would be dropped as
    # "unchanged". Casting every column to string and coalescing nulls
    # to a sentinel keeps each column slot position-distinct.
    _null_sentinel = "\x00<NULL>\x00"
    fingerprint = F.xxhash64(
        *[
            F.coalesce(F.col(c).cast("string"), F.lit(_null_sentinel))
            for c in tracked_cols
        ]
    )
    changed = combined.withColumn(
        "_changed",
        F.lag(fingerprint).over(w).isNull() | (F.lag(fingerprint).over(w) != fingerprint),
    ).filter(F.col("_changed"))

    w2 = W.partitionBy(key).orderBy("effective_from")
    return (
        changed.withColumn("effective_to", F.lead("effective_from").over(w2))
        .withColumn("is_current", F.col("effective_to").isNull())
        .drop("_changed")
    )
