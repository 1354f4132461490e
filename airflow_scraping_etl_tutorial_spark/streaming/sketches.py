"""Streaming HyperLogLog register maintenance.

The register vector is the rare aggregate that streams PERFECTLY:
MAX is monotone and insensitive to duplicates, so the running state is
256 small ints, needs no watermark to stay bounded, and — because the
same md5-derived math runs in batch (operators/sketches.py, q215/q231)
— the streaming state equals the batch sketch at every point where the
inputs align (asserted in tests/test_streaming.py). This is the
streaming half of the 100 TB cardinality story: a continuous ingest
keeps a live "how many distinct tokens/keys have we ever seen?" answer
with constant memory, and the vector MAX-merges with any other
corpus's vector (q231's set algebra) without replay.

Reference parity: the reference's daily job re-counts its table to
decide idempotency (dags/insert_data.py:96-104); a register vector is
the same contract maintained incrementally.
"""

from __future__ import annotations

import json
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.sketches import hll_bucket_rho


def streaming_hll_registers(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Running (bucket, reg) register state over a streaming text
    column. Use outputMode complete (256-row result) — the unbounded
    MAX aggregate's state IS the sketch. No distinct pass: MAX over
    repeated tokens is idempotent, which is exactly why the sketch
    streams where COUNT(DISTINCT) cannot."""
    toks = df.select(F.explode(F.split(F.col(text_col), " ")).alias("tok"))
    return hll_bucket_rho(toks).groupBy("bucket").agg(F.max("rho").alias("reg"))


def streaming_countmin_counters(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Running count-min counter matrix over a streaming text column:
    CM_D x CM_W cells, each a running COUNT — linear state that merges
    by + (the batch/partition merge) and needs no watermark. Complete
    output mode; the live matrix upper-bounds every token's frequency
    at every point in the stream."""
    from ..operators.sketches import cm_cells

    toks = df.select(F.explode(F.split(F.col(text_col), " ")).alias("tok"))
    return cm_cells(toks).groupBy("row", "k").agg(F.count(F.lit(1)).alias("v"))


def streaming_bloom_bitmap(
    df: DataFrame,
    key_col: str = "text",
    m_bits: int = 65536,
    k_hashes: int = 4,
) -> DataFrame:
    """Running Bloom bitmap over a streaming key column — the third
    mergeable-state shape (HLL merges by MAX, count-min by +, Bloom by
    bitwise OR). State is at most m/60 (word, bits) rows regardless of
    stream length; a snapshot at any point is a valid
    never-false-negative membership screen for everything ingested so
    far (operators/membership.py's probe works on it unchanged) — the
    live form of the q208 incremental-ingest split."""
    from ..operators.membership import bloom_bitmap

    return bloom_bitmap(df, key_col=key_col, m_bits=m_bits, k_hashes=k_hashes)


def streaming_histogram(
    df: DataFrame,
    value_col: str = "value",
    lo: float = 0.0,
    hi: float = 1000.0,
    n_bins: int = 256,
) -> DataFrame:
    """Running fixed-edge histogram over a streaming numeric column —
    the fourth mergeable-state shape (HLL merges by MAX, count-min
    by +, Bloom by OR; the histogram's per-bin COUNTs also merge
    by +, which q278 proves as data on the batch side). Edges are
    FIXED parameters: a stream cannot make a global min/max pass
    first, so production picks edges from yesterday's batch stats
    (q267's 1-row (lo, hi) aggregate) and the clamped edge bins
    absorb drift. State is ≤ n_bins rows regardless of stream
    length; complete output mode; a snapshot at any point is the
    exact histogram of everything ingested so far, and q267's
    quantile estimator reads it unchanged."""
    from ..operators.sketches import fixed_bin

    return (
        df.filter(F.col(value_col).isNotNull())
        .select(fixed_bin(F.col(value_col), lo, hi, n_bins).alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def streaming_ams_sums(
    df: DataFrame, key_col: str = "user_id", n_est: int = 8
) -> DataFrame:
    """Running AMS signed-counter state over a streaming key column —
    the fifth mergeable-state shape (see operators/sketches.ams_sums,
    the batch twin this must equal after any drain). Each of the
    n_est counters is a SUM of ±1 md5-parity signs, so the state is
    n_est integers, needs no watermark, and a snapshot's s² values
    are live unbiased estimates of the stream's self-join size
    Σ f² — the quantity q314 audits against ground truth in batch.
    Complete output mode; counters merge across streams by +."""
    from ..operators.sketches import ams_sums

    # delegate to the batch twin: ONE implementation of the reduction
    # (groupBy-sum is stream-legal, so the same code serves both)
    return ams_sums(df, key_col, n_est)


def streaming_weighted_sample(
    df: DataFrame,
    id_col: str = "doc_id",
    key_col: str = "skey",
    k: int = 50,
    n_shards: int = 4,
) -> DataFrame:
    """Running Efraimidis-Spirakis weighted sample over a streaming
    (id, selection-key) column pair — the SIXTH mergeable-state shape
    (HLL merges by MAX, count-min/histogram/AMS by +, Bloom by OR;
    a bounded top-k set merges by union-then-top-k, which q345
    proves as data on the batch side). The caller derives the A-ES
    selection key ln(u)/w deterministically (q339's md5 construction)
    so the sample is a pure function of the items seen — any drain
    point yields exactly the batch sample of the ingested prefix.

    Top-k is not a built-in streaming aggregate, so this is the
    applyInPandasWithState escape hatch: ids are hash-sharded into
    n_shards state keys, each holding AT MOST k rows (a JSON-encoded
    (id, key) list — constant memory per shard regardless of stream
    length), and each micro-batch re-emits the shard's current top-k
    tagged with a version number. The union of the shards' latest
    emissions, re-topped to k, IS the global sample — the same
    union-then-top-k merge a 1000-executor batch job would run, so
    sharding is the scale story, not a compromise.
    """

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            items, v = json.loads(state.get[0]), state.get[1]
            items = [(int(i), float(s)) for i, s in items]
        else:
            items, v = [], 0
        for pdf in pdfs:
            items.extend(
                zip(
                    pdf[id_col].astype("int64").tolist(),
                    pdf[key_col].astype("float64").tolist(),
                )
            )
        items.sort(key=lambda t: (-t[1], t[0]))
        items = items[:k]
        v += 1
        state.update((json.dumps(items), v))
        yield pd.DataFrame(
            {
                "shard": [key[0]] * len(items),
                "version": [v] * len(items),
                "shard_rank": list(range(1, len(items) + 1)),
                id_col: [i for i, _ in items],
                key_col: [s for _, s in items],
            }
        )

    return df.withColumn(
        "shard", (F.col(id_col) % n_shards).cast("long")
    ).groupBy("shard").applyInPandasWithState(
        update,
        outputStructType=(
            f"shard long, version long, shard_rank int,"
            f" {id_col} long, {key_col} double"
        ),
        stateStructType="s string, v long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
