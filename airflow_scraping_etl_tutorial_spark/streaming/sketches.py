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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

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
