"""Connected components + canonical-document selection: the step that
turns near-duplicate PAIRS (minhash/simhash/embedding operators) into
dedup CLUSTERS, so a corpus keeps exactly one representative per
duplicate group.

This is the engine's iterative-algorithm pattern (genuinely
non-SQL-expressible): driver-controlled loop of label-propagation
joins, each iteration a full DataFrame plan, with localCheckpoint()
truncating the lineage so iteration N doesn't re-execute iterations
1..N-1 (the classic iterative-Spark failure mode).

Scale: each iteration is one join + one aggregate on the edge list —
O(E) shuffle per round; rounds needed = graph diameter (near-dup
clusters are shallow, typically <= 3-4 rounds). For web-scale graphs
swap in the large-star/small-star variant; the loop scaffold and
convergence test are identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "doc_id_a",
    dst: str = "doc_id_b",
    max_iterations: int = 20,
) -> DataFrame:
    """Label propagation to a fixed point: every vertex ends with the
    MIN vertex id of its component. Returns (vertex_id, component_id).

    Convergence is detected by an aggregate action per round (sum of
    labels strictly decreases until fixed point); max_iterations bounds
    pathological chains.
    """
    spark = edges.sparkSession
    # undirected: symmetrize the edge list once
    fwd = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    sym = fwd.unionByName(fwd.select(F.col("v").alias("u"), F.col("u").alias("v")))
    sym = sym.distinct().localCheckpoint()

    labels = (
        sym.select(F.col("u").alias("vertex_id"))
        .distinct()
        .withColumn("component_id", F.col("vertex_id"))
        .localCheckpoint()
    )
    prev_sum = None
    for _ in range(max_iterations):
        # each vertex adopts min(own label, neighbors' labels)
        neighbor_min = (
            sym.join(labels, sym.v == labels.vertex_id)
            .groupBy(F.col("u").alias("vertex_id"))
            .agg(F.min("component_id").alias("neighbor_label"))
        )
        labels = (
            labels.join(neighbor_min, "vertex_id", "left")
            .select(
                "vertex_id",
                F.least(
                    F.col("component_id"),
                    F.coalesce(F.col("neighbor_label"), F.col("component_id")),
                ).alias("component_id"),
            )
            .localCheckpoint()  # truncate lineage: O(1) plan per round
        )
        cur_sum = labels.agg(F.sum("component_id")).collect()[0][0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels


def dedup_keep_canonical(
    docs: DataFrame, near_dup_pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """End-to-end near-dup dedup: cluster the pair graph, keep the
    min-id document per cluster, pass through all unpaired documents.

    Returns docs + `component_id` + `is_canonical`; filtering on
    is_canonical yields the deduplicated corpus.
    """
    comp = connected_components(near_dup_pairs)
    joined = docs.join(
        comp.withColumnRenamed("vertex_id", id_col), id_col, "left"
    ).withColumn("component_id", F.coalesce("component_id", F.col(id_col)))
    return joined.withColumn("is_canonical", F.col(id_col) == F.col("component_id"))
