"""Community detection over the co-occurrence graph — the reference's
readme advertises Louvain (relation_graph/readme.md:16-19) but implements
nothing; this provides weighted synchronous Label Propagation (LPA), the
standard scalable DataFrame formulation (Louvain's modularity loop needs
fine-grained sequential moves that fight the bulk-synchronous model; LPA
converges to comparable communities for the small-diameter graphs this
engine targets and is embarrassingly parallel).

Determinism: ties in the neighbor-label vote resolve to the smallest
label; labels init to the node's own id, so output is reproducible.
Same iterative hygiene as pagerank.py: per-iteration localCheckpoint —
persist alone lets the logical plan compound until analysis blows up.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bigdataproject_spark.session import release_local_checkpoint


def label_propagation(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    iterations: int = 10,
) -> DataFrame:
    """Return (node, community) — community = converged min-label.

    Undirected: each edge votes in both directions. One groupBy per
    direction-expanded edge set per iteration; vote argmax via a window
    over (node) ordered by (weight desc, label asc).
    """
    w = F.col(weight).cast("double") if weight else F.lit(1.0)
    both = edges.select(
        F.col(src).alias("a"), F.col(dst).alias("b"), w.alias("w")
    ).unionByName(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"), w.alias("w"))
    )
    both = both.groupBy("a", "b").agg(F.sum("w").alias("w")).localCheckpoint()

    labels = both.select(F.col("a").alias("node")).distinct().withColumn(
        "label", F.col("node")
    ).localCheckpoint()

    rank_w = Window.partitionBy("node").orderBy(
        F.desc("vote_w"), F.asc("label")
    )
    for _ in range(iterations):
        votes = (
            both.join(labels, both["b"] == labels["node"])
            .select(F.col("a").alias("node"), "label", "w")
            .groupBy("node", "label")
            .agg(F.sum("w").alias("vote_w"))
        )
        new_labels = (
            votes.withColumn("rn", F.row_number().over(rank_w))
            .filter(F.col("rn") == 1)
            .select("node", "label")
        )
        old = labels
        labels = new_labels.localCheckpoint()
        release_local_checkpoint(old)
    return labels.withColumnRenamed("label", "community")
