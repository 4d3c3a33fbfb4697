"""Distributed connected components + near-dup cluster collapse.

The dedup operators (operators/dedup.py) emit verified PAIRS
(id_a, id_b). A training-data pipeline needs the next stage: group the
pairs into transitive CLUSTERS and keep one survivor per cluster —
near-duplicate similarity is not transitive, but dedup policy treats it
as an equivalence ("if A~B and B~C, keep one of {A,B,C}"), exactly the
connected-components problem on the pair graph. The reference never
reaches this stage (its dedup is the crawler's exact dmid skip,
crawler/spider_worker.py:73-77); this is a north-star op per
BASELINE.json.

Algorithm: alternating large-star / small-star (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) — the standard
shuffle-bound formulation that converges in O(log^2 n) rounds without
ever materializing a neighbor list (no collect_list: a 100M-node hub
would OOM an ObjectHashAggregate; here the per-node reduction is a
plain min, map-side combinable). Each round is two shuffles (groupBy
min + equi-join back); per-iteration localCheckpoint truncates the
compounding plan exactly as pagerank.py/communities.py do. The
convergence probe is one tiny aggregate action per round (count +
checksum of the edge set) — an AQE-style runtime decision over a frame
the next round must materialize anyway, not a data-sized collect.

Label semantics: every node's component id is the MINIMUM node id in
its component — deterministic, join-free to interpret, and directly
usable as the survivor rule ("keep the min id") or as a cluster key
for smarter survivor policies (longest doc, highest quality score).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bigdataproject_spark.session import release_local_checkpoint


def connected_components(
    edges: DataFrame,
    *,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Return (node, component) for every node that appears in ``edges``.

    ``component`` is the minimum node id of the connected component.
    Works for any orderable id type (numeric, string). Self-loops and
    duplicate/reversed edges are tolerated. Raises if ``max_iter``
    rounds don't converge (log2^2-round bound makes 25 ≈ graphs far
    beyond any real corpus; non-convergence means id-type comparison
    is broken, better loud than silently wrong labels).
    """
    raw = edges.select(
        F.greatest(F.col(src), F.col(dst)).alias("u"),
        F.least(F.col(src), F.col(dst)).alias("v"),
    )
    e = raw.where(F.col("u") != F.col("v")).distinct().localCheckpoint()
    # all_nodes fixed up-front FROM THE RAW EDGES (before the self-loop
    # filter — a node appearing only as (x, x) is still a member, a
    # singleton component), because star rounds drop nodes once they
    # point directly at their component min.
    all_nodes = (
        raw.select(F.col("u").alias("node"))
        .unionByName(raw.select(F.col("v").alias("node")))
        .distinct()
        .localCheckpoint()
    )

    def _signature(df: DataFrame) -> tuple:
        # XOR, not SUM: order-free, overflow-free under ANSI mode, and
        # collision-sound because the edge set is distinct.
        row = df.select(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(xxhash64(u, v))").alias("chk"),
        ).first()
        return (row["n"], row["chk"])

    sig = _signature(e)
    for _ in range(max_iter):
        # large-star: for every node u, link each STRICTLY LARGER
        # neighbor v to m = min(neighbors(u) ∪ {u}). Edge set here is
        # direction-expanded so each node sees its full neighborhood.
        both = e.select("u", "v").unionByName(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mins = both.groupBy("u").agg(F.min("v").alias("mv"))
        mins = mins.select(
            "u", F.least(F.col("u"), F.col("mv")).alias("m")
        )
        large = (
            both.join(mins, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        # small-star: orient edges large→small (u > v); for each u link
        # all of its ≤ neighbors AND u itself to their min.
        oriented = large.where(F.col("u") != F.col("v")).distinct()
        smins = oriented.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            oriented.join(smins, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionByName(smins.select(F.col("u"), F.col("m").alias("v")))
        )
        new_e = (
            small.where(F.col("u") != F.col("v"))
            .distinct()
            .select(
                F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
            )
            .distinct()
            .localCheckpoint()
        )
        old = e
        e = new_e
        new_sig = _signature(e)
        # old is a localCheckpoint'd frame: Dataset.unpersist would be a
        # no-op on its checkpoint blocks (see session.release_local_checkpoint)
        release_local_checkpoint(old)
        if new_sig == sig:
            break
        sig = new_sig
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds"
        )

    # converged edge set is a star forest: u (non-root) -> v (= root).
    labels = e.select(F.col("u").alias("node"), F.col("v").alias("component"))
    roots = all_nodes.join(
        labels.select("node"), "node", "left_anti"
    ).select("node", F.col("node").alias("component"))
    return labels.unionByName(roots)


def dedup_cluster_assignment(
    docs: DataFrame,
    pairs: DataFrame,
    *,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Per-document near-dup cluster label + survivor flag.

    Returns (id_col, cluster_id, is_survivor): cluster_id = min doc id
    reachable through ``pairs`` (docs in no pair are their own
    singleton cluster), is_survivor = keep-the-min-id policy. The
    components frame is tiny relative to the corpus (only docs that
    appear in a pair), so the label join broadcasts under AQE at any
    realistic dup rate; the corpus itself is never shuffled.
    """
    comp = connected_components(pairs, src=src, dst=dst, max_iter=25)
    out = docs.join(
        comp.withColumnRenamed("node", id_col),
        on=id_col,
        how="left",
    )
    cluster = F.coalesce(F.col("component"), F.col(id_col))
    return out.select(
        F.col(id_col),
        cluster.alias("cluster_id"),
        (cluster == F.col(id_col)).alias("is_survivor"),
    )


def drop_near_duplicates(
    docs: DataFrame,
    pairs: DataFrame,
    *,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Filter ``docs`` to one survivor per near-dup cluster (min id)."""
    assign = dedup_cluster_assignment(
        docs, pairs, id_col=id_col, src=src, dst=dst
    )
    keep = assign.where("is_survivor").select(id_col)
    return docs.join(keep, id_col, "left_semi")
