"""Weighted PageRank over the co-occurrence graph — the analysis the
reference *documents* but never implements (relation_graph/readme.md:6,
16-19 name-drops GraphX/PageRank/Louvain; no GraphX call exists —
SURVEY §7.4.6). Implemented as iterative DataFrame joins, no GraphX
dependency.

Scale design:
  * edges are normalized once into a stochastic transition table
    (src, dst, p) — one shuffle to compute out-weight sums, broadcast
    back when the degree table is small (entity graphs: ≤ thousands of
    nodes) or shuffle-joined otherwise;
  * each iteration is contribution = ranks ⋈ transitions → groupBy(dst)
    sum — the standard two-shuffle PageRank step; each iteration's ranks
    are ``localCheckpoint``-ed: persisting alone caches the DATA but the
    logical plan still compounds per iteration until plan
    rendering/analysis blows up (observed: OOM in AQE's explainString at
    ~15 iterations) — lineage truncation is mandatory for iterative
    DataFrame algorithms (and measured faster every iteration than
    batched: plan compilation beats job-scheduling cost on local[32]);
  * dangling mass (nodes with no out-edges) is redistributed uniformly
    each iteration so ranks sum to 1 — required for correctness on
    graphs with sinks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    damping: float = 0.85,
    iterations: int = 20,
    undirected: bool = True,
    checkpoint_every: int = 1,
) -> DataFrame:
    """Return (node, rank) with Σ rank = 1.

    ``edges`` is an edge list; with ``undirected=True`` each edge also
    contributes in reverse (the co-occurrence graph is undirected).
    """
    w = F.col(weight).cast("double") if weight else F.lit(1.0)
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"), w.alias("w"))
    if undirected:
        e = e.unionByName(
            edges.select(
                F.col(dst).alias("s"), F.col(src).alias("d"), w.alias("w")
            )
        )
    # The aggregated edge list is the LAST corpus-sized frame: everything
    # upstream (the caller's edge build — e.g. the entity-hits explode +
    # pair aggregation over the whole document corpus) is expensive,
    # everything downstream is graph-sized. Persist it so `trans` and
    # `nodes` fill from ONE materialization — un-persisted, each pays the
    # full upstream build (measured 2x the corpus shuffle at the 10x
    # rehearsal: 2 x 83 MB at sf10, 2 x 830 MB at the 100x corpus).
    e = e.groupBy("s", "d").agg(F.sum("w").alias("w")).persist()

    out_sum = e.groupBy("s").agg(F.sum("w").alias("out_w"))
    trans = (
        e.join(out_sum, "s")
        .select("s", "d", (F.col("w") / F.col("out_w")).alias("p"))
        .persist()
    )
    nodes = (
        e.select(F.col("s").alias("node"))
        .unionByName(e.select(F.col("d").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    if n == 0:
        # empty graph → empty result with the output schema
        out = nodes.select("node", F.lit(0.0).alias("rank"))
        for c in (trans, nodes, e):
            c.unpersist()
        return out

    # Fill trans from the cached edge list, then drop the edge cache —
    # the iterations only ever touch trans/nodes.
    trans.count()
    e.unpersist()

    ranks = nodes.select("node", (F.lit(1.0) / n).alias("rank")).localCheckpoint()
    pending: list[DataFrame] = []
    for it in range(iterations):
        contribs = (
            ranks.join(trans, ranks["node"] == trans["s"])
            .groupBy(F.col("d").alias("node"))
            .agg(F.sum(F.col("rank") * F.col("p")).alias("contrib"))
            .persist()
        )
        # Dangling mass (rank held by nodes with no outgoing transitions)
        # = 1 - Σcontrib, because transition rows are row-stochastic and
        # ranks sum to 1: Σ_d contrib_d = Σ_{s with out-edges} rank_s.
        # Joined in as a BROADCAST 1-row aggregate — NOT a driver-side
        # .first() (which would block per iteration) and NOT the naive
        # anti-join against trans.select(s).distinct() (which re-shuffles
        # the full transition table every iteration). contribs is
        # persisted so the broadcast build and the rank update share one
        # computation of the join+agg.
        dangling_df = contribs.agg(
            (1.0 - F.coalesce(F.sum("contrib"), F.lit(0.0))).alias("_dangling")
        )
        new_ranks = (
            nodes.join(contribs, "node", "left")
            .crossJoin(F.broadcast(dangling_df))
            .select(
                "node",
                (
                    (1.0 - damping) / n
                    + damping
                    * (
                        F.coalesce(F.col("contrib"), F.lit(0.0))
                        + F.col("_dangling") / n
                    )
                ).alias("rank"),
            )
        )
        pending.append(contribs)
        if (it + 1) % checkpoint_every == 0 or it == iterations - 1:
            # Materialization barrier: truncate lineage (plan rendering
            # blows up around depth ~15) and only now release the
            # iteration caches — the checkpoint holds the data.
            # checkpoint_every=1 measured FASTER than batching (9 s vs
            # 18 s for 15 iterations at sf1): un-truncated multi-
            # iteration towers cost more in analysis/AQE planning than
            # the per-iteration eager job saves. The knob stays for
            # clusters where job-scheduling latency dominates plan
            # compilation.
            ranks = new_ranks.localCheckpoint()
            # Checkpoint RDD blocks are reclaimed by the ContextCleaner
            # once unreferenced (Dataset.unpersist only uncaches
            # persist()-cached plans, not checkpoint RDDs) — `ranks`
            # itself carries the only reference to the previous
            # snapshot, so rebinding it above is what makes those blocks
            # collectable; holding another alias would accumulate one
            # pinned snapshot per barrier.
            for c in pending:
                c.unpersist()
            pending = []
        else:
            ranks = new_ranks
    # the result is a localCheckpoint snapshot — it does not read these
    # caches, so release them instead of leaking them to session end.
    trans.unpersist()
    nodes.unpersist()
    return ranks
