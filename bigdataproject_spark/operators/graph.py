"""Character/entity relation graph (SURVEY §3.2) — DataFrame-native.

Reference: relation_graph/danmaku_analysis_cluster.py:110-167 builds
  * nodes: explode(entities) → groupBy(Id).count() AS Size
  * edges: an RDD flatMap over ``itertools.combinations(sorted(set), 2)``
    followed by reduceByKey — a per-row Python pickling seam (§2.11 R1-R5).

Rebuild: pair generation happens inside the scan stage via higher-order
array functions (:func:`pair_combinations_expr`), so the only shuffles are
the two final aggregations — both map-side combined. The input is cached
once and feeds both branches (the reference does the same, M1 cache at
:128).

Scale: pair explosion is C(n,2) per row in the number of *distinct
entities in one row* (tiny, ≤17 here), not in table size — safe at 100TB.
The aggregation key space is |entities|² — also tiny — so the final
shuffles are trivially broadcast-size.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bigdataproject_spark.functions.entities import (
    extract_entities_expr,
    pair_combinations_expr,
)


def extract_entity_table(
    df: DataFrame, text_col: str, alias_to_canonical: Mapping[str, str]
) -> DataFrame:
    """Append an ``entities`` array column; keep rows with ≥1 hit
    (danmaku_analysis_cluster.py:125-126)."""
    out = df.withColumn(
        "entities", extract_entities_expr(text_col, alias_to_canonical)
    )
    return out.filter(F.size("entities") > 0)


def graph_nodes(entity_df: DataFrame) -> DataFrame:
    """Node table (Id, Size): mention counts over exploded entities
    (danmaku_analysis_cluster.py:131-134), desc by Size with an Id
    tiebreak for determinism."""
    return (
        entity_df.select(F.explode("entities").alias("Id"))
        .groupBy("Id")
        .agg(F.count(F.lit(1)).alias("Size"))
        .orderBy(F.desc("Size"), F.asc("Id"))
    )


def graph_edges(entity_df: DataFrame) -> DataFrame:
    """Edge table (Source, Target, Weight): per-row C(n,2) sorted pairs,
    summed (danmaku_analysis_cluster.py:139-152) — no RDD, no self-join;
    Source < Target lexically (undirected canonical form)."""
    pairs = entity_df.select(
        F.explode(pair_combinations_expr("entities")).alias("p")
    )
    return (
        pairs.select(F.col("p.src").alias("Source"), F.col("p.dst").alias("Target"))
        .groupBy("Source", "Target")
        .agg(F.count(F.lit(1)).alias("Weight"))
        .orderBy(F.desc("Weight"), F.asc("Source"), F.asc("Target"))
    )


def graph_topology(entity_df: DataFrame) -> DataFrame:
    """Nodes AND edges from ONE extraction pass and ONE shuffle:
    (part, src, dst, weight) where part='node' rows are the
    :func:`graph_nodes` table (src=Id, dst='', weight=Size) and
    part='edge' rows the :func:`graph_edges` table (Source/Target/
    Weight). The naive merge — ``nodes(ent) UNION ALL edges(ent)`` —
    pays the per-row alias-contains extraction TWICE (one scan per
    branch; nothing to reuse, there's no exchange below the union).
    Here each row emits its node units and its C(n,2) pair units in a
    single higher-order concat inside the scan stage, so the corpus is
    read and extracted ONCE and the only shuffle is the final
    count aggregate over the tiny (part, src, dst) key space —
    map-side combined, broadcast-sized, exactly like the standalone
    queries' finals. At 100 TB the extraction map pass dominates both
    standalone queries; halving it is the whole point of the merge."""
    units = F.concat(
        F.transform(
            "entities",
            lambda e: F.struct(
                F.lit("node").alias("part"),
                e.alias("src"),
                F.lit("").alias("dst"),
            ),
        ),
        F.transform(
            pair_combinations_expr("entities"),
            lambda p: F.struct(
                F.lit("edge").alias("part"),
                p["src"].alias("src"),
                p["dst"].alias("dst"),
            ),
        ),
    )
    return (
        entity_df.select(F.explode(units).alias("u"))
        .select("u.part", "u.src", "u.dst")
        .groupBy("part", "src", "dst")
        .agg(F.count(F.lit(1)).alias("weight"))
        .orderBy(
            F.asc("part"), F.desc("weight"), F.asc("src"), F.asc("dst")
        )
    )


def build_graph(
    df: DataFrame, text_col: str, alias_to_canonical: Mapping[str, str]
) -> tuple[DataFrame, DataFrame]:
    """(nodes, edges) from a raw text table; input cached for the two
    consumers (M1, danmaku_analysis_cluster.py:128)."""
    ent = extract_entity_table(df, text_col, alias_to_canonical).cache()
    return graph_nodes(ent), graph_edges(ent)
