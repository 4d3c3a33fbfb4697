"""Relation-graph queries (SURVEY §3.2) on the documents table.

The alias→canonical dictionary plays the role of the reference's 33-alias
character dictionary (relation_graph/danmaku_analysis_cluster.py:40-100);
here it maps the testdata vocabulary onto canonical "operator" entities.
Substring-containment semantics are preserved exactly (an alias matches
anywhere in the text, not per-token).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdataproject_spark.contract import Query as _q
from bigdataproject_spark.operators.graph import (
    extract_entity_table,
    graph_edges,
    graph_nodes,
    graph_topology,
)
from bigdataproject_spark.functions.entities import canonical_names
from bigdataproject_spark.sources.readers import fan_out, load_table

# 16 aliases → 9 canonical entities (analogue of the reference's 33 → 17).
DOC_ALIASES: dict[str, str] = {
    "spark": "Spark",
    "catalyst": "Spark",
    "stream": "Streaming",
    "batch": "Batch",
    "join": "Join",
    "merge": "Join",
    "scan": "Scan",
    "filter": "Scan",
    "window": "Window",
    "agg": "Aggregate",
    "group": "Aggregate",
    "sort": "Sort",
    "order": "Sort",
    "hash": "Hash",
    "vector": "Vector",
    "column": "Vector",
}

# The int-code table for the graph operators' map-back (r13 — see
# _entities): code i == the i-th smallest canonical name.
GRAPH_NAMES = canonical_names(DOC_ALIASES)

_ALIAS_VALUES = ", ".join(f"('{a}', '{c}')" for a, c in DOC_ALIASES.items())
_HITS_CTE = f"""
hits AS (
  SELECT DISTINCT d.doc_id, m.c AS entity
  FROM documents d
  JOIN (VALUES {_ALIAS_VALUES}) AS m(a, c) ON contains(d.text, m.a)
)
"""


def _entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fan_out: per-alias contains() extraction is a heavy map over text —
    # it must not serialize onto one core for a small/single-split source
    # (identity at scale; measured 28 s single-core at a 100× scale-up).
    #
    # r12 optimization round: NO ``size(entities) > 0`` filter (the
    # extract_entity_table shape) on this path. Every graph consumer
    # explodes the array — empty arrays vanish in the Generate, so the
    # filter is semantically redundant here, and physically it DOUBLED
    # the extraction cost: the optimizer rewrites a filter on the
    # projected alias into a filter on the extraction EXPRESSION and
    # pushes it below the fan_out exchange, so the whole 16-alias
    # contains + HOF chain ran once in the pushed filter (on the
    # single pre-exchange core locally) and again in the projection —
    # the same 2× applies inside a multi-split scan stage at 100 TB.
    #
    # r13 optimization round: entities are INT CODES
    # (extract_entity_codes_expr), not name strings — the explode
    # streams and the pair/count aggregates hash 4-byte ints and the
    # code → name map-back runs on the tiny aggregated outputs
    # (CPU receipt at sf10: graph_edges 13.9–14.9 → 10.1–11.5 CPU-s,
    # bit-equal output; codes are lex-ordered so every comparison
    # commutes with the mapping). Callers pass GRAPH_NAMES to the
    # operators for the map-back.
    from bigdataproject_spark.functions.entities import (
        extract_entity_codes_expr,
    )

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    return docs.withColumn(
        "entities", extract_entity_codes_expr("text", DOC_ALIASES)
    )


def q_graph_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity mention counts (nodes CSV shape ``Id,Size`` —
    dataset_processed/fanRen_result_nodes.csv)."""
    return graph_nodes(_entities(spark, sf_dir), GRAPH_NAMES)


ORACLE_GRAPH_NODES = f"""
WITH {_HITS_CTE}
SELECT entity AS "Id", count(*) AS "Size"
FROM hits GROUP BY 1 ORDER BY "Size" DESC, "Id" ASC
"""


def q_graph_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise co-occurrence counts (edges CSV shape
    ``Source,Target,Weight`` — fanRen_result_edges.csv), Source<Target."""
    return graph_edges(_entities(spark, sf_dir), GRAPH_NAMES)


ORACLE_GRAPH_EDGES = f"""
WITH {_HITS_CTE}
SELECT a.entity AS "Source", b.entity AS "Target", count(*) AS "Weight"
FROM hits a JOIN hits b ON a.doc_id = b.doc_id AND a.entity < b.entity
GROUP BY 1, 2 ORDER BY "Weight" DESC, "Source" ASC, "Target" ASC
"""


def q_graph_topology(spark: SparkSession, sf_dir: str) -> DataFrame:
    """graph_nodes + graph_edges in ONE seam-tagged entry (r12: the r9
    ANN-merge / r10 text-merge / r11 word-count-merge trick applied to
    the graph family, freeing a registry slot for the span_dedup_report
    bisect; r13: the bisect is repaid, so this merge lives in
    EXTRA_PARITY while the standalones hold the declared registry
    rows): the node table (Id, Size) and
    the edge table (Source, Target, Weight) share one entity
    extraction, UNION ALL under a ``part`` tag. Node rows carry
    dst = '' (not NULL: the driver canonicalizer sorts raw Python
    tuples and a None/str comparison would throw if two rows ever tied
    on the earlier columns). Both halves stay independently
    hash-checked through their tagged partitions; the standalone
    queries stay alive in EXTRA_PARITY and bench.py keeps timing the
    standalone graph_edges plan (r12 optimization round: that plan
    dropped its presentation sort and the redundant pushed
    size-filter — see OPTIMIZATION_r12.md — so the headline series has
    one documented shape change there).

    r12 follow-up: the first registry version union'd the two
    standalone plans, paying the scan + per-row alias-contains
    extraction TWICE (one corpus scan per branch — fan_out is identity
    on multi-split sources, so the union had no exchange to reuse).
    Now delegates to the shared-exchange
    :func:`~bigdataproject_spark.operators.graph.graph_topology`
    operator — one scan+extraction feeding a compact entities
    repartition both branches reuse; the shape won a measured
    three-way CPU receipt at sf100 over both the naive union and a
    single-explode higher-order fusion (see the operator docstring and
    SCALING.md r12). Row-identical to the union of the standalone
    tables
    (tests/test_golden_reference.py::test_graph_topology_one_pass_equals_union_of_halves)."""
    return graph_topology(_entities(spark, sf_dir), GRAPH_NAMES)


ORACLE_GRAPH_TOPOLOGY = f"""
SELECT 'node' AS part, "Id" AS src, '' AS dst, "Size" AS weight
FROM ({ORACLE_GRAPH_NODES})
UNION ALL
SELECT 'edge' AS part, "Source" AS src, "Target" AS dst, "Weight" AS weight
FROM ({ORACLE_GRAPH_EDGES})
"""


def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank over the co-occurrence graph — the analysis the
    reference documents but never implements (relation_graph/readme.md:6,
    16-19; SURVEY §7.4.6 optional extension). Iterative DataFrame joins
    with per-iteration lineage truncation; rows-only (iterative, not
    SQL-expressible)."""
    from pyspark.sql import functions as F

    from bigdataproject_spark.operators.pagerank import pagerank

    edges = graph_edges(_entities(spark, sf_dir), GRAPH_NAMES)
    pr = pagerank(
        edges, src="Source", dst="Target", weight="Weight", iterations=15
    )
    return pr.select("node", F.round("rank", 8).alias("rank"))


def q_graph_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted label-propagation communities over the co-occurrence graph
    (the readme-advertised Louvain capability; see operators/communities.py
    for why LPA is the scalable stand-in). Rows-only (iterative)."""
    from pyspark.sql import functions as F

    from bigdataproject_spark.operators.communities import label_propagation

    edges = graph_edges(_entities(spark, sf_dir), GRAPH_NAMES)
    out = label_propagation(
        edges, src="Source", dst="Target", weight="Weight", iterations=8
    )
    return out


def _pagerank_oracle(iterations: int = 15, damping: float = 0.85) -> str:
    """Exact DuckDB oracle for the fixed-iteration PageRank: the loop is
    unrolled into chained CTEs (one contrib/total/rank triple per
    iteration), mirroring the engine's dangling-mass-as-(1 - Σcontrib)
    formulation. Plain CTEs (not WITH RECURSIVE) so each step can be
    referenced twice — once for contribs, once for the dangling total."""
    edges_cte = f"""
e AS (
  SELECT "Source" AS s, "Target" AS d, CAST("Weight" AS DOUBLE) AS w FROM g
  UNION ALL
  SELECT "Target" AS s, "Source" AS d, CAST("Weight" AS DOUBLE) AS w FROM g
),
eg AS (SELECT s, d, sum(w) AS w FROM e GROUP BY 1, 2),
outw AS (SELECT s, sum(w) AS out_w FROM eg GROUP BY 1),
trans AS MATERIALIZED (SELECT eg.s, eg.d, eg.w / outw.out_w AS p
          FROM eg JOIN outw ON eg.s = outw.s),
nodes AS (SELECT DISTINCT s AS node FROM e),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS cnt FROM nodes),
it0 AS (SELECT node, 1.0 / nn.cnt AS rank FROM nodes CROSS JOIN nn)"""
    steps = []
    for k in range(iterations):
        steps.append(f"""
c{k} AS MATERIALIZED (SELECT t.d AS node, sum(p.rank * t.p) AS contrib
         FROM it{k} p JOIN trans t ON p.node = t.s GROUP BY 1),
tot{k} AS (SELECT coalesce(sum(contrib), 0.0) AS total FROM c{k}),
it{k + 1} AS MATERIALIZED (
  SELECT nd.node,
         (1 - {damping}) / nn.cnt
         + {damping} * (coalesce(c.contrib, 0.0) + (1 - tot.total) / nn.cnt)
           AS rank
  FROM nodes nd CROSS JOIN nn CROSS JOIN tot{k} tot
  LEFT JOIN c{k} c ON c.node = nd.node)""")
    return (
        "WITH " + _HITS_CTE + f""",
g AS (
  SELECT a.entity AS "Source", b.entity AS "Target", count(*) AS "Weight"
  FROM hits a JOIN hits b ON a.doc_id = b.doc_id AND a.entity < b.entity
  GROUP BY 1, 2
),"""
        + edges_cte + "," + ",".join(steps)
        + f"""
SELECT node, round(rank, 8) AS rank FROM it{iterations}
ORDER BY rank DESC, node ASC"""
    )


def _lpa_oracle(iterations: int = 8) -> str:
    """Exact DuckDB oracle for synchronous weighted LPA: unrolled vote /
    argmax (row_number over vote_w DESC, label ASC) per iteration —
    deterministic because weights are integer-valued and ties break to
    the smallest label, exactly as operators/communities.py."""
    steps = []
    for k in range(iterations):
        steps.append(f"""
v{k} AS (SELECT eg.a AS node, l.label, sum(eg.w) AS vote_w
         FROM eg JOIN l{k} l ON eg.b = l.node GROUP BY 1, 2),
l{k + 1} AS (
  SELECT node, label FROM (
    SELECT node, label,
           row_number() OVER (PARTITION BY node
                              ORDER BY vote_w DESC, label ASC) AS rn
    FROM v{k}) WHERE rn = 1)""")
    return (
        "WITH " + _HITS_CTE + f""",
g AS (
  SELECT a.entity AS "Source", b.entity AS "Target", count(*) AS "Weight"
  FROM hits a JOIN hits b ON a.doc_id = b.doc_id AND a.entity < b.entity
  GROUP BY 1, 2
),
e AS (
  SELECT "Source" AS a, "Target" AS b, CAST("Weight" AS DOUBLE) AS w FROM g
  UNION ALL
  SELECT "Target" AS a, "Source" AS b, CAST("Weight" AS DOUBLE) AS w FROM g
),
eg AS (SELECT a, b, sum(w) AS w FROM e GROUP BY 1, 2),
l0 AS (SELECT DISTINCT a AS node, a AS label FROM eg),"""
        + ",".join(steps)
        + f"""
SELECT node, label AS community FROM l{iterations}
ORDER BY community ASC, node ASC"""
    )


GRAPH_QUERIES = {
    # r13: the span_dedup_report bisect is cashed in (root cause found
    # and fixed — see queries_pipeline.py's registry note), so the r11
    # declared rows return: graph_nodes + graph_edges are standing
    # driver rows again and the seam-tagged graph_topology merge moves
    # to EXTRA_PARITY (its oracle + one-pass operator stay fully
    # exercised there and in tests/test_golden_reference.py).
    "graph_nodes": _q(q_graph_nodes, ORACLE_GRAPH_NODES),
    "graph_edges": _q(q_graph_edges, ORACLE_GRAPH_EDGES),
    "graph_pagerank": _q(q_graph_pagerank, _pagerank_oracle()),
    "graph_communities": _q(q_graph_communities, _lpa_oracle()),
}
