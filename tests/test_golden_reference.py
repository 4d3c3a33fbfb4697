"""Golden-output regression (SURVEY §5.3): rebuild the relation graph from
the reference's own input CSVs with its alias dictionary and compare
against the committed golden outputs
(relation_graph/dataset_processed/fanRen_result_*.csv).

The snapshot is missing 29 of the 凡人修仙传 input files
(.MISSING_LARGE_BLOBS), so counts are strict LOWER bounds of the golden
numbers: we assert exact set-level parity (same 17 node Ids, edges a
⊆ of the 99 golden edges, nothing extra) and that every count is within
(0.5, 1.0] of golden — loose enough for the missing files, tight enough
to catch any semantic drift in entity extraction or pair generation.
"""

from __future__ import annotations

import csv
import os

import pytest

from bigdataproject_spark.data_dicts import FANREN_ALIASES
from bigdataproject_spark.operators.graph import (
    extract_entity_table,
    graph_edges,
    graph_nodes,
)
from bigdataproject_spark.sources.readers import read_danmaku_csv

_REF = "/root/reference"
_DATA = f"{_REF}/data/凡人修仙传"
_GOLD = f"{_REF}/relation_graph/dataset_processed"

pytestmark = pytest.mark.skipif(
    not (os.path.isdir(_DATA) and os.path.isdir(_GOLD)),
    reason="reference snapshot not available",
)


@pytest.fixture(scope="module")
def computed(spark):
    df = read_danmaku_csv(spark, f"{_DATA}/danmaku_*.csv")
    ent = extract_entity_table(df, "text", FANREN_ALIASES).cache()
    nodes = {r.Id: r.Size for r in graph_nodes(ent).collect()}
    edges = {(r.Source, r.Target): r.Weight for r in graph_edges(ent).collect()}
    ent.unpersist()
    return nodes, edges


def _golden():
    nodes = {}
    with open(f"{_GOLD}/fanRen_result_nodes.csv", encoding="utf-8-sig") as f:
        for row in csv.DictReader(f):
            nodes[row["Id"]] = int(row["Size"])
    edges = {}
    with open(f"{_GOLD}/fanRen_result_edges.csv", encoding="utf-8-sig") as f:
        for row in csv.DictReader(f):
            a, b = sorted([row["Source"], row["Target"]])
            edges[(a, b)] = int(row["Weight"])
    return nodes, edges


def test_node_parity(computed):
    nodes, _ = computed
    gold_nodes, _ = _golden()
    assert set(nodes) == set(gold_nodes)  # exactly the 17 canonical characters
    for k, gold in gold_nodes.items():
        assert 0.5 * gold < nodes[k] <= gold, (k, nodes[k], gold)


def test_edge_parity(computed):
    _, edges = computed
    _, gold_edges = _golden()
    extra = set(edges) - set(gold_edges)
    assert not extra  # no pair we emit is absent from golden
    covered = set(gold_edges) & set(edges)
    assert len(covered) >= 0.95 * len(gold_edges)
    for k in covered:
        assert edges[k] <= gold_edges[k], (k, edges[k], gold_edges[k])
    # top-edge sanity (BASELINE.md): 南宫婉–韩立 is golden's heaviest edge;
    # on the partial snapshot its rank can shift, so assert top-3.
    top3 = sorted(edges, key=edges.get, reverse=True)[:3]
    assert ("南宫婉", "韩立") in top3


# --- SPY×FAMILY golden set (7 nodes / 21 edges) ------------------------------


@pytest.fixture(scope="module")
def computed_spy(spark):
    from bigdataproject_spark.data_dicts import SPY_FAMILY_ALIASES

    df = read_danmaku_csv(spark, f"{_REF}/data/SPY&FAMILY/danmaku_*.csv")
    ent = extract_entity_table(df, "text", SPY_FAMILY_ALIASES).cache()
    nodes = {r.Id: r.Size for r in graph_nodes(ent).collect()}
    edges = {(r.Source, r.Target): r.Weight for r in graph_edges(ent).collect()}
    ent.unpersist()
    return nodes, edges


def _golden_spy():
    nodes = {}
    with open(f"{_GOLD}/spy_family_result_nodes.csv", encoding="utf-8-sig") as f:
        for row in csv.DictReader(f):
            nodes[row["Id"]] = int(row["Size"])
    edges = {}
    with open(f"{_GOLD}/spy_family_result_edges.csv", encoding="utf-8-sig") as f:
        for row in csv.DictReader(f):
            a, b = sorted([row["Source"], row["Target"]])
            edges[(a, b)] = int(row["Weight"])
    return nodes, edges


def test_spy_structural_parity(computed_spy):
    """Unlike the fanRen set, the SPY golden counts are NOT bounded by a
    recompute on today's snapshot — our 阿尼亚 count (≈38k) EXCEEDS golden
    (10,705) despite 8 missing input files, so the golden predates a data
    refresh (same drift as the energy JSON, test_golden_energy). What
    survives: the canonical 7-node set, the complete 21-edge structure,
    and the dominance ordering of the protagonist."""
    nodes, edges = computed_spy
    gold_nodes, gold_edges = _golden_spy()
    assert set(nodes) == set(gold_nodes)  # the 7 canonical characters
    assert set(edges) == set(gold_edges)  # same complete co-occurrence set
    # 阿尼亚 is the top node and 约尔–阿尼亚 the top edge in both
    assert max(nodes, key=nodes.get) == max(gold_nodes, key=gold_nodes.get) == "阿尼亚"
    assert max(edges, key=edges.get) == max(gold_edges, key=gold_edges.get) == ("约尔", "阿尼亚")


def test_graph_topology_one_pass_equals_union_of_halves(spark, sf_dir):
    """r12: the one-pass graph_topology operator (single extraction,
    single shuffle) must be row-identical to the naive merge — the
    standalone nodes/edges tables union'd under the part tag — on the
    real documents table."""
    from pyspark.sql import functions as F

    from bigdataproject_spark.operators.graph import graph_topology
    from bigdataproject_spark.queries_graph import (
        GRAPH_NAMES,
        q_graph_edges,
        q_graph_nodes,
        _entities,
    )

    one_pass = sorted(
        tuple(r)
        for r in graph_topology(_entities(spark, sf_dir), GRAPH_NAMES).collect()
    )
    nodes = q_graph_nodes(spark, sf_dir).select(
        F.lit("node").alias("part"),
        F.col("Id").alias("src"),
        F.lit("").alias("dst"),
        F.col("Size").alias("weight"),
    )
    edges = q_graph_edges(spark, sf_dir).select(
        F.lit("edge").alias("part"),
        F.col("Source").alias("src"),
        F.col("Target").alias("dst"),
        F.col("Weight").alias("weight"),
    )
    union = sorted(tuple(r) for r in nodes.unionByName(edges).collect())
    assert one_pass == union and len(one_pass) > 0
