"""Label propagation must separate weakly-connected cliques and be
deterministic across runs."""

from __future__ import annotations

from bigdataproject_spark.operators.communities import label_propagation


def _clique_edges(nodes, w):
    return [
        (a, b, w) for i, a in enumerate(nodes) for b in nodes[i + 1 :]
    ]


def test_two_cliques_separate(spark):
    # cliques {0,1,2,3} and {10,11,12,13}, one weak bridge 3–10
    edges = (
        _clique_edges([0, 1, 2, 3], 5.0)
        + _clique_edges([10, 11, 12, 13], 5.0)
        + [(3, 10, 0.5)]
    )
    df = spark.createDataFrame(edges, "src int, dst int, w double")
    out = {
        r.node: r.community
        for r in label_propagation(df, weight="w", iterations=8).collect()
    }
    assert set(out) == {0, 1, 2, 3, 10, 11, 12, 13}
    c1 = {out[n] for n in (0, 1, 2, 3)}
    c2 = {out[n] for n in (10, 11, 12, 13)}
    assert len(c1) == 1 and len(c2) == 1 and c1 != c2


def test_deterministic(spark):
    edges = _clique_edges([0, 1, 2], 1.0) + _clique_edges([5, 6, 7], 1.0) + [(2, 5, 0.1)]
    df = spark.createDataFrame(edges, "src int, dst int, w double")
    a = sorted(
        (r.node, r.community)
        for r in label_propagation(df, weight="w", iterations=6).collect()
    )
    b = sorted(
        (r.node, r.community)
        for r in label_propagation(df, weight="w", iterations=6).collect()
    )
    assert a == b


def test_on_cooccurrence_graph(spark, sf_dir):
    from bigdataproject_spark.queries_graph import q_graph_edges

    edges = q_graph_edges(spark, sf_dir)
    out = label_propagation(
        edges, src="Source", dst="Target", weight="Weight", iterations=5
    ).collect()
    nodes = {r.node for r in out}
    assert len(out) == len(nodes) > 0  # one row per node
