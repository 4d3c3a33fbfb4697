"""BM25 lexical top-k (operators/textsearch.py): hand-computed scores,
property equivalence against an independent pure-Python reference, and
the zero-wide-shuffle plan contract."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from bigdataproject_spark.operators.textsearch import (
    bm25_reference,
    bm25_topk,
)

DOCS = [
    (1, "spark join hash join fast"),
    (2, "slow scan table scan"),
    (3, "hash table fast fast fast"),
    (4, "join the window sort"),
    (5, ""),
    (6, None),
]


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_bm25_matches_hand_reference(spark, docs):
    got = {r.doc_id: r.score for r in bm25_topk(docs, "fast hash join", k=10).collect()}
    toks = [(i, (t or "").split()) for i, t in DOCS]
    want = bm25_reference([(i, [w for w in ts if w]) for i, ts in toks], ["fast", "hash", "join"])
    assert set(got) == set(want)  # zero-score docs excluded
    for d, s in want.items():
        assert got[d] == pytest.approx(round(s, 6), abs=1e-6), d


def test_bm25_ranking_and_k(spark, docs):
    rows = bm25_topk(docs, "fast", k=2).collect()
    assert [r.doc_id for r in rows][0] == 3  # tf=3 beats tf=1
    assert len(rows) == 2
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_bm25_edge_cases(spark, docs):
    with pytest.raises(ValueError, match="no tokens"):
        bm25_topk(docs, "!!!")
    with pytest.raises(ValueError, match="k must be positive"):
        bm25_topk(docs, "fast", k=0)
    assert bm25_topk(docs, "zzzabsent", k=5).count() == 0
    # pre-tokenized column path == text path
    pre = docs.withColumn(
        "toks",
        F.filter(
            F.split(F.lower(F.coalesce("text", F.lit(""))), r"[^a-z0-9]+"),
            lambda t: t != "",
        ),
    )
    a = sorted(map(tuple, bm25_topk(docs, "fast hash", k=10).collect()))
    b = sorted(
        map(tuple, bm25_topk(pre, "fast hash", k=10, tokens_col="toks").collect())
    )
    assert a == b


def test_bm25_property_vs_reference(spark):
    """Random corpora: Spark BM25 == the independent pure-Python
    implementation for every matching doc (scores to 6dp) and the
    top-k cut respects (score desc, doc_id asc)."""
    rng = random.Random(20240816)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    for trial in range(4):
        corpus = [
            (i, " ".join(rng.choices(vocab, k=rng.randint(1, 12))))
            for i in range(1, 31)
        ]
        df = spark.createDataFrame(corpus, "doc_id long, text string")
        qterms = sorted(set(rng.sample(vocab, rng.randint(1, 3))))
        got = {
            r.doc_id: r.score
            for r in bm25_topk(df, " ".join(qterms), k=100).collect()
        }
        want = bm25_reference(
            [(i, t.split()) for i, t in corpus], qterms
        )
        assert set(got) == set(want), (trial, qterms)
        for d in want:
            assert got[d] == pytest.approx(round(want[d], 6), abs=1e-6), (trial, d)


def test_bm25_multi_query_equals_single_runs(spark, docs):
    """bm25_topk_multi(queries) is bit-equal to M single-query
    bm25_topk runs (same sorted-term score expression over shared
    counters), including a query whose terms overlap another's (the
    shared-counter dedup path) and per-query top-k cuts."""
    from bigdataproject_spark.operators.textsearch import bm25_topk_multi

    queries = ["fast hash join", "window sort", "fast table"]
    multi = bm25_topk_multi(docs, queries, k=3)
    got = {
        (r.query, r.doc_id): r.score for r in multi.collect()
    }
    for q in queries:
        single = {
            (q, r.doc_id): r.score for r in bm25_topk(docs, q, k=3).collect()
        }
        sub = {kk: v for kk, v in got.items() if kk[0] == q}
        assert sub == single, q  # exact float equality — same expression


def test_bm25_multi_property_vs_reference(spark):
    """Random corpora: every (query, doc) score from the batch operator
    matches the independent pure-Python BM25."""
    from bigdataproject_spark.operators.textsearch import bm25_topk_multi

    rng = random.Random(20260816)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    for trial in range(3):
        corpus = [
            (i, " ".join(rng.choices(vocab, k=rng.randint(1, 12))))
            for i in range(1, 31)
        ]
        df = spark.createDataFrame(corpus, "doc_id long, text string")
        queries = [
            " ".join(sorted(set(rng.sample(vocab, rng.randint(1, 3)))))
            for _ in range(3)
        ]
        got = {
            (r.query, r.doc_id): r.score
            for r in bm25_topk_multi(df, queries, k=100).collect()
        }
        for q in set(queries):
            want = bm25_reference(
                [(i, t.split()) for i, t in corpus], q.split()
            )
            assert {d for (qq, d) in got if qq == q} == set(want), (trial, q)
            for d in want:
                assert got[(q, d)] == pytest.approx(
                    round(want[d], 6), abs=1e-6
                ), (trial, q, d)


def test_bm25_multi_rejects_bad_input(spark, docs):
    from bigdataproject_spark.operators.textsearch import bm25_topk_multi

    with pytest.raises(ValueError, match="at least one query"):
        bm25_topk_multi(docs, [])
    with pytest.raises(ValueError, match="no tokens"):
        bm25_topk_multi(docs, ["fast", "!!!"])


def test_bm25_plan_hygiene(spark, sf_dir, docs):
    """One corpus map pass + a one-row broadcast stats join +
    TakeOrderedAndProject: no hash/range exchange wider than the
    one-row aggregate's, no cartesian over data, no Python."""
    import re

    from bigdataproject_spark.sources.readers import load_table

    plan = (
        bm25_topk(load_table(spark, sf_dir, "documents"), "fast hash join", k=25)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan
    assert "TakeOrderedAndProject" in plan  # top-k never global-sorts
    # the only allowed exchanges belong to the ONE-ROW stats aggregate
    # (partial -> single partition) — never a repartition of the corpus
    n_exchanges = len(re.findall(r"Exchange (hash|range)partitioning", plan))
    assert n_exchanges == 0, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_bm25_reference_sanity():
    """The pure-Python reference itself: idf monotone in rarity, tf
    saturation bounded by k1+1."""
    docs = [(1, ["a", "b"]), (2, ["a"]), (3, ["b", "b", "b", "b"])]
    s = bm25_reference(docs, ["b"])
    assert set(s) == {1, 3} and s[3] > s[1]
    # saturation: score approaches idf*(k1+1) as tf grows
    idf = math.log((3 - 2 + 0.5) / (2 + 0.5) + 1.0)
    assert s[3] < idf * 2.2


def test_rrf_fuse_semantics(spark):
    """Hand-computable fusion: doc in both lists beats docs in one;
    contributions are exactly 1/(60+rank); n_lists counts memberships."""
    a = spark.createDataFrame(
        [(1, 3.0), (2, 2.0), (3, 1.0)], "doc_id long, score double"
    )
    b = spark.createDataFrame(
        [(2, 9.0), (4, 5.0)], "doc_id long, score double"
    )
    from bigdataproject_spark.operators.textsearch import rrf_fuse

    rows = {r.doc_id: r for r in rrf_fuse([a, b], k=10).collect()}
    assert rows[2].n_lists == 2 and rows[1].n_lists == 1
    assert rows[2].rrf_score == pytest.approx(
        round(1 / 62 + 1 / 61, 6), abs=1e-6
    )
    assert rows[1].rrf_score == pytest.approx(round(1 / 61, 6), abs=1e-6)
    order = sorted(rows.values(), key=lambda r: (-r.rrf_score, r.doc_id))
    assert [r.doc_id for r in order][0] == 2  # both-lists doc wins
    with pytest.raises(ValueError, match="at least one"):
        rrf_fuse([])
    with pytest.raises(ValueError, match="positive"):
        rrf_fuse([a], k=0)


def test_rrf_cross_modal_lexical_plus_vector(spark, sf_dir):
    """The hybrid-retrieval composition RRF exists for: fuse a BM25
    lexical top-k over documents with a brute-cosine vector top-k over
    embeddings (the testdata tables share the id domain). Checks the
    cross-family schema contract end-to-end and that docs surfaced by
    BOTH retrievers carry n_lists=2 and outrank equal-rank singletons."""
    from bigdataproject_spark.operators.simsearch import brute_force_topk
    from bigdataproject_spark.operators.textsearch import bm25_topk, rrf_fuse
    from bigdataproject_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    lex = bm25_topk(docs, "fast hash join", k=20)
    q = emb.filter(F.col("vec_id") == 0)
    vec = (
        brute_force_topk(
            emb, q, id_col="vec_id", vec_col="embedding", k=20
        )
        .select(F.col("neighbor_id").alias("doc_id"), F.col("cosine").alias("score"))
    )
    fused = rrf_fuse([lex, vec], k=15).collect()
    assert len(fused) == 15
    assert {r.n_lists for r in fused} <= {1, 2}
    scores = [r.rrf_score for r in fused]
    assert scores == sorted(scores, reverse=True)
    both = [r for r in fused if r.n_lists == 2]
    lex_ids = {r.doc_id for r in lex.collect()}
    vec_ids = {r.doc_id for r in vec.collect()}
    assert all(r.doc_id in lex_ids and r.doc_id in vec_ids for r in both)


def test_bm25_multi_partial_topk_salts_invariant(spark, docs):
    """r12 (advisor): the salted partial top-k before the per-query
    window must not change results — salts=1 (degenerate: one group
    per query, the old single-window shape) and the default 64 are
    bit-equal, and a salt count smaller than k still keeps the full
    top-k (each group's k best is a superset of its global-top-k
    contribution)."""
    from bigdataproject_spark.operators.textsearch import bm25_topk_multi

    queries = ["fast hash join", "window sort"]
    base = sorted(
        (r.query, r.doc_id, r.score)
        for r in bm25_topk_multi(docs, queries, k=3).collect()
    )
    for salts in (1, 2, 257):
        got = sorted(
            (r.query, r.doc_id, r.score)
            for r in bm25_topk_multi(
                docs, queries, k=3, partial_topk_salts=salts
            ).collect()
        )
        assert got == base, salts
    with pytest.raises(ValueError, match="partial_topk_salts"):
        bm25_topk_multi(docs, queries, partial_topk_salts=0)


def test_bm25_multi_no_single_reducer_funnel(spark, docs):
    """The final per-query window's input is bounded by k·salts rows
    per query, not the match set: with a query matching EVERY doc, the
    partial window stage must appear in the plan (two window nodes)."""
    from bigdataproject_spark.operators.textsearch import bm25_topk_multi

    plan = bm25_topk_multi(
        docs, ["fast hash join"], k=2
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Window") >= 2, plan


def test_rrf_fuse_is_lazy_and_guard_fires_at_execution(spark):
    """r12 (advisor): rrf_fuse must not execute its inputs at call time
    (the old limit+count probe ran each ranking's upstream plan twice —
    for the hybrid driver row that doubled the BM25 corpus scan and the
    cosine scan). Laziness is asserted with a poisoned input whose
    evaluation raises: construction must succeed, collection must
    raise. The max_list_rows contract still fails loudly — now at
    execution."""
    from pyspark.sql import functions as F
    from pyspark.sql.utils import PythonException

    from bigdataproject_spark.operators.textsearch import rrf_fuse

    poisoned = spark.range(3).select(
        F.col("id").alias("doc_id"),
        (
            F.col("id").cast("double")
            + F.coalesce(
                F.assert_true(F.lit(False), F.lit("poison")).cast("double"),
                F.lit(0.0),
            )
        ).alias("score"),
    )
    fused = rrf_fuse([poisoned], k=5)  # must NOT raise (no eager probe)
    with pytest.raises(Exception, match="poison"):
        fused.collect()

    # oversize list → the in-plan guard raises at execution
    big = spark.range(50).select(
        F.col("id").alias("doc_id"), F.col("id").cast("double").alias("score")
    )
    fused = rrf_fuse([big], k=5, max_list_rows=10)  # constructs fine
    with pytest.raises(Exception, match="TOP-K LISTS"):
        fused.collect()
    with pytest.raises(ValueError, match="max_list_rows"):
        rrf_fuse([big], k=5, max_list_rows=0)

    # within the cap: values unchanged (1/(60+rank), unrounded)
    small = spark.createDataFrame(
        [(1, 9.0), (2, 5.0)], "doc_id long, score double"
    )
    rows = {r.doc_id: r.rrf_score for r in rrf_fuse([small], k=5).collect()}
    assert rows == {1: 1.0 / 61.0, 2: 1.0 / 62.0}
