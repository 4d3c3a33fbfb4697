"""Physical-plan hygiene across the ENTIRE query registry — pins the
PLANS.md claims as a permanent regression gate:

  * no CartesianProduct anywhere (quadratic row-pairing; the intended
    brute-force baseline uses BroadcastNestedLoopJoin with a tiny
    broadcast side, which is a different operator);
  * no BatchEvalPython / row-at-a-time Python UDF in any plan;
  * Arrow-batched Python boundaries only where declared: the multimodal
    decode (MapInPandas) and the BLAS cosine cogroup
    (FlatMapCoGroupsInPandas).
"""

from __future__ import annotations

import pytest

from bigdataproject_spark.queries import registry

REG = registry()

# queries whose plan is EXPECTED to cross into Python, and how
_ALLOWED_PYTHON = {
    "multimodal_meta": "MapInPandas",  # absorbed multimodal_features (r4)
    "embedding_neardup": "FlatMapCoGroupsInPandas",
}


def _extra():
    from bigdataproject_spark.queries_pipeline import EXTRA_PARITY

    return EXTRA_PARITY


_ALL = {**_extra(), **REG}


@pytest.mark.parametrize("name", sorted(_ALL))
def test_plan_hygiene(spark, sf_dir, name):
    """Registry AND the EXTRA_PARITY mirror (r10): the no-cartesian /
    no-row-at-a-time-Python gate covers every oracled query, not just
    the 50 the driver checks."""
    df = _ALL[name].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, name
    assert "BatchEvalPython" not in plan, name  # row-at-a-time Python UDF
    for node in ("MapInPandas", "FlatMapCoGroupsInPandas"):
        if node in plan:
            assert _ALLOWED_PYTHON.get(name) == node, (
                f"{name}: unexpected Python boundary {node}"
            )


# Upper bounds on shuffle exchanges (hash/range partitioning — broadcast
# exchanges excluded) for flagship plans; a regression that adds a
# shuffle to a map-only corpus pass is exactly the 100 TB hazard this
# repo engineers against. The corpus map passes stay at ZERO
# hash/range exchanges; the only exchange they may carry is the guarded
# ROUND-ROBIN fan-out (readers.fan_out — fires only when input splits <
# parallelism, i.e. never at scale), pinned separately below.
_MAX_SHUFFLES = {
    # r10 merge of textstats_quality + lang_id (which had absorbed
    # token_count in r4) — the whole text-analysis family is still ONE
    # zero-shuffle map pass
    "text_quality_langid": 0,
    "doc_fingerprint": 0,
    "dedup_exact": 1,  # one hash-agg exchange on the digest
    "pii_redact": 0,  # chained regexp_replace is one codegen map pass
    # chunking stays a zero-shuffle generate; the packing tail adds
    # exactly ONE hash exchange on the shard key (both windows reuse
    # that clustering — pinned in test_plan_hygiene_ops.py too)
    "chunk_pack_sequences": 1,
    # hot-line agg + hot-set join + per-doc rebuild + doc join; the
    # hot-set join carries no pinned broadcast (AQE decides)
    "dedup_lines_boilerplate": 4,
    # orderkey-shuffle (both fact sides) + final agg + presentation sort.
    # The fact-fact join is PINNED to shuffle (see q5's docstring): the
    # previous budget of 2 was only reachable by broadcasting the orders
    # FACT, which Catalyst's compressed-size stats wrongly allowed and
    # which collapses at a 100× scale-up.
    "q5_region_revenue": 4,
    "q1_pricing_summary": 2,
    "contamination_check": 3,  # eval distinct + per-doc agg + sort
    # two independent map-side-combinable agg pipelines over events
    # (HLL registers → fold; exact distinct expand) + presentation sort;
    # every post-scan frame is ≤ keys × 4096 rows.
    "approx_distinct_users": 5,
    # bucket agg ×2 (hist path + flag path — the accepted
    # thresholds-then-join double-scan shape), tiny hist window chain,
    # presentation sort. No per-key sort of the bucketed frame anywhere.
    "energy_approx_flag": 5,
}


@pytest.mark.parametrize("name", sorted(_MAX_SHUFFLES))
def test_shuffle_budget(spark, sf_dir, name):
    import re

    plan = (
        REG[name]
        .fn(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    n = len(re.findall(r"Exchange (hash|range)partitioning", plan))
    assert n <= _MAX_SHUFFLES[name], f"{name}: {n} shuffles in plan"


_FAN_OUT_QUERIES = ["text_quality_langid", "doc_fingerprint"]


@pytest.mark.parametrize("name", _FAN_OUT_QUERIES)
def test_fan_out_is_roundrobin_only(spark, sf_dir, name):
    """The corpus map passes may carry at most ONE exchange, and it must
    be the round-robin fan-out — any hash/range partitioning entering
    these plans is a real shuffle regression (caught above), and a
    second round-robin would mean the data is being bounced twice."""
    import re

    plan = (
        REG[name].fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    )
    rr = len(re.findall(r"Exchange roundrobinpartitioning", plan, re.IGNORECASE))
    assert rr <= 1, f"{name}: {rr} round-robin exchanges"


def test_fan_out_identity_when_splits_suffice(spark, sf_dir):
    """fan_out must be the IDENTITY once the source already has enough
    splits — the 100 TB contract (no exchange enters the plan)."""
    from bigdataproject_spark.sources.readers import fan_out

    df = spark.range(0, 1000, 1, 64)  # 64 partitions >= parallelism
    assert fan_out(df) is df
    small = spark.range(0, 1000, 1, 1)
    plan = fan_out(small)._jdf.queryExecution().executedPlan().toString()
    assert "roundrobinpartitioning" in plan.lower()


def test_fan_out_ignores_shuffle_partitions(spark):
    """fan_out's width target is core count, NOT shuffle.partitions:
    raising the reduce-side sizing knob (done per-SF to keep reduce
    partitions in memory) must not grow a corpus-text repartition into
    map-pass plans (the 10x rehearsal grew an 825 MB exchange this
    way — sized at shuffle.partitions=256 on 32 cores)."""
    from bigdataproject_spark.sources.readers import fan_out

    cores = spark.sparkContext.defaultParallelism
    df = spark.range(0, 1000, 1, cores)  # splits == cores, < 4096
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4096")
    try:
        assert fan_out(df) is df
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def test_graph_edges_pair_kernel_stays_codegen(spark):
    """r12: the pair kernel was rewritten from the interpreted
    higher-order array build (6.3x the CPU at sf100 — SCALING.md
    graph-kernel receipt) to a double-explode codegen pipeline. Guard
    the shape: exactly two Generate nodes and no higher-order
    transform()/aggregate() calls — the markers of an interpreted
    tower. (array_sort's default comparator legitimately prints one
    lambdafunction, so the guard keys on the higher-order call sites,
    not on lambda presence.)"""
    from bigdataproject_spark.operators.graph import graph_edges

    df = spark.createDataFrame(
        [(["b", "a", "c"],), ([],)], "entities array<string>"
    )
    plan = graph_edges(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Generate explode") == 2
    # array_sort's default comparator is the ONE permitted lambda
    # (O(n log n) per row, present in both shapes); the interpreted
    # tower the rewrite removed shows up as transform()/filter()
    # higher-order calls.
    assert "transform(" not in plan
    assert "aggregate(" not in plan


def test_graph_topology_single_shared_exchange(spark):
    """r12: graph_topology's two branches must both hang off ONE
    repartition of the compact entities projection (the
    shared-exchange shape that won the CPU receipt). Guard via the
    runtime signature: with the same DataFrame feeding both branches
    the shuffle map stage executes once, so total shuffle READ is
    ~2x WRITE; if a refactor rebuilds the exchange per branch
    (e.g. calling the extraction twice), write doubles and the
    ratio collapses toward 1x. Assert the structural half that is
    visible statically: exactly two RoundRobin repartition exchanges
    never appear — the plan prints the shared subtree under both
    branches, so count scans instead: the logical plan may show the
    source twice, but the physical exchange must be byte-identical
    text in both branches (same exprIds), which is what RDD-level
    sharing keys on."""
    from bigdataproject_spark.operators.graph import graph_topology

    df = spark.createDataFrame(
        [(["a", "b"],), (["b", "c"],)], "entities array<string>"
    )
    qe = graph_topology(df)._jdf.queryExecution()
    phys = qe.executedPlan().toString()
    import re

    # Both branches must share ONE repartition of the entities
    # projection. Acceptable printer shapes: (a) both branches print
    # the full 'Exchange RoundRobinPartitioning' subtree with
    # identical canonical text (same child exprIds — what RDD-level
    # shuffle sharing keys on; plan_id stripped), or (b) a printer
    # that emits ReusedExchange for the second branch — explicit
    # sharing, trivially a pass. Differing canonical forms with no
    # reuse marker mean two independent extractions — the regression
    # this guard exists for.
    lines = phys.splitlines()
    if not any("ReusedExchange" in ln for ln in lines):
        marker = "Exchange RoundRobinPartitioning"
        reparts = [
            re.sub(r"plan_id=\d+", "", ln[ln.index(marker) :]).strip()
            for ln in lines
            if marker in ln
        ]
        assert len(reparts) == 2, (
            f"expected both branches to print the shared repartition: {reparts}"
        )
        assert len(set(reparts)) == 1, (
            f"branches repartition differently: {reparts}"
        )
    # and the plan must carry NO range exchange at all: the branches
    # must not sort, and the r12 optimization round dropped the final
    # presentation orderBy too (the driver value-hash sorts rows itself)
    assert phys.count("rangepartitioning") == 0
