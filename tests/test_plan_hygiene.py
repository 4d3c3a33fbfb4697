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
    "multimodal_features": "MapInPandas",
    "embedding_neardup": "FlatMapCoGroupsInPandas",
}


@pytest.mark.parametrize("name", sorted(REG))
def test_plan_hygiene(spark, sf_dir, name):
    df = REG[name].fn(spark, sf_dir)
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
# repo engineers against.
_MAX_SHUFFLES = {
    "textstats_quality": 0,
    "lang_id": 0,
    "token_count": 0,
    "doc_fingerprint": 0,
    "dedup_exact": 1,  # one hash-agg exchange on the digest
    "q5_region_revenue": 2,  # final agg + presentation sort
    "q1_pricing_summary": 2,
    "contamination_check": 3,  # eval distinct + per-doc agg + sort
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
