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
