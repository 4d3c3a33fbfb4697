"""Plan hygiene for the composite library ops that live OUTSIDE the
query registry (corpus funnel, redaction) — same gates as
test_plan_hygiene.py: no CartesianProduct, no row-at-a-time Python.

connected_components is excluded: it is iterative with driver-bounded
convergence probes, so a single static plan does not describe it; its
per-round building blocks (groupBy min + equi-join) are shapes already
pinned elsewhere.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdataproject_spark.operators.corpus import clean_corpus, corpus_funnel
from bigdataproject_spark.operators.redact import pii_counts, redact_expr


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _docs(spark, sf_dir):
    from bigdataproject_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    tokens = F.filter(
        F.split(F.lower("text"), r"[^a-z0-9]+"), lambda x: x != ""
    )
    return docs.withColumn("tokens", tokens)


def test_funnel_plan_no_cartesian_no_python(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    for df in (
        corpus_funnel(docs, near_dup=False),
        clean_corpus(docs, near_dup=False),
    ):
        plan = _plan(df)
        assert "CartesianProduct" not in plan
        assert "BatchEvalPython" not in plan
        assert "MapInPandas" not in plan


def test_linededup_plan_no_cartesian_no_python(spark, sf_dir):
    from bigdataproject_spark.operators.linededup import dedup_lines

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    for kf in (False, True):
        plan = _plan(dedup_lines(docs, keep_first=kf))
        assert "CartesianProduct" not in plan
        assert "BatchEvalPython" not in plan


def test_redact_is_single_map_projection(spark, sf_dir):
    """Redaction + counts must stay one shuffle-free codegen'd map pass
    — the whole point of the regexp-chain design."""
    docs = _docs(spark, sf_dir)
    out = docs.select(
        "doc_id",
        redact_expr("text").alias("red"),
        *[c.alias(n) for n, c in pii_counts("text").items()],
    )
    plan = _plan(out)
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert "Exchange hashpartitioning" not in plan
    assert "Exchange rangepartitioning" not in plan
