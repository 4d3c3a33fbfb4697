"""Deterministic / stratified sampling invariants (operators/sampling.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdataproject_spark.operators.sampling import (
    deterministic_sample_filter,
    sample_cut,
    stratified_sample_filter,
)
from bigdataproject_spark.sources.readers import load_table


def test_sample_nesting_and_rate(spark, sf_dir):
    """Keep-sets nest monotonically in the rate; realized rate tracks the
    nominal rate; resampling is exactly reproducible."""
    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    kept = {}
    for f in (0.05, 0.2, 0.5):
        ids = {
            r["doc_id"]
            for r in docs.filter(
                deterministic_sample_filter("doc_id", f)
            ).select("doc_id").collect()
        }
        kept[f] = ids
        assert abs(len(ids) / n - f) < 0.08  # hash uniformity at small n
    assert kept[0.05] <= kept[0.2] <= kept[0.5]
    again = {
        r["doc_id"]
        for r in docs.filter(deterministic_sample_filter("doc_id", 0.2))
        .select("doc_id")
        .collect()
    }
    assert again == kept[0.2]


def test_stratified_rates_per_stratum(spark, sf_dir):
    """Each stratum realizes its own rate; unlisted strata use the
    default; the stratified keep-set per stratum equals the flat sample
    of that stratum at the same rate (same hash, same cut)."""
    docs = load_table(spark, sf_dir, "documents")
    rates = {"en": 0.1, "fr": 0.6}
    keep = stratified_sample_filter(
        F.col("doc_id"), "lang", rates, default_fraction=0.0
    )
    got = docs.filter(keep).groupBy("lang").count().collect()
    by_lang = {r["lang"]: r["count"] for r in got}
    assert set(by_lang) <= {"en", "fr"}  # default 0.0 drops the rest
    for lang, f in rates.items():
        n_stratum = docs.filter(F.col("lang") == lang).count()
        flat = docs.filter(
            (F.col("lang") == lang) & deterministic_sample_filter("doc_id", f)
        ).count()
        assert by_lang.get(lang, 0) == flat
        assert abs(by_lang.get(lang, 0) / n_stratum - f) < 0.12


def test_sample_cut_bounds():
    assert sample_cut(0.0) == 0
    assert sample_cut(1.0) == 1 << 48
    with pytest.raises(ValueError):
        sample_cut(1.5)


def test_sample_filter_is_scan_stage(spark, sf_dir):
    """The stratified predicate is a pure map — no Exchange in the plan."""
    docs = load_table(spark, sf_dir, "documents")
    keep = stratified_sample_filter(F.col("doc_id"), "lang", {"en": 0.2})
    plan = (
        docs.filter(keep)
        .select("doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
