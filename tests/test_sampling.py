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


def test_stratified_map_path_matches_when_chain(spark, sf_dir):
    """A 200-stratum mixture (map-literal path) must produce exactly the
    same keep-set as the equivalent per-stratum when-chain predicates,
    keep a FLAT plan (no nested-when tower, no Exchange), and fall back
    to the default rate for unlisted and NULL strata."""
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "src", F.concat(F.lit("source-"), (F.col("doc_id") % 200).cast("string"))
    )
    rates = {f"source-{i}": (i % 10) / 10.0 for i in range(200)}
    keep = stratified_sample_filter("doc_id", "src", rates, default_fraction=0.0)
    got = {r["doc_id"] for r in docs.filter(keep).select("doc_id").collect()}

    expected = set()
    for i in range(0, 200, 37):  # spot-check a spread of strata
        src = f"source-{i}"
        flat = docs.filter(
            (F.col("src") == src)
            & deterministic_sample_filter("doc_id", rates[src])
        )
        expected |= {r["doc_id"] for r in flat.select("doc_id").collect()}
        got_stratum = {
            r["doc_id"]
            for r in docs.filter(keep)
            .filter(F.col("src") == src)
            .select("doc_id")
            .collect()
        }
        flat_ids = {r["doc_id"] for r in flat.select("doc_id").collect()}
        assert got_stratum == flat_ids, src
    assert expected <= got

    plan = (
        docs.filter(keep).select("doc_id")._jdf.queryExecution()
        .executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert plan.count("CASE WHEN") <= 2  # flat lookup, not a 200-deep tower

    # unlisted + NULL strata -> default (0.0 here: dropped)
    weird = docs.withColumn(
        "src",
        F.when(F.col("doc_id") % 2 == 0, F.lit("unlisted")).otherwise(F.lit(None)),
    )
    assert weird.filter(
        stratified_sample_filter("doc_id", "src", rates, default_fraction=0.0)
    ).count() == 0
    n_all = weird.count()
    assert weird.filter(
        stratified_sample_filter("doc_id", "src", rates, default_fraction=1.0)
    ).count() == n_all


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
