"""Error-bound verification for the approximate operators.

Since r3 the two registry entries here are PORTABLE sketches
(operators/sketches.py HLL, energy.flag_top_pct_binned) and hash-checked
against DuckDB oracles running the identical algorithm — the driver
verifies they compute what they claim; these tests verify what they
claim is CLOSE TO EXACT, at test sf and at bench scale (sf1).

The engine-specific Spark built-ins (``approx_count_distinct`` HLL++,
``percentile_approx``-based ``flag_top_pct_approx``) remain supported
alternatives and get the same ε bounds below — a measured bound against
the exact computation being the strongest check a non-portable sketch
admits.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from bigdataproject_spark.queries import registry


@pytest.fixture(scope="module")
def sf1_events_dir(spark):
    """Bench-scale (sf0.1's 100k events × 10 copies = 1M rows ≈ sf1)
    events-only dataset for the approximate-operator bounds — the
    sketches must hold at 10× the scale the headline bench runs at. Built
    once per session from sf0.1 by key-shifted union (same recipe as
    tools/make_scale.py), events table only (both bound-tested queries
    read nothing else)."""
    dst = "/tmp/sf1_boundtest"
    if not os.path.exists(os.path.join(dst, "events.parquet", "_SUCCESS")):
        prev = spark.conf.get("spark.sql.parquet.outputTimestampType")
        spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        try:
            ev = spark.read.parquet("/root/testdata/sf0.1/events.parquet")
            out = (
                ev.crossJoin(spark.range(10).select(F.col("id").alias("_i")))
                .withColumn("event_id", F.col("event_id") + F.col("_i") * 100_000_000)
                .withColumn("ts", F.col("ts") + F.col("_i") * F.expr("INTERVAL 1 DAY"))
                .drop("_i")
            )
            out.write.mode("overwrite").parquet(f"{dst}/events.parquet")
        finally:
            spark.conf.set("spark.sql.parquet.outputTimestampType", prev)
    return dst


def _check_hll_bound(spark, sf):
    rows = registry()["approx_distinct_users"].fn(spark, sf).collect()
    assert rows
    for r in rows:
        assert r["exact_users"] > 0
        rel_err = abs(r["approx_users"] - r["exact_users"]) / r["exact_users"]
        assert rel_err <= 0.05, (r["event_type"], r["approx_users"], r["exact_users"])


def _check_energy_flag_agreement(spark, sf):
    from pyspark.sql import Window

    approx = (
        registry()["energy_approx_flag"]
        .fn(spark, sf)
        .select("event_type", "bucket_s", "energy_r", F.col("is_high").alias("ah"))
    )
    exact = approx.withColumn(
        "eh",
        F.percent_rank().over(
            Window.partitionBy("event_type").orderBy("energy_r", "bucket_s")
        )
        >= 0.9,
    )
    total = exact.count()
    assert total > 0
    disagree = exact.filter(F.col("ah") != F.col("eh"))
    n_dis = disagree.count()
    assert n_dis / total <= 0.03, f"{n_dis}/{total} flag disagreements"
    if n_dis:
        # every disagreement lies within 2% of its key's decision boundary
        # (rank-wise): the sketch may only blur the threshold, not flip
        # rows far from it.
        ranked = exact.withColumn(
            "pr",
            F.percent_rank().over(
                Window.partitionBy("event_type").orderBy("energy_r", "bucket_s")
            ),
        )
        far = ranked.filter(
            (F.col("ah") != F.col("eh")) & (F.abs(F.col("pr") - 0.9) > 0.02)
        )
        assert far.count() == 0


def test_approx_distinct_within_hll_bound(spark, sf_dir):
    """The registered portable HLL (p=12: σ ≈ 1.6% in the raw regime,
    tighter under linear counting) must land within 5% of the exact
    per-group distinct count — headroom without letting a broken sketch
    through."""
    _check_hll_bound(spark, sf_dir)


def test_approx_distinct_within_hll_bound_sf1(spark, sf1_events_dir):
    """Same HLL ε bound at bench scale (10M events): register growth must
    not degrade the sketch beyond its nominal rsd."""
    _check_hll_bound(spark, sf1_events_dir)


def test_energy_approx_flag_agrees_with_exact_window(spark, sf_dir):
    """The binned-quantile + broadcast-threshold flag (the 100TB path)
    must agree with the exact percent_rank window flag on ≥97% of rows,
    and every disagreement must sit next to the per-key energy threshold
    (the only place a histogram quantile may legitimately differ)."""
    _check_energy_flag_agreement(spark, sf_dir)


def test_energy_approx_flag_agrees_with_exact_window_sf1(spark, sf1_events_dir):
    """Same flag-agreement bound at bench scale: bin occupancy around the
    threshold must not balloon as group sizes grow 1000×."""
    _check_energy_flag_agreement(spark, sf1_events_dir)


def test_portable_hll_skips_nulls(spark):
    """NULL values must not contribute registers — count(DISTINCT x)
    semantics. A frame that is 50% NULLs estimates the same cardinality
    as the NULL-free half."""
    from bigdataproject_spark.operators.sketches import hll_count_distinct

    base = spark.range(200).select(
        F.lit("k").alias("k"),
        F.when(F.col("id") % 2 == 0, F.col("id")).alias("v"),
    )
    est = hll_count_distinct(base, key="k", value_col="v").collect()[0]
    exact = base.agg(F.countDistinct("v")).collect()[0][0]
    assert exact == 100
    assert abs(est["approx_users"] - exact) / exact <= 0.05


def test_builtin_hll_within_bound(spark, sf_dir):
    """The engine-specific built-in (approx_count_distinct, rsd=0.01)
    stays a supported alternative to the portable sketch — same ε bound
    vs exact."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    rows = (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", 0.01).alias("approx_users"),
            F.countDistinct("user_id").alias("exact_users"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        rel_err = abs(r["approx_users"] - r["exact_users"]) / r["exact_users"]
        assert rel_err <= 0.05, (r["event_type"], r["approx_users"], r["exact_users"])


def test_builtin_gk_flag_agrees_with_binned(spark, sf_dir):
    """flag_top_pct_approx (percentile_approx GK sketch) must agree with
    the portable binned flag on ≥97% of bucket rows — the two 100TB
    variants may only differ in threshold-adjacent rows."""
    from bigdataproject_spark.operators.energy import (
        bucket_energy,
        flag_top_pct_approx,
        flag_top_pct_binned,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    agg = bucket_energy(
        ev,
        key="event_type",
        bucket=(F.floor(F.unix_timestamp("ts") / 10) * 10).cast("long"),
        weight=F.col("value"),
    )
    a = flag_top_pct_approx(agg).select(
        "key", "bucket", F.col("is_high").alias("gk")
    )
    b = flag_top_pct_binned(agg).select(
        "key", "bucket", F.col("is_high").alias("binned")
    )
    j = a.join(b, on=["key", "bucket"])
    total = j.count()
    assert total > 0
    n_dis = j.filter(F.col("gk") != F.col("binned")).count()
    assert n_dis / total <= 0.03, f"{n_dis}/{total} variant disagreements"
