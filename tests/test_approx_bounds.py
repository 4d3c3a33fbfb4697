"""Error-bound verification for the two registry queries whose sketches
are intrinsically engine-specific (rows-only at the driver): the repo-side
guarantee is a measured bound against the EXACT computation, which is the
strongest check an approximate operator admits.

(The third rows-only query, ann_ivf_topk, gets the same treatment in
tests/test_ivf.py: full-probe == brute force exactly, partial-probe
recall bounded.)
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdataproject_spark.queries import registry


def test_approx_distinct_within_hll_bound(spark, sf_dir):
    """approx_count_distinct(rsd=0.01) must land within 5% of the exact
    per-group distinct count (HLL++ at rsd 1% is far tighter in practice;
    5% leaves headroom without letting a broken sketch through)."""
    rows = registry()["approx_distinct_users"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["exact_users"] > 0
        rel_err = abs(r["approx_users"] - r["exact_users"]) / r["exact_users"]
        assert rel_err <= 0.05, (r["event_type"], r["approx_users"], r["exact_users"])


def test_energy_approx_flag_agrees_with_exact_window(spark, sf_dir):
    """The approx_percentile + broadcast-threshold flag (the 100TB path)
    must agree with the exact percent_rank window flag on ≥97% of rows,
    and every disagreement must sit next to the per-key energy threshold
    (the only place a quantile sketch may legitimately differ)."""
    approx = (
        registry()["energy_approx_flag"]
        .fn(spark, sf_dir)
        .select("event_type", "bucket_s", "energy_r", F.col("is_high").alias("ah"))
    )
    from pyspark.sql import Window

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
