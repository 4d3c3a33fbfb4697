"""Skew mitigation must be result-identical to the plain operators, and
bucketed tables must join without an exchange on the bucketed key."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdataproject_spark.operators.skew import (
    hot_keys,
    salted_aggregate,
    salted_broadcast_left,
)
from bigdataproject_spark.sources.readers import load_table


def test_salted_aggregate_matches_plain(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    plain = {
        r.l_returnflag: (round(r.total, 2), r.n)
        for r in li.groupBy("l_returnflag")
        .agg(F.sum("l_quantity").alias("total"), F.count("l_quantity").alias("n"))
        .collect()
    }
    salted = {
        r.l_returnflag: (round(r.total, 2), r.n)
        for r in salted_aggregate(
            li,
            key="l_returnflag",
            agg_exprs={"total": ("l_quantity", "sum"), "n": ("l_quantity", "count")},
        ).collect()
    }
    assert salted == plain


def test_salted_join_matches_plain(spark, sf_dir):
    od = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    left = li.withColumnRenamed("l_orderkey", "k")
    right = od.withColumnRenamed("o_orderkey", "k")
    plain = left.join(right, on="k").count()
    # force a fake hot list (the testdata is uniform; semantics must hold
    # for ANY split)
    some_keys = [r.k for r in right.limit(5).collect()]
    assert salted_broadcast_left(left, right, on="k", hot=some_keys).count() == plain
    # sampled hot detection on uniform data → empty, falls back to plain join
    assert hot_keys(left, "k") == []
    assert salted_broadcast_left(left, right, on="k").count() == plain


def test_hot_key_detection_finds_skew(spark):
    skewed = spark.range(0, 100000).select(
        F.when(F.col("id") % 2 == 0, F.lit(7)).otherwise(F.col("id")).alias("k")
    )
    hot = hot_keys(skewed, "k", threshold_frac=0.1)
    assert hot == [7]


@pytest.fixture(scope="module")
def zipf_events(spark):
    """Zipf-skewed activity fixture: 120k rows over 1000 users where the
    hottest user holds ~25% of all rows and the top-4 hold ~half —
    the shape a viral user / bot gives `user_id` at 100 TB. Built
    deterministically (hash-mod, no rand()) so assertions are stable."""
    base = spark.range(0, 120_000)
    # h uniform in [0,100); cascade to a zipf-ish head: 25% -> user 0,
    # 12% -> user 1, 8% -> user 2, 5% -> user 3, rest spread over 1000
    h = F.pmod(F.xxhash64("id"), F.lit(100))
    user = (
        F.when(h < 25, F.lit(0))
        .when(h < 37, F.lit(1))
        .when(h < 45, F.lit(2))
        .when(h < 50, F.lit(3))
        .otherwise(F.pmod(F.xxhash64("id", F.lit(1)), F.lit(1000)) + 4)
    )
    return (
        base.select(
            F.col("id").alias("event_id"),
            user.alias("user_id"),
            (F.pmod(F.xxhash64("id", F.lit(2)), F.lit(1000)) / 10.0).alias("value"),
        )
        .persist()
    )


def test_salted_aggregate_spreads_hot_key(spark, zipf_events):
    """On zipf data the salted two-level aggregate must (a) equal the
    naive aggregate exactly and (b) demonstrably flatten the shuffle:
    hash-partitioning by bare key sends ~25% of all rows to one reducer,
    while (key, salt) partitioning bounds every reducer near the mean.
    The partition row spread is the measurable stand-in for the
    max-task/median-task wall ratio on a real cluster."""
    df = zipf_events
    plain = {
        r.user_id: (round(r.total, 6), r.n)
        for r in df.groupBy("user_id")
        .agg(F.sum("value").alias("total"), F.count("value").alias("n"))
        .collect()
    }
    salted = {
        r.user_id: (round(r.total, 6), r.n)
        for r in salted_aggregate(
            df,
            key="user_id",
            agg_exprs={"total": ("value", "sum"), "n": ("value", "count")},
            n_salts=16,
        ).collect()
    }
    assert salted == plain

    def spread(cols):
        sizes = (
            df.repartition(32, *[F.col(c) for c in cols])
            .rdd.glom()
            .map(len)
            .collect()
        )
        nonzero = sorted(s for s in sizes if s > 0)
        return max(sizes), nonzero[len(nonzero) // 2]

    naive_max, naive_med = spread(["user_id"])
    salted_df = df.withColumn("_salt", (F.rand(seed=42) * 32).cast("int"))
    sizes = (
        salted_df.repartition(32, F.col("user_id"), F.col("_salt"))
        .rdd.glom()
        .map(len)
        .collect()
    )
    salted_max = max(sizes)
    # naive: the hot user's ~30k rows hit one reducer -> max/median >= 5
    assert naive_max / naive_med >= 5, (naive_max, naive_med)
    # salted: every reducer within ~2.5x of the perfectly flat share
    # (hot sub-keys can still collide by hash into one partition; with 32
    # salts each collision adds ~940 rows, so the bound has slack for a
    # couple of collisions but fails on any un-split hot key)
    assert salted_max <= 2.5 * (120_000 / 32), salted_max
    assert salted_max < naive_max / 3


def test_aqe_splits_skewed_equi_join(spark, zipf_events):
    """AQE must split the skewed partition of a sort-merge equi-join on
    the zipf key — the runtime defense for the minhash BAND join when
    one LSH bucket goes hot (same physical shape: equi-join on a
    skewed key). Thresholds are lowered so the local fixture crosses
    the skew detector; the marker is the `skew=true` annotation on the
    SortMergeJoin / AQEShuffleRead after execution.

    The right side is an INDEPENDENT table on purpose: when both join
    inputs reuse one exchange (e.g. a self-aggregate joined back to its
    source), AQE declines to skew-split the reused shuffle — a real
    100 TB caveat (verified here first-hand): break the reuse if a
    skewed self-join needs the splitter."""
    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "16KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force SMJ
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        left = zipf_events.select(
            "event_id", "user_id", F.lit("p" * 200).alias("pad_l")
        )
        right = spark.range(0, 1004).select(
            F.col("id").alias("user_id"), F.lit("x" * 32).alias("attr")
        )
        # collect() executes THIS DataFrame's own QueryExecution, so the
        # adaptive plan below is the final (post-execution) one —
        # count() would execute a different (agg-wrapped) plan and leave
        # this one unexecuted (isFinalPlan=false).
        joined = left.join(right, on="user_id").select("user_id", "attr", "pad_l")
        n = len(joined.collect())
        assert n == 120_000  # inner join on a key present in both sides
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
        assert "skewed" in plan  # AQEShuffleRead ... skewed
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_salted_broadcast_left_on_zipf(spark, zipf_events):
    """Hot-key isolation join on the zipf fixture: detection finds the
    head users, and the split join equals the plain join exactly."""
    left = zipf_events.select("user_id", "value")
    right = (
        zipf_events.groupBy("user_id").agg(F.count("*").alias("n"))
    )
    hot = hot_keys(left, "user_id", threshold_frac=0.05)
    assert 0 in hot  # the 25% user must be detected
    plain = left.join(right, on="user_id").count()
    assert salted_broadcast_left(left, right, on="user_id", hot=hot).count() == plain


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    """bucketBy co-locates both sides: the sort-merge join on the bucket
    key needs no Exchange (the 100TB co-located join story)."""
    od = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    for name, df, key in (("b_orders", od, "o_orderkey"), ("b_lineitem", li, "l_orderkey")):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.bucketBy(8, key)
            .sortBy(key)
            .option("path", str(tmp_path / name))
            .mode("overwrite")
            .saveAsTable(name)
        )
    a = spark.table("b_lineitem")
    b = spark.table("b_orders")
    joined = a.join(b, a["l_orderkey"] == b["o_orderkey"])
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, plan
    # and it still computes the right thing
    assert joined.count() == li.join(od, li["l_orderkey"] == od["o_orderkey"]).count()
