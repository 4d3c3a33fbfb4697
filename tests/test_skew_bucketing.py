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
