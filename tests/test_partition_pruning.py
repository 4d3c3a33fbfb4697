"""Partitioned parquet writes must produce Hive-style layouts whose scans
prune partitions (PartitionFilters in the plan, not a data filter)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from bigdataproject_spark.sources.readers import load_table
from bigdataproject_spark.sources.writers import write_parquet


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    out = str(tmp_path / "events_by_type")
    write_parquet(ev, out, partition_by=["event_type"])

    # Hive layout on disk
    dirs = {d for d in os.listdir(out) if d.startswith("event_type=")}
    assert len(dirs) == 5, dirs

    back = spark.read.parquet(out).filter(F.col("event_type") == "click")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(event_type" in plan
    # the partition predicate must NOT appear as a post-scan data filter
    assert "PushedFilters: [IsNotNull(event_type)" not in plan
    expected = ev.filter(F.col("event_type") == "click").count()
    assert back.count() == expected


def test_single_file_option(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").limit(100)
    out = str(tmp_path / "single")
    write_parquet(ev, out, single_file=True)
    parts = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert len(parts) == 1  # the reference's coalesce(1) shape, opt-in
