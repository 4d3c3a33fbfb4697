"""Edge semantics of the temporal joins: as-of ties at equal ts, missing
prior rows, range-window boundary inclusion/exclusion across bucket seams."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from bigdataproject_spark.operators.temporal import asof_join, range_join_count


def _ts(s):
    return datetime.strptime(s, "%Y-%m-%d %H:%M:%S")


def test_asof_basic_and_ties(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01 00:00:05")),  # after r@:03 → 3.0
            (2, 10, _ts("2024-01-01 00:00:03")),  # equal ts → matches r@:03
            (3, 10, _ts("2024-01-01 00:00:01")),  # before any right → null
            (4, 20, _ts("2024-01-01 00:00:09")),  # other key → 7.0
        ],
        "event_id int, user_id int, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, _ts("2024-01-01 00:00:03"), 3.0),
            (10, _ts("2024-01-01 00:00:02"), 2.0),
            (20, _ts("2024-01-01 00:00:07"), 7.0),
        ],
        "user_id int, ts timestamp, value double",
    )
    out = asof_join(
        left, right, key="user_id", ts="ts", right_payload=["ts", "value"]
    )
    got = {r.event_id: r.value for r in out.collect()}
    assert got == {1: 3.0, 2: 3.0, 3: None, 4: 7.0}
    # inner drops the unmatched row
    inner = asof_join(
        left, right, key="user_id", ts="ts", right_payload=["ts", "value"], how="inner"
    )
    assert sorted(r.event_id for r in inner.collect()) == [1, 2, 4]


def test_range_join_boundaries(spark):
    # lookback 10s; window is (left-10, left): left-10 inclusive, left exclusive
    left = spark.createDataFrame(
        [(1, 5, _ts("2024-01-01 00:00:20"))],
        "event_id int, user_id int, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (5, _ts("2024-01-01 00:00:10")),  # == left-10 → in
            (5, _ts("2024-01-01 00:00:09")),  # < left-10 → out
            (5, _ts("2024-01-01 00:00:19")),  # in (crosses bucket seam)
            (5, _ts("2024-01-01 00:00:20")),  # == left → out (strict)
            (6, _ts("2024-01-01 00:00:15")),  # other key → out
        ],
        "user_id int, ts timestamp",
    )
    out = range_join_count(
        left, right, key="user_id", left_ts="ts", right_ts="ts", lookback_s=10
    ).collect()
    assert len(out) == 1 and out[0].n_in_range == 2


def test_range_join_no_duplicate_from_band_probe(spark):
    # A right row must count once even though the left row probes 2 buckets.
    left = spark.createDataFrame(
        [(1, 5, _ts("2024-01-01 00:00:10"))],
        "event_id int, user_id int, ts timestamp",
    )
    right = spark.createDataFrame(
        [(5, _ts("2024-01-01 00:00:05"))], "user_id int, ts timestamp"
    )
    out = range_join_count(
        left, right, key="user_id", left_ts="ts", right_ts="ts", lookback_s=10
    ).collect()
    assert out[0].n_in_range == 1
