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


def test_asof_payload_is_one_row_not_stitched(spark):
    """r5 review fix: the matched payload must come from ONE right row.
    Per-column last(ignorenulls) stitched values across rows whenever
    the latest right row carried a NULL payload column."""
    from bigdataproject_spark.operators.temporal import asof_join

    right = spark.createDataFrame(
        [("k", 1, 5, 6), ("k", 2, 7, None)],
        "key string, ts int, a int, b int",
    )
    left = spark.createDataFrame([("k", 3)], "key string, ts int")
    row = asof_join(
        left, right, key="key", ts="ts", right_payload=["a", "b"]
    ).collect()[0]
    assert (row.a, row.b) == (7, None)  # the latest ROW, NULL included
    # inner keeps the row: a right row DID match, even with NULL fields
    rows = asof_join(
        left, right, key="key", ts="ts", right_payload=["b"], how="inner"
    ).collect()
    assert len(rows) == 1 and rows[0].b is None


def test_asof_equal_ts_ties_deterministic(spark):
    """Right rows tied on (key, ts) resolve by lexicographic payload
    comparison — repartitioned input gives the same answer."""
    from bigdataproject_spark.operators.temporal import asof_join

    right = spark.createDataFrame(
        [("k", 5, 1), ("k", 5, 2)], "key string, ts int, v int"
    )
    left = spark.createDataFrame([("k", 6)], "key string, ts int")
    a = asof_join(
        left, right, key="key", ts="ts", right_payload=["v"]
    ).collect()[0].v
    b = asof_join(
        left, right.repartition(7), key="key", ts="ts", right_payload=["v"]
    ).collect()[0].v
    assert a == b == 2  # max payload wins, layout-independent


def test_asof_validates_how(spark):
    import pytest

    from bigdataproject_spark.operators.temporal import asof_join

    l = spark.createDataFrame([("k", 1)], "key string, ts int")
    with pytest.raises(ValueError, match="how"):
        asof_join(l, l, key="key", ts="ts", right_payload=[], how="Inner")


def test_range_join_count_duplicate_left_rows(spark):
    """r5 review fix: two identical left rows each get their OWN count
    instead of collapsing into one row with the counts summed."""
    import pytest

    from bigdataproject_spark.operators.temporal import range_join_count

    left = spark.createDataFrame(
        [("k", "2024-01-01 00:10:00")] * 2, "key string, ts string"
    ).selectExpr("key", "cast(ts as timestamp) as ts")
    right = spark.createDataFrame(
        [("k", "2024-01-01 00:09:00"), ("k", "2024-01-01 00:08:00"),
         ("k", "2024-01-01 00:07:00")],
        "key string, rts string",
    ).selectExpr("key", "cast(rts as timestamp) as rts")
    rows = range_join_count(
        left, right, key="key", left_ts="ts", right_ts="rts", lookback_s=600
    ).collect()
    assert sorted(r.n_in_range for r in rows) == [3, 3]
    with pytest.raises(ValueError, match="lookback_s"):
        range_join_count(
            left, right, key="key", left_ts="ts", right_ts="rts", lookback_s=0
        )


def test_range_join_count_row_id_deterministic(spark):
    """r6 ADVICE fix: the count is computed per distinct (key, ts) and
    equi-joined back — deterministic under stage retry — so the physical
    plan carries NO monotonically_increasing_id (and no row ids at
    all)."""
    from bigdataproject_spark.operators.temporal import range_join_count

    left = spark.createDataFrame(
        [("k", "2024-01-01 00:10:00"), ("k", "2024-01-01 00:10:00"),
         ("j", "2024-01-01 00:11:00")],
        "key string, ts string",
    ).selectExpr("key", "cast(ts as timestamp) as ts")
    right = spark.createDataFrame(
        [("k", "2024-01-01 00:09:00"), ("j", "2024-01-01 00:05:00")],
        "key string, rts string",
    ).selectExpr("key", "cast(rts as timestamp) as rts")
    out = range_join_count(
        left, right, key="key", left_ts="ts", right_ts="rts", lookback_s=600
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "monotonically_increasing_id" not in plan
    assert sorted((r.key, r.n_in_range) for r in out.collect()) == [
        ("j", 1), ("k", 1), ("k", 1)
    ]


def test_range_join_count_map_column_fallback(spark):
    """Map-typed value columns ride through the (key, ts) back-join
    untouched (they are never grouping or join keys) — results stay
    per-row correct, duplicates included."""
    from bigdataproject_spark.operators.temporal import range_join_count

    left = spark.createDataFrame(
        [("k", "2024-01-01 00:10:00", {"a": 1})] * 2,
        "key string, ts string, props map<string,int>",
    ).selectExpr("key", "cast(ts as timestamp) as ts", "props")
    right = spark.createDataFrame(
        [("k", "2024-01-01 00:09:00")], "key string, rts string"
    ).selectExpr("key", "cast(rts as timestamp) as rts")
    rows = range_join_count(
        left, right, key="key", left_ts="ts", right_ts="rts", lookback_s=600
    ).collect()
    assert sorted(r.n_in_range for r in rows) == [1, 1]
