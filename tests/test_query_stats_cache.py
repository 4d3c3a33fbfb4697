"""The tier-2 measurement memoization (_QUERY_STATS_CACHE): LRU-bounded,
keyed by a non-recyclable id, and every hit CONFIRMED with
sameSemantics — a semanticHash collision or a dead weakref re-measures
instead of serving another plan's stats (the r6 ADVICE finding)."""

from __future__ import annotations

import weakref

from bigdataproject_spark.operators import simsearch
from bigdataproject_spark.operators.simsearch import (
    _query_row_stats,
    clear_measured_query_cache,
)


def _frame(spark, n):
    return spark.createDataFrame(
        [(i, [float(i)] * 4) for i in range(n)], "id long, v array<double>"
    )


def test_hit_returns_same_stats_and_moves_to_end(spark):
    clear_measured_query_cache(spark)
    q = _frame(spark, 7)
    first = _query_row_stats(q)
    assert first[0] == 7
    # second call on the SAME frame is a confirmed hit
    assert _query_row_stats(q) == first
    app = spark.sparkContext.applicationId
    assert any(k[0] == app for k in simsearch._QUERY_STATS_CACHE)


def test_collision_is_detected_not_served(spark):
    """Poison the cache under q2's own key with q1's stats — the
    sameSemantics confirmation must reject it and re-measure."""
    clear_measured_query_cache(spark)
    q1, q2 = _frame(spark, 3), _frame(spark, 11)
    _query_row_stats(q1)
    key2 = (
        spark.sparkContext.applicationId,
        int(q2._jdf.queryExecution().analyzed().semanticHash()),
    )
    simsearch._QUERY_STATS_CACHE[key2] = (weakref.ref(q1), (3, 999))
    n, _ = _query_row_stats(q2)
    assert n == 11  # re-measured, never served the poisoned (3, 999)


def test_dead_weakref_remeasures(spark):
    clear_measured_query_cache(spark)
    q = _frame(spark, 5)
    stats = _query_row_stats(q)
    key = next(iter(simsearch._QUERY_STATS_CACHE))
    # simulate the referent being garbage-collected
    simsearch._QUERY_STATS_CACHE[key] = (lambda: None, stats)
    assert _query_row_stats(q) == stats  # correct, via re-measure


def test_lru_eviction_bounds_the_cache(spark, monkeypatch):
    clear_measured_query_cache(spark)
    monkeypatch.setattr(simsearch, "_QUERY_STATS_CACHE_MAX", 3)
    frames = [_frame(spark, n) for n in (2, 3, 4, 5)]
    keys = []
    for f in frames:
        _query_row_stats(f)
        keys.append(
            (
                spark.sparkContext.applicationId,
                int(f._jdf.queryExecution().analyzed().semanticHash()),
            )
        )
    assert len(simsearch._QUERY_STATS_CACHE) <= 3
    assert keys[0] not in simsearch._QUERY_STATS_CACHE  # oldest evicted
    assert keys[-1] in simsearch._QUERY_STATS_CACHE
