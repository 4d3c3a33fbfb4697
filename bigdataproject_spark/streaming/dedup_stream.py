"""Streaming dedup — the reference crawler's resumable dmid-dedup sink
(S12, crawler/spider_worker.py:73-77,105-113) done properly: instead of
re-reading the output CSV to rebuild a seen-set in driver memory, the
stream keeps id state in the state store, bounded by a watermark.

``dropDuplicatesWithinWatermark`` keeps state only for ids whose event
time is within the watermark horizon — the 100TB-friendly contract:
state is O(ids per watermark window), not O(all ids ever), and any
duplicate arriving within the horizon of its first occurrence is
dropped (exactly the crawler's re-crawl overlap pattern, where dupes
arrive minutes apart, not days).

Contract nuance (observed, matches the Spark API doc): a duplicate
arriving AFTER the horizon may or may not be dropped — state eviction
is a batch-boundary side effect, so redelivery right after expiry can
still hit live state. The guarantee is one-sided: within-horizon dupes
are always dropped; distinct ids are never dropped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def stream_dedup(
    events: DataFrame,
    *,
    id_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Drop rows whose ``id_cols`` were already seen within the watermark
    horizon. Input must be a streaming DataFrame with an event-time column."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        id_cols
    )
