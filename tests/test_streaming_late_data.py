"""Watermark semantics of the streaming energy aggregation (SURVEY §2.9):
an event arriving after the watermark passed its window must be dropped —
not resurrect the finalized window — the property that bounds streaming
state at 100TB event rates.

Timing subtlety pinned here: Spark's event-time watermark advances at
micro-batch COMMIT, and the late-record filter of batch N uses the
watermark committed after batch N-1 — so a window finalizes at the end
of the first batch whose *planning* watermark passed it, and a late row
is guaranteed dropped from the batch AFTER the one that advanced the
watermark past its window. The test therefore delivers the late row two
batches after the watermark-advancing event (the steady-state case for
a continuously running stream; measured drop via
numRowsDroppedByWatermark)."""

from __future__ import annotations

import time

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

NS = 1_000_000_000


def _write(path, rows):
    """rows: (event_id, user_id, event_type, value, ts_seconds)."""
    pdf = pd.DataFrame(
        rows, columns=["event_id", "user_id", "event_type", "value", "ts"]
    )
    pdf["ts"] = (pdf["ts"] * NS).astype("int64")  # raw ns, as the testdata
    pq.write_table(pa.Table.from_pandas(pdf), path)


def test_late_event_dropped_after_watermark(spark, tmp_path):
    from bigdataproject_spark.streaming.energy_stream import (
        read_event_stream,
        run_to_memory,
        streaming_energy,
    )

    base = 1_700_000_000  # any fixed epoch
    d = tmp_path / "in"
    d.mkdir()
    # batch 0: two events in window [base, base+10) plus a far-ahead event
    # that advances max event time to base+300 → watermark base+270.
    _write(
        d / "f1.parquet",
        [
            (1, 10, "click", 1.0, base + 1),
            (2, 11, "click", 1.0, base + 4),
            (3, 12, "click", 1.0, base + 300),
        ],
    )
    time.sleep(1.1)  # file-source ordering is by modification time
    # batch 1: an on-time event; the [base, base+10) window finalizes and
    # is emitted at the end of this batch.
    _write(d / "f2.parquet", [(5, 14, "click", 1.0, base + 301)])
    time.sleep(1.1)
    # batch 2: a LATE event for the long-finalized window (event time far
    # below the watermark) — must be dropped, not re-emitted/merged.
    _write(d / "f3.parquet", [(4, 13, "click", 5.0, base + 2)])

    stream = streaming_energy(
        read_event_stream(spark, str(d), max_files_per_trigger=1),
        watermark="30 seconds",
    )
    name = "late_data_energy"
    run_to_memory(stream, name)

    rows = [
        r
        for r in spark.table(name).collect()
        if int(r["window_start"].timestamp()) == base
    ]
    # finalized exactly once, with ONLY the two on-time events — the late
    # row neither bumped the aggregate nor produced a second append row
    assert len(rows) == 1
    assert rows[0]["density"] == 2
    assert rows[0]["sentiment"] == 2.0
