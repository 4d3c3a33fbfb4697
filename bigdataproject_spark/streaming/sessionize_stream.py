"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState`` (SURVEY §2.9 extension — the reference has no
streaming state; this is the north-star "custom stateful operator"
pattern: watermark + per-key GroupState + event-time timeout).

Semantics match the batch sessionizer (queries_relational.q_sessionize):
events of one user belong to one session while consecutive gaps are
<= ``gap_s``; a longer gap closes the session. A closed session emits
(user_id, session_start_ep, n_events, duration_s). Sessions close two
ways: (a) in-batch, when a later event arrives past the gap; (b) by
event-time timeout once the watermark passes last_ts + gap (no newer
event will ever precede it — append-mode-safe).

Scale notes: state is O(1) per active key (4 numbers), the canonical
shape for RocksDB-backed state stores; batches arrive per-key via Arrow.
Out-of-order events inside one micro-batch are handled by sorting the
batch; cross-batch reordering is bounded by the watermark as usual.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id bigint, session_start_ep double, n_events bigint, duration_s double"
)
STATE_SCHEMA = "start_ep double, last_ep double, n bigint"


def _session_func(gap_s: float):
    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        closed: list[tuple[int, float, int, float]] = []

        if state.hasTimedOut:
            start_ep, last_ep, n = state.get
            closed.append((user_id, start_ep, n, round(last_ep - start_ep, 3)))
            state.remove()
        else:
            if state.exists:
                start_ep, last_ep, n = state.get
            else:
                start_ep, last_ep, n = None, None, 0
            eps: list[float] = []
            for pdf in pdfs:
                eps.extend(pdf["ep"].tolist())
            eps.sort()
            for ep in eps:
                if start_ep is None:
                    start_ep, last_ep, n = ep, ep, 1
                elif ep - last_ep > gap_s:
                    closed.append(
                        (user_id, start_ep, n, round(last_ep - start_ep, 3))
                    )
                    start_ep, last_ep, n = ep, ep, 1
                else:
                    last_ep, n = ep, n + 1
            if start_ep is not None:
                state.update((start_ep, last_ep, n))
                # close by timeout once the watermark passes last_ep + gap:
                # no on-time event can extend this session after that.
                state.setTimeoutTimestamp(int((last_ep + gap_s) * 1000) + 1)

        if closed:
            yield pd.DataFrame(
                closed,
                columns=["user_id", "session_start_ep", "n_events", "duration_s"],
            )

    return update


def streaming_sessionize(
    events: DataFrame,
    *,
    gap_s: float = 1800.0,
    watermark: str = "0 seconds",
) -> DataFrame:
    """events(user_id, ts, ...) → closed sessions, append mode.

    Requires an event-time watermark on ``ts`` for the timeout clock."""
    prepared = events.withWatermark("ts", watermark).selectExpr(
        "user_id", "ts", "cast(ts as double) AS ep"
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _session_func(gap_s),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
