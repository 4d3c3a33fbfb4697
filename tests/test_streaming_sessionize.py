"""The stateful streaming sessionizer must agree with the batch
window-based sessionization on bounded input: every session the stream
emits (in-batch close or event-time timeout) matches a batch session
exactly; at most the newest session per user may be withheld (append
mode, watermark at end of stream)."""

from __future__ import annotations

import shutil

from pyspark.sql import Window
from pyspark.sql import functions as F

from bigdataproject_spark.sources.readers import load_table
from bigdataproject_spark.streaming.sessionize_stream import streaming_sessionize

GAP_S = 1800.0


def _batch_sessions(ev):
    epoch = F.col("ts").cast("double")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    with_gap = ev.select(
        "user_id",
        "event_id",
        epoch.alias("ep"),
        (epoch - F.lag(epoch, 1).over(w) > GAP_S).cast("int").alias("is_new"),
    )
    w2 = Window.partitionBy("user_id").orderBy("ep", "event_id")
    sess = with_gap.withColumn(
        "session_id",
        F.sum(F.coalesce("is_new", F.lit(0))).over(
            w2.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.min("ep").alias("session_start_ep"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.max("ep") - F.min("ep"), 3).alias("duration_s"),
        )
    )


def test_stateful_sessionize_matches_batch(spark, sf_dir, tmp_path):
    stream_dir = tmp_path / "ev"
    stream_dir.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", stream_dir / "part-0.parquet")

    # stream over the staged drop-folder
    from bigdataproject_spark.streaming.energy_stream import read_event_stream

    raw = read_event_stream(spark, str(stream_dir), max_files_per_trigger=1)
    out = streaming_sessionize(raw, gap_s=GAP_S, watermark="0 seconds")
    q = (
        out.writeStream.format("memory")
        .queryName("sessions_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.user_id, r.session_start_ep): (r.n_events, r.duration_s)
        for r in spark.table("sessions_stream").collect()
    }

    ev = load_table(spark, sf_dir, "events")
    expected = {
        (r.user_id, r.session_start_ep): (r.n_events, r.duration_s)
        for r in _batch_sessions(ev).collect()
    }

    assert len(got) > 0
    for k, v in got.items():
        assert expected[k] == v, k
    n_users = ev.select("user_id").distinct().count()
    # only still-open tails (≤1 per user) may be withheld
    assert len(expected) - len(got) <= n_users
