"""Streaming dedup drops cross-batch duplicates within the watermark
horizon (the crawler re-crawl overlap pattern, S12)."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _write(path, rows):
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "payload"])
    pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("datetime64[us]")
    pq.write_table(pa.Table.from_pandas(pdf), path)


def test_stream_dedup_across_batches(spark, tmp_path):
    from bigdataproject_spark.streaming.dedup_stream import stream_dedup

    d = tmp_path / "in"
    d.mkdir()
    # batch 1: ids 1,2,3 (2 appears twice in-batch)
    _write(
        d / "f1.parquet",
        [
            (1, "2024-01-01 00:00:00", "a"),
            (2, "2024-01-01 00:00:10", "b"),
            (2, "2024-01-01 00:00:11", "b-dup-inbatch"),
            (3, "2024-01-01 00:00:20", "c"),
        ],
    )
    # batch 2: id 2 again within the horizon (dropped), id 4 new
    _write(
        d / "f2.parquet",
        [
            (2, "2024-01-01 00:01:00", "b-dup-crossbatch"),
            (4, "2024-01-01 00:01:10", "d"),
        ],
    )
    stream = (
        spark.readStream.schema("event_id bigint, ts timestamp, payload string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    out = stream_dedup(stream, id_cols=["event_id"], watermark="10 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_stream_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r.event_id: r.payload for r in spark.table("dedup_stream_t").collect()
    }
    assert got == {1: "a", 2: "b", 3: "c", 4: "d"}
