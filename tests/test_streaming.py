"""Streaming energy must reproduce the batch aggregation on bounded input
(availableNow drain → memory sink vs the same expressions on the batch DF)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdataproject_spark.sources.readers import load_table
from bigdataproject_spark.streaming.energy_stream import (
    read_event_stream,
    run_to_memory,
    streaming_energy,
)


@pytest.fixture()
def _memory_name():
    return "energy_stream_test"


def test_streaming_matches_batch(spark, sf_dir, _memory_name, tmp_path):
    # The file stream source requires a *directory* it can watch for new
    # files; stage the bounded input the way a real drop-folder would look.
    import shutil

    stream_dir = tmp_path / "events_stream"
    stream_dir.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", stream_dir / "part-0000.parquet")
    stream = read_event_stream(spark, str(stream_dir))
    out = streaming_energy(stream, watermark="0 seconds")
    run_to_memory(out, _memory_name)
    got = spark.table(_memory_name)

    # identical expression tree on the batch table (withWatermark is a
    # no-op in batch):
    ev = load_table(spark, sf_dir, "events")
    expected = streaming_energy(ev, watermark="0 seconds")

    g = {(r.key, r.window_start): (r.density, round(r.sentiment, 6)) for r in got.collect()}
    e = {
        (r.key, r.window_start): (r.density, round(r.sentiment, 6))
        for r in expected.collect()
    }
    # Every window the stream emitted must match batch exactly; windows
    # still open when the bounded input ran out (per key, at the tail of
    # the watermark) may be withheld in append mode.
    assert len(g) > 0
    for k, v in g.items():
        assert e[k] == v, k
    n_keys = ev.select("event_type").distinct().count()
    assert len(e) - len(g) <= n_keys
