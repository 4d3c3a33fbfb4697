"""Streaming danmaku ingestion (S10 streaming completion): drop-dir
tail → wire decode → watermarked dmid dedup → partitioned append sink;
restart/resume exactly-once into the sink; batch ≡ stream parity on
the reference's identical-payload duplicate pattern."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from bigdataproject_spark.sources.protowire import (
    danmaku_table,
    decode_danmaku_segments,
    encode_dm_seg,
    read_danmaku_bin_dir,
)
from bigdataproject_spark.streaming.danmaku_stream import start_danmaku_ingest


def _elem(dmid, ctime, text, progress_ms=1000):
    return {
        "dmid": dmid,
        "progress_ms": progress_ms,
        "mode": 1,
        "fontsize": 25,
        "color": 0xFFFFFF,
        "uid": f"u{dmid}",
        "text": text,
        "ctime": ctime,
        "weight": 0,
        "pool": 0,
    }


T0 = 1700000000


@pytest.fixture()
def dirs(tmp_path):
    d = {
        "bins": str(tmp_path / "bins"),
        "out": str(tmp_path / "out"),
        "ck": str(tmp_path / "ck"),
    }
    os.makedirs(d["bins"])
    return d


def _drain(spark, dirs):
    q = start_danmaku_ingest(
        spark, dirs["bins"], dirs["out"], dirs["ck"], available_now=True
    )
    q.awaitTermination(120)
    try:
        return spark.read.parquet(dirs["out"])
    except Exception:
        return None


def test_ingest_dedup_and_resume(spark, dirs):
    # batch 1: two segments, one dmid shared (identical payload — the
    # re-crawl overlap pattern)
    a, b = _elem(1, T0, "first"), _elem(2, T0 + 30, "second")
    with open(os.path.join(dirs["bins"], "s1.bin"), "wb") as f:
        f.write(encode_dm_seg([a, b], state=1))
    with open(os.path.join(dirs["bins"], "s2.bin"), "wb") as f:
        f.write(encode_dm_seg([a]))  # duplicate dmid 1, same payload
    out = _drain(spark, dirs)
    rows = {r.dmid: r for r in out.collect()}
    assert set(rows) == {"1", "2"}
    assert rows["1"].text == "first" and rows["1"].uid == "u1"
    assert rows["1"].send_day is not None  # partition column survives

    # restart with the same checkpoint: nothing re-ingested
    assert _drain(spark, dirs).count() == 2

    # batch 2 after restart: new file with one new dmid and one
    # within-horizon duplicate — only the new id lands
    with open(os.path.join(dirs["bins"], "s3.bin"), "wb") as f:
        f.write(encode_dm_seg([_elem(1, T0, "first"), _elem(3, T0 + 60, "third")]))
    out = _drain(spark, dirs)
    assert {r.dmid for r in out.collect()} == {"1", "2", "3"}
    assert out.count() == 3


def test_stream_equals_batch_on_identical_payload_dups(spark, dirs):
    elems = [
        _elem(10, T0, "x"),
        _elem(11, T0 + 1, "y"),
        _elem(10, T0, "x"),  # identical-payload dup in another segment
    ]
    with open(os.path.join(dirs["bins"], "a.bin"), "wb") as f:
        f.write(encode_dm_seg(elems[:2]))
    with open(os.path.join(dirs["bins"], "b.bin"), "wb") as f:
        f.write(encode_dm_seg(elems[2:]))
    streamed = _drain(spark, dirs).drop("send_day")

    batch = danmaku_table(
        decode_danmaku_segments(
            read_danmaku_bin_dir(spark, dirs["bins"]),
            key_col="seg_key",
            payload_col="payload",
        )
    )
    cols = sorted(batch.columns)
    assert sorted(streamed.columns) == cols
    assert sorted(map(tuple, streamed.select(*cols).collect())) == sorted(
        map(tuple, batch.select(*cols).collect())
    )


def test_missing_ctime_fails_loudly_not_silently_dropped(spark, dirs):
    """r12 review: a decoded elem with proto3-default ctime=0 would get
    a 1970 event time and be silently discarded as late by the
    watermark dedup (while batch keeps it). The in-plan guard converts
    that divergence into an execution-time error naming the dmid."""
    with open(os.path.join(dirs["bins"], "ok.bin"), "wb") as f:
        f.write(encode_dm_seg([_elem(20, T0, "fine")]))
    bad = _elem(21, 0, "no ctime")
    del bad["ctime"]
    with open(os.path.join(dirs["bins"], "bad.bin"), "wb") as f:
        f.write(encode_dm_seg([bad]))
    q = start_danmaku_ingest(
        spark, dirs["bins"], dirs["out"], dirs["ck"], available_now=True
    )
    with pytest.raises(Exception, match="non-positive ctime .dmid 21."):
        q.awaitTermination(120)

    # batch path keeps the same row (the documented escape hatch)
    batch = danmaku_table(
        decode_danmaku_segments(
            read_danmaku_bin_dir(spark, dirs["bins"]),
            key_col="seg_key",
            payload_col="payload",
        )
    )
    assert {r.dmid for r in batch.collect()} == {"20", "21"}
