"""Reader/writer behavior: danmaku CSV quirks the engine must tolerate
(SURVEY §7.4.5 — BOM, quoted multi-line text, non-numeric video_time) and
filename-derived episode keys."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from bigdataproject_spark.sources.readers import read_danmaku_csv
from bigdataproject_spark.sources.writers import write_parquet

CSV_BODY = (
    "dmid,video_time,text,send_date,uid,source\n"
    '1,12.345,"hello, with comma",2024-01-01 10:00:00,u1,api\n'
    '2,NaNish,"bad time row",2024-01-01 10:00:01,u2,api\n'
    '3,99.5,"multi\nline text",2024-01-01 10:00:02,u3,history\n'
)


def _write_fixture(tmp_path, name: str) -> str:
    p = os.path.join(str(tmp_path), name)
    with open(p, "w", encoding="utf-8-sig") as f:  # BOM like the crawler
        f.write(CSV_BODY)
    return p


def test_danmaku_csv_quirks(spark, tmp_path):
    _write_fixture(tmp_path, "danmaku_BVtest123.csv")
    df = read_danmaku_csv(spark, str(tmp_path) + "/danmaku_*.csv")
    rows = {r.dmid: r for r in df.collect()}
    assert set(rows) == {"1", "2", "3"}
    # episode key from filename (hot/spark_energy.py:27,31)
    assert all(r.bvid == "BVtest123" for r in rows.values())
    # multiline text preserved
    assert rows["3"].text == "multi\nline text"
    # BOM must not corrupt the first header column
    assert "dmid" in df.columns


def test_danmaku_cast_null_filter(spark, tmp_path):
    _write_fixture(tmp_path, "danmaku_BVx.csv")
    typed = read_danmaku_csv(spark, str(tmp_path) + "/danmaku_*.csv", typed=True)
    ids = sorted(r.dmid for r in typed.collect())
    assert ids == ["1", "3"]  # non-numeric video_time dropped (cast-null trick)


def test_parquet_roundtrip_partitioned(spark, tmp_path):
    df = spark.range(100).withColumn("part", (F.col("id") % 4).cast("int"))
    out = os.path.join(str(tmp_path), "t")
    write_parquet(df, out, partition_by=["part"])
    back = spark.read.parquet(out)
    assert back.count() == 100
    # partition pruning: only one directory scanned for part=1
    pruned = back.filter(F.col("part") == 1)
    assert pruned.count() == 25
