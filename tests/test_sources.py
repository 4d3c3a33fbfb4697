"""Reader/writer behavior: danmaku CSV quirks the engine must tolerate
(SURVEY §7.4.5 — BOM, quoted multi-line text, non-numeric video_time) and
filename-derived episode keys."""

from __future__ import annotations

import os

import pytest

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


def test_read_documents_jsonl(spark, tmp_path):
    """JSONL ingestion: explicit schema, corrupt-line triage instead of
    job failure, glob + filename provenance."""
    import json

    from pyspark.sql import functions as F

    from bigdataproject_spark.sources.readers import read_documents_jsonl

    d = tmp_path / "drop"
    d.mkdir()
    rows = [
        {"doc_id": 1, "text": "hello world", "lang": "en", "source": "a", "n_chars": 11},
        {"doc_id": 2, "text": "bonjour", "lang": "fr", "source": "b", "n_chars": 7},
    ]
    (d / "part1.jsonl").write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    (d / "part2.jsonl").write_text(
        json.dumps({"doc_id": 3, "text": "ok", "lang": "en", "source": "a", "n_chars": 2})
        + "\n{not json at all\n"
    )

    df = read_documents_jsonl(spark, str(d / "*.jsonl"), with_filename="_file")
    # Spark disallows queries referencing ONLY _corrupt_record on a raw
    # JSON scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — cache for triage.
    df = df.cache()
    good = df.filter(F.col("_corrupt_record").isNull())
    bad = df.filter(F.col("_corrupt_record").isNotNull())
    assert good.count() == 3
    assert bad.count() == 1
    assert dict(good.select("doc_id", "lang").collect()) == {1: "en", 2: "fr", 3: "en"}
    assert [t for n, t in df.dtypes if n == "doc_id"] == ["bigint"]  # no inferSchema drift
    files = {r["_file"].rsplit("/", 1)[-1] for r in good.collect()}
    assert files == {"part1.jsonl", "part2.jsonl"}


def test_write_training_shards(spark, tmp_path, sf_dir):
    """Deterministic content-keyed sharding: stable across rewrites,
    partition-pruned reads, every row in exactly one shard."""
    from bigdataproject_spark.sources.writers import write_training_shards

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    n = docs.count()
    path = str(tmp_path / "shards")
    write_training_shards(docs, path, key_col="doc_id", n_shards=8)

    back = spark.read.parquet(path)
    assert back.count() == n
    sizes = {r["shard"]: r["n"] for r in back.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert set(sizes) == set(range(8))
    # xxhash64 balance: no shard more than 2x the mean on 500+ docs
    assert max(sizes.values()) <= 2 * n / 8

    # determinism: a rewrite lands every doc in the same shard
    path2 = str(tmp_path / "shards2")
    write_training_shards(docs, path2, key_col="doc_id", n_shards=8)
    a = {(r["doc_id"], r["shard"]) for r in back.select("doc_id", "shard").collect()}
    b = {(r["doc_id"], r["shard"]) for r in
         spark.read.parquet(path2).select("doc_id", "shard").collect()}
    assert a == b

    # partition pruning: a shard filter reaches PartitionFilters
    one = spark.read.parquet(path).filter(F.col("shard") == 3)
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(shard" in plan

    with pytest.raises(ValueError):
        write_training_shards(docs, path, key_col="doc_id", n_shards=0)


def test_ts_sniff_transient_failure_not_cached(spark, tmp_path):
    """A failed footer read (e.g. a part file mid-write raises pyarrow
    ArrowInvalid, a ValueError — not OSError) must answer False for that
    call ONLY: once the real file lands, the sniff must see it. A
    pinned False on a TIMESTAMP(NANOS) layout would silently misread
    every timestamp by 1000x for the process lifetime."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from bigdataproject_spark.sources.readers import events_ts_is_nanos

    d = tmp_path / "events.parquet"
    d.mkdir()
    f = d / "part-0000.parquet"

    # truncated footer -> ArrowInvalid inside the sniff
    pq.write_table(pa.table({"ts": pa.array([1], pa.int64())}), f)
    raw = f.read_bytes()
    f.write_bytes(raw[: len(raw) // 2])
    assert events_ts_is_nanos(str(d)) is False

    # the real nanos-layout file lands; a cached False would hide it
    f.write_bytes(raw)
    assert events_ts_is_nanos(str(d)) is True

    # and a successful read IS cached (no re-sniff cost per load)
    f.unlink()
    assert events_ts_is_nanos(str(d)) is True


def test_single_file_sort_by_orders_output(spark, tmp_path):
    """r6 ADVICE fix: repartition(1) does not preserve upstream sort
    order; sort_by re-sorts INSIDE the single write task, so the file
    is ordered no matter how many partitions feed it."""
    import glob

    import pytest
    from pyspark.sql import functions as F

    from bigdataproject_spark.sources.writers import write_csv

    df = (
        spark.range(0, 500)
        .repartition(16)
        .select(
            F.col("id").alias("k"),
            F.pmod(F.col("id") * 7919, F.lit(1000)).alias("v"),
        )
    )
    out = str(tmp_path / "ranked.csv")
    write_csv(
        df, out, single_file=True, sort_by=[F.desc("v"), F.asc("k")]
    )
    files = glob.glob(f"{out}/part-*.csv")
    assert len(files) == 1
    lines = [ln.split(",") for ln in open(files[0]).read().splitlines()[1:]]
    vals = [(-int(v), int(k)) for k, v in lines]
    assert vals == sorted(vals)
    with pytest.raises(ValueError, match="sort_by requires"):
        write_csv(df, out, single_file=False, sort_by=["v"])
