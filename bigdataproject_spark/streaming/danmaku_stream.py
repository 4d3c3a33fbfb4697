"""Continuous danmaku ingestion: the crawler's ``.bin`` drop dir tailed
as a stream — protobuf wire decode + watermarked dmid dedup + append
sink, the streaming completion of S10 (sources/protowire.py).

Reference flow (``crawler/spider_worker.py``): a worker loop pops
tasks from a queue, fetches segment binaries, decodes them, appends
CSV rows deduplicated by an in-memory ``seen_ids`` set, and saves the
raw ``.bin`` when decode fails. The engine-side analogue: the drop
directory IS the queue (each file an acknowledged task — the same
adjudication as S11's streaming queue analogue), the file-source
checkpoint is the consumer offset (a restart resumes exactly after the
last committed batch; no file is decoded into the sink twice), decode
is the S10 wire parser running as a stateless Arrow-batched
``mapInPandas`` over each micro-batch, and the ``seen_ids`` set is
``dropDuplicatesWithinWatermark`` on dmid — state bounded by the
watermark horizon instead of a driver set that grows forever
(the S12 contract, streaming/dedup_stream.py: within-horizon
duplicates always dropped, distinct ids never dropped, an
after-horizon redelivery MAY survive — the crawler's re-crawl overlap
arrives minutes apart, so the horizon covers it).

Batch ≡ stream nuance, stated rather than hidden: batch
``danmaku_table`` picks the min-(ctime, seg_key) winner among
duplicate dmids globally; the stream keeps the FIRST winner the
watermark clock admits. For the reference's duplicate pattern (the
same elem re-fetched from overlapping segment windows, identical
payload either way) the surviving ROW is identical; only when two
bins carry the same dmid with DIFFERENT ctimes can the kept row
differ — the parity test pins the identical-payload case and
documents the divergent one.

Scale: decode parallelism is the file-split count (``maxFilesPerTrigger``
sizes micro-batches); dedup state is O(dmids per watermark window);
the sink append is partitioned by send date so the table lands
query-partitioned without a second pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from bigdataproject_spark.sources.protowire import (
    decode_danmaku_segments,
    reference_row_columns,
)

__all__ = ["stream_danmaku_bins", "danmaku_rows_stream", "start_danmaku_ingest"]

# binaryFile's fixed schema, spelled out because a streaming source
# cannot infer it (and inferring from the directory would race the
# producer on an initially-empty drop dir).
_BINARYFILE_SCHEMA = StructType(
    [
        StructField("path", StringType()),
        StructField("modificationTime", TimestampType()),
        StructField("length", LongType()),
        StructField("content", BinaryType()),
    ]
)


def stream_danmaku_bins(
    spark: SparkSession, bin_dir: str, *, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Tail a ``.bin`` drop dir as a streaming (seg_key, payload) frame."""
    reader = spark.readStream.format("binaryFile").schema(_BINARYFILE_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(bin_dir).select(
        F.col("path").alias("seg_key"), F.col("content").alias("payload")
    )


def danmaku_rows_stream(
    segments: DataFrame, *, watermark: str = "10 minutes"
) -> DataFrame:
    """Streaming segments → deduplicated reference-shape rows.

    Decode (stateless mapInPandas — legal in streams), then dedup on
    dmid within the watermark horizon over the elem's own send time.
    Output columns match batch ``danmaku_table`` (both project through
    ``protowire.reference_row_columns`` — one mapping, r12 review) plus
    ``send_ts`` (the event-time column must survive for the watermark;
    batch parity drops it).

    A decoded elem with a missing/non-positive ``ctime`` (proto3
    default 0) raises AT EXECUTION instead of flowing on: its 1970
    event time would be far behind the watermark the moment any
    current elem has been seen, and ``dropDuplicatesWithinWatermark``
    would then discard it SILENTLY — while the batch path keeps it.
    The fail-loud guard (the rrf_fuse in-plan ``assert_true`` idiom,
    folded into the watermark column so the optimizer cannot prune it)
    converts that quiet batch/stream divergence into an explicit
    error: backfill ctime upstream or ingest the file via the batch
    path (r12 review)."""
    elems = decode_danmaku_segments(
        segments, key_col="seg_key", payload_col="payload"
    )
    guard = F.assert_true(
        F.col("ctime") > 0,
        F.concat(
            F.lit("danmaku elem with non-positive ctime (dmid "),
            F.col("dmid").cast("string"),
            F.lit(
                ") — the watermark clock cannot order it and would "
                "silently drop it as late; backfill ctime upstream or "
                "ingest this file via the batch danmaku_table path"
            ),
        ),
    )
    with_ts = elems.withColumn(
        "send_ts",
        F.timestamp_seconds(
            F.col("ctime") + F.coalesce(guard.cast("long"), F.lit(0))
        ),
    )
    deduped = with_ts.withWatermark(
        "send_ts", watermark
    ).dropDuplicatesWithinWatermark(["dmid"])
    return deduped.select(*reference_row_columns(), F.col("send_ts"))


def start_danmaku_ingest(
    spark: SparkSession,
    bin_dir: str,
    out_path: str,
    checkpoint: str,
    *,
    watermark: str = "10 minutes",
    available_now: bool = False,
    max_files_per_trigger: int | None = None,
):
    """Wire the whole ingest: drop dir → decode → dedup → parquet
    append partitioned by send date. Returns the StreamingQuery.

    ``available_now=True`` drains everything currently in the dir and
    stops — the batch-catchup/test mode; the default runs continuously.
    The checkpoint makes the file source exactly-once into the sink:
    a restart (or a crashed batch) re-reads only uncommitted files."""
    rows = danmaku_rows_stream(
        stream_danmaku_bins(
            spark, bin_dir, max_files_per_trigger=max_files_per_trigger
        ),
        watermark=watermark,
    ).withColumn("send_day", F.to_date("send_ts"))
    writer = (
        rows.drop("send_ts")
        .writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .partitionBy("send_day")
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
