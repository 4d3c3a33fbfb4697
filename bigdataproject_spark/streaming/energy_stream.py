"""Streaming variant of the energy aggregation (SURVEY §2.9 rebuild
decision): identical ``F.window`` tumbling aggregation as the batch
pipeline, under Structured Streaming with a watermark for late data.

The percent_rank stage is deliberately NOT in the stream: a global
per-key rank is not incrementally maintainable; the streaming job emits
per-window density/sentiment/energy and the (cheap, tiny) ranking runs
as a periodic batch over the sink — the standard lambda-free split for
this shape. ``flag_top_pct_approx`` thresholds could alternatively be
maintained with ``applyInPandasWithState`` if a pure-stream flag is ever
required.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bigdataproject_spark.operators.energy import (
    DENSITY_WEIGHT,
    SENTIMENT_WEIGHT,
    WINDOW_SIZE_S,
)
from bigdataproject_spark.schemas import EVENTS, EVENTS_RAW
from bigdataproject_spark.sources.readers import events_ts_is_nanos


def read_event_stream(
    spark, path: str, *, max_files_per_trigger: int = 10
) -> DataFrame:
    """File-based event stream over the same parquet layout as the batch
    table (each micro-batch picks up new files). Footer-sniffed ns→µs
    conversion as in the batch loader (readers.load_table). The sniff
    runs at stream DEFINITION: on a still-empty drop folder it assumes
    the current µs layout (nothing is cached, so re-defining the stream
    after the first files land re-sniffs — do that for legacy
    TIMESTAMP(NANOS) producers)."""
    if events_ts_is_nanos(path):
        raw = (
            spark.readStream.schema(EVENTS_RAW)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(path)
        )
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return (
        spark.readStream.schema(EVENTS)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def streaming_energy(
    events: DataFrame,
    *,
    key: str = "event_type",
    ts_col: str = "ts",
    weight_col: str = "value",
    window_s: int = WINDOW_SIZE_S,
    watermark: str = "30 seconds",
) -> DataFrame:
    """Windowed density/sentiment/energy with late-data watermark.

    Output: key, window_start, density, sentiment, energy. In append mode
    a window finalizes once the watermark passes; the same expression tree
    runs on a batch DataFrame unchanged (tested against the batch result).
    """
    win = F.window(F.col(ts_col), f"{window_s} seconds")
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.col(key).alias("key"), win.alias("win"))
        .agg(
            F.count(F.lit(1)).alias("density"),
            F.sum(weight_col).alias("sentiment"),
        )
        .select(
            "key",
            F.col("win.start").alias("window_start"),
            "density",
            "sentiment",
            (
                SENTIMENT_WEIGHT * F.col("sentiment")
                + DENSITY_WEIGHT * F.col("density")
            ).alias("energy"),
        )
    )


def run_to_memory(stream_df: DataFrame, name: str) -> None:
    """Drain the stream into an in-memory table (tests/local runs)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
