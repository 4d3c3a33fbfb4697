"""Streaming span-level decontamination: a document stream scrubbed
against a PERSISTED reference gram index (operators/spandedup.py,
`write_reference_gram_index`) one micro-batch at a time.

This is the simplest of the engine's index-backed streams because the
index is IMMUTABLE: a frozen eval benchmark never changes, so there is
no append phase, no lease, no compaction, and no cross-batch state —
each micro-batch is an independent map-with-lookup whose output
depends only on (batch, index). foreachBatch is at-least-once, so each
batch writes its scrubbed docs to ``{out_path}/batch={batch_id}`` with
overwrite: a replay recomputes the identical rows (same batch, same
frozen index) and rewrites the same files — idempotent without any
ledger or marker machinery. Batch ≡ stream by construction: the batch
step IS `decontaminate_spans` (tests/test_streaming_decontam.py pins
the equality against the one-shot batch run).

Within a micro-batch, corpus-internal duplication is deliberately NOT
considered (reference mode only): decontamination semantics must not
depend on how the stream happened to chop the corpus into batches.
Corpus-level span dedup stays a batch operator over the accepted
output — the same lambda split as the minhash index stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from bigdataproject_spark.operators.spandedup import decontaminate_spans

__all__ = ["make_decontam_batch_writer", "stream_decontam_spans"]


def make_decontam_batch_writer(
    index_path: str,
    out_path: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """foreachBatch callable: scrub the micro-batch against the
    reference index and land (id, clean_text) under batch=N."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        # guard off (spans_broadcast_max_bytes=0): the base side IS one
        # small micro-batch, so the rebuild join is tiny either way,
        # and the guard's eager localCheckpoint would accumulate one
        # checkpoint RDD per batch over a long-running stream
        cleaned = decontaminate_spans(
            batch_df,
            index_path,
            id_col=id_col,
            text_col=text_col,
            spans_broadcast_max_bytes=0,
            reference_broadcast_max_bytes=0,
        )
        cleaned.write.mode("overwrite").parquet(f"{out_path}/batch={batch_id}")

    return write_batch


def stream_decontam_spans(
    docs_stream: DataFrame,
    *,
    index_path: str,
    out_path: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Wire a document stream through the scrubber; returns the started
    StreamingQuery (caller awaits/stops)."""
    return (
        docs_stream.writeStream.foreachBatch(
            make_decontam_batch_writer(
                index_path, out_path, id_col=id_col, text_col=text_col
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
