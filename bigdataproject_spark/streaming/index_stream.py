"""Streaming near-dup dedup end-to-end: a document stream drains
through the persisted minhash index (operators/dedup_index.py) one
micro-batch at a time — the full lambda flow executed as ONE pipeline
(stateless cleaning stages stream in corpus_stream.py; the
cross-document state lives in the parquet index, not in stream state).

Effective exactly-once without stream state: foreachBatch is
at-least-once, so every side effect here is idempotent —

  * the index append: ``accept_batch`` drops ids already present in
    the store before appending (its crash-resume contract, tested in
    tests/test_dedup_index.py), so a replayed batch appends nothing;
  * the survivor output: survivors are derived AFTER the append as
    "batch docs whose ids are now in the store" (original run and
    replay agree on that set — on a replay ``accept_batch`` returns
    empty, but the store still names the batch's survivors) and are
    written with per-batch-directory OVERWRITE, so a replay rewrites
    the same files rather than duplicating them.

A crash at ANY point between the append and the output write therefore
replays to the identical end state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdataproject_spark.operators.dedup_index import accept_batch

__all__ = ["ensure_index", "make_index_batch_writer", "stream_dedup_to_index"]


def ensure_index(
    spark: SparkSession,
    path: str,
    *,
    like: DataFrame,
    id_col: str,
    shingles_col: str,
    num_hashes: int = 32,
    bands: int = 8,
    hash_family: str = "murmur3",
) -> None:
    """Bootstrap an EMPTY index at ``path`` if none exists (zero-row
    band/shingle parquet with the correct schema, derived from
    ``like``) — lets the first micro-batch run the same accept_batch
    code path as every later one."""
    jvm = spark._jvm
    Path = jvm.org.apache.hadoop.fs.Path
    p = Path(f"{path}/shingles")
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(p):
        return
    from bigdataproject_spark.operators.dedup_index import write_minhash_index

    write_minhash_index(
        like.limit(0),
        path,
        id_col=id_col,
        shingles_col=shingles_col,
        num_hashes=num_hashes,
        bands=bands,
        hash_family=hash_family,
    )


def make_index_batch_writer(
    index_path: str,
    out_path: str,
    *,
    id_col: str,
    shingles_col: str,
    threshold: float,
    num_hashes: int = 32,
    bands: int = 8,
    hash_family: str = "murmur3",
):
    """The foreachBatch function: check the micro-batch against the
    index, append the accepted docs' signatures, and (re)write the
    batch's survivors to ``{out_path}/batch={batch_id}``. Idempotent
    under replay (see module docstring); exposed separately from
    :func:`stream_dedup_to_index` so tests can drive the replay case
    directly."""

    def _write_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        ensure_index(
            spark,
            index_path,
            like=batch_df,
            id_col=id_col,
            shingles_col=shingles_col,
            num_hashes=num_hashes,
            bands=bands,
            hash_family=hash_family,
        )
        accept_batch(
            spark,
            batch_df,
            index_path,
            id_col=id_col,
            shingles_col=shingles_col,
            threshold=threshold,
            num_hashes=num_hashes,
            bands=bands,
            hash_family=hash_family,
        )
        # survivors = batch ∩ store, read AFTER the append: identical on
        # the original run and on a crash-replay (where accept_batch
        # itself returns empty). Per-batch-dir overwrite keeps the
        # output exactly-once.
        stored_ids = spark.read.parquet(f"{index_path}/shingles").select(
            F.col("id").alias(id_col)
        )
        survivors = batch_df.join(stored_ids, id_col, "left_semi").drop(
            shingles_col
        )
        survivors.write.mode("overwrite").parquet(
            f"{out_path}/batch={batch_id}"
        )

    return _write_batch


def stream_dedup_to_index(
    docs_stream: DataFrame,
    *,
    index_path: str,
    out_path: str,
    checkpoint: str,
    id_col: str = "doc_id",
    shingles_col: str = "shingles",
    threshold: float = 0.8,
    num_hashes: int = 32,
    bands: int = 8,
    hash_family: str = "murmur3",
):
    """Drain a (already shingled) document stream through the index:
    returns the started StreamingQuery (availableNow trigger — process
    everything pending, then stop; call ``.awaitTermination()``)."""
    writer = make_index_batch_writer(
        index_path,
        out_path,
        id_col=id_col,
        shingles_col=shingles_col,
        threshold=threshold,
        num_hashes=num_hashes,
        bands=bands,
        hash_family=hash_family,
    )
    return (
        docs_stream.writeStream.foreachBatch(writer)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
