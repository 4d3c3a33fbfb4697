"""Document chunking: split long documents into overlapping token
windows — the standard step between corpus cleaning and tokenization in
a training-data pipeline (a 200k-token document does not fit a context
window; a 100 TB corpus is chunked exactly once, so the op must be a
pure map pass). No reference counterpart (the reference's documents are
single danmaku lines); north-star op per BASELINE.json.

Shape: one generate (explode) per document — zero shuffle, stays in the
scan stage, output rows ≈ Σ ceil(n_tokens / stride). Chunk boundaries
are token-aligned (never mid-token); `overlap` tokens are repeated
between consecutive chunks (training pipelines overlap so no span is
seen only at a boundary). The last chunk is the tail remainder —
emitted only if it adds tokens beyond the previous chunk's coverage,
and a document shorter than one window yields exactly one chunk (its
whole self). Token arrays are the input — tokenization policy stays
the caller's, as everywhere else in the engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def chunk_spans(
    tokens: Column | str, *, chunk_tokens: int, overlap: int = 0
) -> Column:
    """array<struct<chunk_id int, start int, length int>> of token-index
    spans covering the array: starts at 0, stride = chunk_tokens −
    overlap. Pure expression (composable into any projection)."""
    if chunk_tokens <= 0:
        raise ValueError("chunk_tokens must be positive")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("overlap must satisfy 0 <= overlap < chunk_tokens")
    t = F.col(tokens) if isinstance(tokens, str) else tokens
    stride = chunk_tokens - overlap
    # NULL-array guard lives HERE, not just in chunk_documents: size(NULL)
    # is -1 and would yield a garbage (0, 0, -1) span for any caller
    # composing this expression directly. Guard on size rather than
    # coalescing with a typed empty array so the expression works on ANY
    # element type (array<int> token ids, not just array<string>).
    n = F.when(t.isNull(), F.lit(0)).otherwise(F.size(t))
    # number of chunks: 1 for n <= chunk_tokens (incl. n = 0), else
    # 1 + ceil((n - chunk_tokens) / stride) — every start past the first
    # must add at least one new token.
    extra = F.greatest(n - F.lit(chunk_tokens), F.lit(0))
    n_chunks = (
        F.lit(1) + F.floor((extra + F.lit(stride - 1)) / F.lit(stride))
    ).cast("int")
    idx = F.sequence(F.lit(0), n_chunks - F.lit(1))
    return F.transform(
        idx,
        lambda i: F.struct(
            i.cast("int").alias("chunk_id"),
            (i * stride).cast("int").alias("start"),
            F.least(n - i * stride, F.lit(chunk_tokens))
            .cast("int")
            .alias("length"),
        ),
    )


def chunk_documents(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    chunk_tokens: int,
    overlap: int = 0,
    joiner: str = " ",
) -> DataFrame:
    """(id_col, chunk_id, n_chunks, chunk_text, n_tokens) — one row per
    chunk, chunk_text = the span's tokens re-joined with ``joiner``.

    Empty/NULL token arrays yield one empty chunk (chunk_id 0, zero
    tokens) so every input document stays accounted for downstream —
    filter `n_tokens > 0` to drop them."""
    t = F.coalesce(
        F.col(tokens_col), F.array().cast("array<string>")
    )
    spans = chunk_spans(t, chunk_tokens=chunk_tokens, overlap=overlap)
    # n_chunks arithmetically (the same formula chunk_spans sizes its
    # array with) rather than F.size(spans): size would evaluate the
    # whole span-transform expression a second time per document on a
    # hot path whose cost is supposed to be one pass.
    stride = chunk_tokens - overlap
    extra = F.greatest(F.size(t) - F.lit(chunk_tokens), F.lit(0))
    n_chunks = (
        F.lit(1) + F.floor((extra + F.lit(stride - 1)) / F.lit(stride))
    ).cast("int")
    exploded = docs.select(
        F.col(id_col),
        t.alias("_t"),
        n_chunks.alias("n_chunks"),
        F.explode(spans).alias("_sp"),
    )
    return exploded.select(
        id_col,
        F.col("_sp.chunk_id").alias("chunk_id"),
        "n_chunks",
        F.concat_ws(
            joiner, F.slice("_t", F.col("_sp.start") + 1, F.col("_sp.length"))
        ).alias("chunk_text"),
        F.col("_sp.length").alias("n_tokens"),
    )
