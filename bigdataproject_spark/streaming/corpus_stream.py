"""Streaming corpus cleaning: the STATELESS funnel stages — language
ID, quality scoring, PII redaction — applied to a document stream.

A crawl lands as a stream of files; everything per-document (tokenize,
lang, quality, redact) is a pure map and therefore runs unchanged
under Structured Streaming — the same expressions as the batch funnel
(operators/corpus.py), so batch ≡ stream by construction (asserted in
tests/test_streaming_corpus.py). The STATEFUL stages (exact dedup,
minhash, components) stay out: cross-document state in a stream is a
different operator — `streaming/dedup_stream.py` covers the
watermark-bounded exact case, and the full near-dup story runs as the
incremental batch index (operators/dedup_index.py) over the stream's
accepted output, the standard lambda split.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bigdataproject_spark.operators.redact import pii_counts, redact_expr
from bigdataproject_spark.operators.textstats import (
    lang_id_expr,
    quality_features,
    quality_score_expr,
)
from bigdataproject_spark.schemas import DOCUMENTS
from bigdataproject_spark.streaming.energy_stream import run_to_memory

__all__ = [
    "read_document_stream",
    "clean_document_stream",
    "run_to_memory",
]


def read_document_stream(
    spark, path: str, *, max_files_per_trigger: int = 10
) -> DataFrame:
    """File-based stream over the documents parquet layout."""
    return (
        spark.readStream.schema(DOCUMENTS)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def clean_document_stream(
    docs: DataFrame,
    tokens: Column,
    *,
    languages: tuple[str, ...] = ("en",),
    min_quality: int = 50,
    redact: bool = True,
) -> DataFrame:
    """Per-document cleaning map: keeps docs passing the language and
    quality gates, emits (doc_id, lang, quality, text[, n_* counts]) —
    text redacted when ``redact``. Works identically on a batch frame
    (the equivalence the tests pin)."""
    from bigdataproject_spark.operators.corpus import check_min_quality

    check_min_quality(min_quality)
    feats = quality_features(F.col("text"), tokens)
    base = docs.select(
        "doc_id",
        "text",
        lang_id_expr(tokens).alias("lang"),
        *[c.alias(n) for n, c in feats.items()],
    ).select(
        "doc_id",
        "text",
        "lang",
        quality_score_expr({n: F.col(n) for n in feats}).alias("quality"),
    )
    kept = base.filter(
        F.col("lang").isin(*languages) & (F.col("quality") >= min_quality)
    )
    text_out = redact_expr("text") if redact else F.col("text")
    counts = pii_counts("text") if redact else {}
    return kept.select(
        "doc_id",
        "lang",
        "quality",
        text_out.alias("text"),
        *[c.alias(n) for n, c in counts.items()],
    )
