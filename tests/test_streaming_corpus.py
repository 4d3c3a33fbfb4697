"""Streaming corpus cleaning must equal the same map on the batch
table (stateless stages stream unchanged — the equivalence is the whole
design, see streaming/corpus_stream.py)."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from bigdataproject_spark.sources.readers import load_table
from bigdataproject_spark.streaming.corpus_stream import (
    clean_document_stream,
    read_document_stream,
    run_to_memory,
)

def _tokens():
    # built lazily: Column construction needs an active SparkSession,
    # which doesn't exist at collection time
    return F.filter(F.split(F.lower("text"), r"[^a-z0-9]+"), lambda x: x != "")


def test_streaming_clean_matches_batch(spark, sf_dir, tmp_path):
    stream_dir = tmp_path / "docs_stream"
    stream_dir.mkdir()
    shutil.copy(f"{sf_dir}/documents.parquet", stream_dir / "part-0000.parquet")

    stream = read_document_stream(spark, str(stream_dir))
    run_to_memory(
        clean_document_stream(stream, _tokens()), "corpus_stream_test"
    )
    got = {
        r["doc_id"]: (r["lang"], r["quality"], r["text"])
        for r in spark.table("corpus_stream_test").collect()
    }

    batch = load_table(spark, sf_dir, "documents")
    want = {
        r["doc_id"]: (r["lang"], r["quality"], r["text"])
        for r in clean_document_stream(batch, _tokens()).collect()
    }
    assert got == want
    assert want, "fixture should keep at least one document"


def test_streaming_clean_redacts(spark, tmp_path):
    """A doc with PII flows through the stream redacted, with counts."""
    df = spark.createDataFrame(
        [
            (
                1,
                "the contact is bob@example.com and the site is "
                "https://x.y/z so write to the address with the details "
                "for the offer and the terms of the deal today",
                "en",
            )
        ],
        "doc_id long, text string, lang string",
    )
    stream_dir = tmp_path / "pii_stream"
    df.coalesce(1).write.parquet(str(stream_dir))
    stream = read_document_stream(spark, str(stream_dir))
    run_to_memory(clean_document_stream(stream, _tokens()), "pii_stream_test")
    rows = spark.table("pii_stream_test").collect()
    assert len(rows) == 1
    r = rows[0]
    assert "<email>" in r["text"] and "<url>" in r["text"]
    assert r["n_email"] == 1 and r["n_url"] == 1
    assert "bob@example.com" not in r["text"]
