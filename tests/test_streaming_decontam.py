"""Streaming span-level decontamination (streaming/decontam_stream.py):
the persisted reference index round-trips its pinned config, the
foreachBatch scrub equals the one-shot batch run, and a replayed batch
rewrites identical rows (idempotence without ledger machinery — the
index is immutable)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from bigdataproject_spark.operators.spandedup import (
    decontaminate_spans,
    load_reference_gram_index,
    remove_duplicate_spans,
    reference_gram_keys,
    write_reference_gram_index,
)
from bigdataproject_spark.schemas import DOCUMENTS
from bigdataproject_spark.streaming.corpus_stream import read_document_stream
from bigdataproject_spark.streaming.decontam_stream import (
    make_decontam_batch_writer,
    stream_decontam_spans,
)

EVAL = [
    (900, "q1 q2 q3 q4 the answer is forty two"),
    (901, "p1 p2 p3 p4 another benchmark prompt here"),
]
TRAIN = [
    (1, "intro text q1 q2 q3 q4 trailing words"),           # leaks eval 900
    (2, "c1 c2 c3 c4 completely clean document body"),      # clean
    (3, "p1 p2 p3 p4 leading leak then normal text"),       # leaks eval 901
    (4, "x1 x2 x3 x4 x5 x6 x7 x8 x9"),                      # clean
    (5, "more q1 q2 q3 q4 and p1 p2 p3 p4 double leak"),    # leaks both
    (6, "short"),                                            # < k tokens
]
K = 4


def _doc_df(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t, lang="en", source="src0", n_chars=len(t)) for i, t in rows],
        DOCUMENTS,
    )


@pytest.fixture()
def index_path(spark, tmp_path):
    p = str(tmp_path / "refidx")
    write_reference_gram_index(
        _doc_df(spark, EVAL), p, text_col="text", k=K, hash_family="xxhash64"
    )
    return p


def test_index_roundtrip_and_pinned_config(spark, index_path):
    keys, k, fam = load_reference_gram_index(spark, index_path)
    assert (k, fam) == (K, "xxhash64")
    want = {
        r.key
        for r in reference_gram_keys(
            _doc_df(spark, EVAL), text_col="text", k=K, hash_family="xxhash64"
        ).collect()
    }
    assert {r.key for r in keys.collect()} == want and want

    train = _doc_df(spark, TRAIN)
    via_index = {
        r.doc_id: r.clean_text
        for r in decontaminate_spans(
            train, index_path, id_col="doc_id", text_col="text"
        ).collect()
    }
    explicit = {
        r.doc_id: r.clean_text
        for r in remove_duplicate_spans(
            train,
            id_col="doc_id",
            text_col="text",
            k=K,
            hash_family="xxhash64",
            reference_keys=reference_gram_keys(
                _doc_df(spark, EVAL), text_col="text", k=K, hash_family="xxhash64"
            ),
        ).collect()
    }
    assert via_index == explicit
    assert via_index[1] == "intro text trailing words"
    assert via_index[2] == TRAIN[1][1]  # clean doc untouched
    assert via_index[5] == "more and double leak"
    assert via_index[6] == "short"


def test_corrupt_meta_fails_loudly(spark, tmp_path, index_path):
    bad = str(tmp_path / "badidx")
    spark.read.parquet(f"{index_path}/keys").write.parquet(f"{bad}/keys")
    spark.createDataFrame(
        [(K, "xxhash64"), (K + 1, "md5")], "k int, hash_family string"
    ).write.parquet(f"{bad}/meta")
    with pytest.raises(ValueError, match="meta"):
        load_reference_gram_index(spark, bad)


def test_stream_equals_batch_and_replay_idempotent(spark, tmp_path, index_path):
    train = _doc_df(spark, TRAIN)
    stream_dir = tmp_path / "stream_in"
    stream_dir.mkdir()
    # three single-file landings -> three micro-batches
    for j, chunk in enumerate((TRAIN[:2], TRAIN[2:4], TRAIN[4:])):
        _doc_df(spark, chunk).repartition(1).write.parquet(
            str(stream_dir / f"landing{j}.parquet")
        )

    out = str(tmp_path / "scrubbed")
    q = stream_decontam_spans(
        read_document_stream(spark, str(stream_dir) + "/*", max_files_per_trigger=1),
        index_path=index_path,
        out_path=out,
        checkpoint_dir=str(tmp_path / "ckpt"),
        id_col="doc_id",
        text_col="text",
    )
    q.awaitTermination(120)

    got = {
        r.doc_id: r.clean_text for r in spark.read.parquet(f"{out}/batch=*").collect()
    }
    want = {
        r.doc_id: r.clean_text
        for r in decontaminate_spans(
            train, index_path, id_col="doc_id", text_col="text"
        ).collect()
    }
    assert got == want  # stream == batch, regardless of batch chopping

    # replay: re-running a batch writer with the same batch_id rewrites
    # the same rows (immutable index -> same decision, overwrite sink)
    writer = make_decontam_batch_writer(index_path, out, id_col="doc_id", text_col="text")
    before = sorted(
        (r.doc_id, r.clean_text)
        for r in spark.read.parquet(f"{out}/batch=0").collect()
    )
    writer(_doc_df(spark, TRAIN[:2]), 0)
    after = sorted(
        (r.doc_id, r.clean_text)
        for r in spark.read.parquet(f"{out}/batch=0").collect()
    )
    assert before == after and len(before) == 2
