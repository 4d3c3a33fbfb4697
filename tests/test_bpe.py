"""Deterministic pure-Python BPE backend (functions/bpe.py, r6):
learner determinism, encode round-trip, Arrow seam, policy filters,
and chunk/pack invariants under subword token counts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdataproject_spark.functions.bpe import (
    EOW,
    SimpleBPE,
    bpe_tokenize_udf,
    default_merges,
    learn_bpe,
)
from bigdataproject_spark.functions.tokenize import get_tokenizer


def test_learn_bpe_deterministic_and_sane():
    sample = ["low lower lowest newest newer new widest wide wider"] * 3
    m1 = learn_bpe(sample, 30)
    m2 = learn_bpe(list(sample), 30)
    assert m1 == m2
    assert len(m1) > 5
    # a frequent digraph earned an early merge
    assert any(a + b in ("lo", "ne", "wi", "we", "er", "es") for a, b in m1[:6])
    # stops early rather than memorizing singletons: a pair must occur
    # at least twice to earn a merge
    assert learn_bpe(["ab"], 100) == []
    assert 1 <= len(learn_bpe(["ab ab ab"], 100)) <= 2


def test_encode_round_trips_and_caches():
    merges = learn_bpe(["the mother of the otter bothered another brother"], 50)
    enc = SimpleBPE(merges)
    for w in ("mother", "brother", "bother", "zzz", "o"):
        pieces = enc.encode_word(w)
        joined = "".join(pieces)
        assert joined == w + EOW, w
    # cache hit returns the identical tuple object
    assert enc.encode_word("mother") is enc.encode_word("mother")
    # empty / None text
    assert enc.encode("") == []
    assert enc.encode(None) == []


def test_default_merges_stable_and_compressing():
    m = default_merges()
    assert m == default_merges()  # lru-cached, deterministic
    assert len(m) > 50
    enc = SimpleBPE(m)
    pieces = enc.encode("the information processing operation")
    # common words compress to few pieces; total chars round-trip
    assert "".join(pieces) == "the" + EOW + "information" + EOW + "processing" + EOW + "operation" + EOW
    assert len(pieces) < len("the information processing operation".replace(" ", "")) // 2


def test_bpe_udf_matches_driver_side(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "information generation preparation"),
        (3, ""),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["toks"]
        for r in df.select(
            "doc_id", bpe_tokenize_udf()("text").alias("toks")
        ).collect()
    }
    enc = SimpleBPE(default_merges())
    for doc_id, text in rows:
        assert got[doc_id] == enc.encode(text or ""), doc_id


def test_bpe_backend_policy_and_arrow_plan(spark):
    tok = get_tokenizer("bpe", stopwords=("the",), min_len=2, drop_numeric=True)
    df = spark.createDataFrame(
        [("the cat 42 x runs",)], "text string"
    ).select(tok("text").alias("toks"))
    toks = df.collect()[0]["toks"]
    bare = {t[: -len(EOW)] if t.endswith(EOW) else t for t in toks}
    assert "the" not in bare  # stopword on the bare piece
    assert "42" not in bare  # numeric piece dropped
    assert "x" not in bare  # min_len on the bare piece, EOW not counted
    assert "".join(t for t in toks if t.endswith(EOW) or True)  # non-empty
    plan = (
        spark.createDataFrame([("abc",)], "text string")
        .withColumn("toks", tok("text"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" in plan and "BatchEvalPython" not in plan


def test_chunk_pack_invariants_under_bpe(spark):
    """The seam promise, now with the real subword backend: chunk/pack
    arithmetic holds unchanged over BPE token arrays."""
    from bigdataproject_spark.operators.chunking import chunk_documents
    from bigdataproject_spark.operators.packing import pack_sequences

    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "a much longer document " + "with many repeated tokens " * 20),
        (3, ""),
        (4, None),
        (5, "short"),
    ]
    tok = get_tokenizer("bpe")
    TARGET, CHUNK = 10, 4
    docs = spark.createDataFrame(rows, "doc_id long, text string").withColumn(
        "tokens", tok("text")
    )
    chunks = chunk_documents(docs, chunk_tokens=CHUNK, overlap=1)
    packed = pack_sequences(
        chunks.withColumn("shard", F.pmod("doc_id", F.lit(2)).cast("int")),
        shard_col="shard",
        order_cols=["doc_id", "chunk_id"],
        target_tokens=TARGET,
    ).collect()
    assert packed
    by_pack: dict[tuple, list] = {}
    for r in packed:
        assert 0 <= r["n_tokens"] <= CHUNK
        by_pack.setdefault((r["shard"], r["pack_id"]), []).append(r)
    for (shard, _), prows in by_pack.items():
        prows.sort(key=lambda r: r["pack_pos"])
        assert [r["pack_pos"] for r in prows] == list(range(len(prows)))
        total = sum(r["n_tokens"] for r in prows)
        assert prows[-1]["pack_cum_tokens"] == total
        assert total < TARGET + CHUNK
    for shard in {s for s, _ in by_pack}:
        ids = sorted(p for s, p in by_pack if s == shard)
        assert ids == list(range(len(ids)))
        for p in ids[:-1]:
            assert sum(r["n_tokens"] for r in by_pack[(shard, p)]) > TARGET - CHUNK


def test_custom_merges_pass_through(spark):
    merges = learn_bpe(["aaa aaa aaa bbb"], 10)
    tok = get_tokenizer("bpe", bpe_merges=merges)
    out = (
        spark.createDataFrame([("aaa bbb",)], "text string")
        .select(tok("text").alias("t"))
        .collect()[0]["t"]
    )
    assert "".join(out) == "aaa" + EOW + "bbb" + EOW
