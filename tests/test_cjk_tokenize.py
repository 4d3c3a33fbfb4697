"""CJK bigram fallback tokenizer (SURVEY §7.4.1: jieba-free mode, clearly
separated from jieba semantics)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from bigdataproject_spark.functions.tokenize import cjk_bigram_tokens


def test_bigrams_and_latin_mix(spark):
    df = spark.createDataFrame(
        [("韩立真厉害 awesome stuff",), ("哈哈哈",), ("泪",), ("hello world",), ("",), (None,)],
        "t string",
    )
    got = [r.k for r in df.select(cjk_bigram_tokens("t").alias("k")).collect()]
    assert got[0] == ["韩立", "立真", "真厉", "厉害", "awesome", "stuff"]
    assert got[1] == ["哈哈"]  # distinct dedups the repeated bigram
    assert got[2] == ["泪"]  # single-char run kept
    assert got[3] == ["hello", "world"]
    assert got[4] == [] and got[5] == []


def test_stopword_filter(spark):
    df = spark.createDataFrame([("哈哈真好 the end",)], "t string")
    got = df.select(
        cjk_bigram_tokens("t", stopwords=("哈哈", "the")).alias("k")
    ).first()
    assert "哈哈" not in got.k and "the" not in got.k
    assert "真好" in got.k and "end" in got.k


def test_fmm_longest_match_and_oov():
    """Forward maximum matching: longest dictionary word wins at each
    position; out-of-vocabulary Han falls back to single characters."""
    from bigdataproject_spark.functions.cjk_dict import fmm_segment

    d = frozenset({"前方", "前方高能", "高能", "韩立", "厉害"})
    assert fmm_segment("前方高能", d, 4) == ["前方高能"]
    assert fmm_segment("韩立真厉害", d, 4) == ["韩立", "真", "厉害"]
    assert fmm_segment("泪", d, 4) == ["泪"]
    assert fmm_segment("", d, 4) == []


def test_segment_text_mixed_order_preserved():
    from bigdataproject_spark.functions.cjk_dict import segment_text

    d = frozenset({"韩立", "厉害"})
    assert segment_text("Wow 韩立真厉害 GG 42", d, 2) == [
        "wow", "韩立", "真", "厉害", "gg", "42",
    ]
    assert segment_text(None, d, 2) == []
    assert segment_text(
        "Wow 韩立", d, 2, lowercase=False
    ) == ["Wow", "韩立"]


def test_cjk_dict_backend_honors_policy(spark):
    """The cjk-dict backend routes through the SAME native post-filter
    as the other backends: min_len drops the OOV single-char fallback
    (the reference's len<=1 rule), drop_numeric and stopwords apply."""
    from bigdataproject_spark.functions.tokenize import get_tokenizer

    tok = get_tokenizer(
        "cjk-dict",
        stopwords=("哈哈",),
        min_len=2,
        drop_numeric=True,
        cjk_words=("韩立", "厉害", "哈哈"),
    )
    df = spark.createDataFrame(
        [("哈哈 韩立真厉害 666 ok",), (None,)], "text string"
    ).select(tok("text").alias("toks"))
    rows = df.collect()
    assert rows[0]["toks"] == ["韩立", "厉害", "ok"]  # 哈哈 stopped, 真 len1,
    assert rows[1]["toks"] == []                      # 666 numeric dropped


def test_cjk_dict_backend_is_arrow(spark):
    from bigdataproject_spark.functions.tokenize import get_tokenizer

    tok = get_tokenizer("cjk-dict")
    plan = (
        spark.createDataFrame([("韩立 ok",)], "text string")
        .select(tok("text").alias("t"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" in plan and "BatchEvalPython" not in plan


@pytest.mark.skipif(
    not os.path.isdir("/root/reference/data/SPY&FAMILY"),
    reason="reference snapshot not available",
)
def test_danmaku_word_count_dict_mode(spark):
    """Golden dictionary-mode word count over REAL reference danmaku:
    with the vendored dict plus the episode's meme word, dictionary
    segmentation surfaces it as a high-frequency WORD (the bigram
    backend only ever sees it as one of many overlapping bigrams), and
    the reference's own filter policy (len<=1 and numeric drops) holds.
    Cited fixture: /root/reference/data/SPY&FAMILY (crawler output; see
    SURVEY §1.1)."""
    from bigdataproject_spark.functions.cjk_dict import DEFAULT_CJK_WORDS
    from bigdataproject_spark.functions.tokenize import get_tokenizer
    from bigdataproject_spark.sources.readers import read_danmaku_csv

    dm = read_danmaku_csv(
        spark, "/root/reference/data/SPY&FAMILY/danmaku_BV1Fu4y1u7B8.csv"
    )
    tok = get_tokenizer(
        "cjk-dict",
        min_len=2,
        drop_numeric=True,
        cjk_words=DEFAULT_CJK_WORDS + ("上岸", "阿尼亚"),
    )
    top = (
        dm.select(F.explode(tok("text")).alias("w"))
        .groupBy("w")
        .count()
        .orderBy(F.desc("count"), F.asc("w"))
        .limit(50)
        .collect()
    )
    by_word = {r.w: r["count"] for r in top}
    assert "上岸" in by_word and by_word["上岸"] > 100
    assert all(len(w) >= 2 for w in by_word)
    assert not any(w.isdigit() for w in by_word)


@pytest.mark.skipif(
    not os.path.isdir("/root/reference/data/SPY&FAMILY"),
    reason="reference snapshot not available",
)
def test_danmaku_word_count_shape(spark):
    """A2 word-count over real danmaku with the bigram backend: top tokens
    are frequent memes, all bigrams are length<=2 Han or latin words."""
    from bigdataproject_spark.sources.readers import read_danmaku_csv

    dm = read_danmaku_csv(
        spark, "/root/reference/data/SPY&FAMILY/danmaku_BV1Fu4y1u7B8.csv"
    )
    top = (
        dm.select(F.explode(cjk_bigram_tokens("text")).alias("w"))
        .groupBy("w")
        .count()
        .orderBy(F.desc("count"), F.asc("w"))
        .limit(50)
        .collect()
    )
    assert len(top) == 50 and top[0]["count"] > 100
    assert any(r.w == "上岸" for r in top)  # the episode's dominant meme


def test_registry_cjk_phrases_segment_as_documented():
    """The cjk_word_count registry query's DuckDB oracle contributes
    the CJK phrases as LITERAL word arrays — valid only while the FMM
    segmenter actually produces those words. Pin the fact here: each
    phrase's post-filtered segmentation equals the literal the oracle
    uses (min_len>=2 drops the OOV single chars exactly as the
    reference's len<=1 rule)."""
    from bigdataproject_spark.functions.cjk_dict import (
        DEFAULT_CJK_WORDS,
        segment_text,
    )
    from bigdataproject_spark.queries_reference import _CJK_PHRASES

    words = frozenset(w for w in DEFAULT_CJK_WORDS if len(w) >= 2)
    max_len = max(len(w) for w in words)
    for phrase, expected in _CJK_PHRASES:
        got = [
            t
            for t in segment_text(phrase, words, max_len)
            if len(t) >= 2
        ]
        assert got == list(expected), phrase
