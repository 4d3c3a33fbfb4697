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
