"""End-to-end corpus-cleaning funnel (operators/corpus.py): stage
labels, precedence, survivor selection, and the stats aggregate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdataproject_spark.operators.corpus import (
    KEPT,
    clean_corpus,
    corpus_funnel,
    funnel_stats,
)

GOOD = (
    "the quick brown fox jumps over the lazy dog and then the fox "
    "is back to the den because the day is warm and the night is cold"
)
# near-dup pair: identical 30+ token prefix, one extra trailing token
NEAR_A = (
    "the story begins when the old sailor and the young cook set out "
    "to sea because the harbor is empty and the wind is fair for travel"
)
NEAR_B = NEAR_A + " tonight"


def _docs(spark):
    rows = [
        (1, GOOD),                       # kept
        (2, "der hund und die katze nicht ist hier und der tag ist gut"),  # lang
        (3, "the !!! ??? ###"),          # en but low quality
        (4, GOOD),                       # exact dup of 1
        (5, GOOD),                       # exact dup of 1
        (6, NEAR_A),                     # kept (min id of near-dup cluster)
        (7, NEAR_B),                     # near dup of 6
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    tokens = F.filter(
        F.split(F.lower("text"), r"[^a-z0-9]+"), lambda x: x != ""
    )
    return df.withColumn("tokens", tokens)


def test_funnel_stages(spark):
    funnel = corpus_funnel(_docs(spark), jaccard_threshold=0.8)
    got = {r["doc_id"]: r["stage"] for r in funnel.collect()}
    assert got == {
        1: KEPT,
        2: "lang",
        3: "quality",
        4: "exact_dup",
        5: "exact_dup",
        6: KEPT,
        7: "near_dup",
    }


def test_funnel_lang_and_quality_columns(spark):
    funnel = corpus_funnel(_docs(spark))
    by_id = {r["doc_id"]: r for r in funnel.collect()}
    assert by_id[2]["lang"] == "de"
    assert by_id[1]["lang"] == "en"
    assert by_id[3]["quality"] < 50 <= by_id[1]["quality"]


def test_clean_corpus_keeps_original_schema(spark):
    docs = _docs(spark)
    kept = clean_corpus(docs, jaccard_threshold=0.8)
    assert kept.columns == docs.columns
    assert {r["doc_id"] for r in kept.collect()} == {1, 6}


def test_funnel_stats_partition_corpus(spark):
    docs = _docs(spark)
    funnel = corpus_funnel(docs)
    stats = {r["stage"]: r["n_docs"] for r in funnel_stats(funnel).collect()}
    assert sum(stats.values()) == docs.count()
    assert stats[KEPT] == 2
    assert stats["exact_dup"] == 2


def test_near_dup_disabled(spark):
    funnel = corpus_funnel(_docs(spark), near_dup=False)
    got = {r["doc_id"]: r["stage"] for r in funnel.collect()}
    assert got[6] == KEPT and got[7] == KEPT
    # upstream stages unaffected
    assert got[2] == "lang" and got[4] == "exact_dup"


def test_funnel_on_empty_corpus(spark):
    """Zero-row robustness (mirrors test_empty_tables.py for the
    registry): every funnel stage — including the minhash + components
    chain — must survive an empty corpus."""
    docs = spark.createDataFrame(
        [], "doc_id long, text string, tokens array<string>"
    )
    funnel = corpus_funnel(docs)
    assert funnel.count() == 0
    assert funnel.columns == ["doc_id", "stage", "lang", "quality"]
    assert clean_corpus(docs).count() == 0
    assert funnel_stats(funnel).count() == 0


def test_funnel_on_real_documents(spark, sf_dir):
    """Smoke at sf0.001: every doc gets exactly one stage; kept set
    equals clean_corpus output; multilingual corpus rejects something."""
    from bigdataproject_spark.sources.readers import load_table
    from bigdataproject_spark.functions.tokenize import tokenize_expr

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "tokens",
        tokenize_expr("text", stopwords=(), min_len=1, drop_numeric=False),
    )
    funnel = corpus_funnel(docs)
    n = docs.count()
    assert funnel.count() == n
    stats = {r["stage"]: r["n_docs"] for r in funnel_stats(funnel).collect()}
    assert sum(stats.values()) == n
    assert stats.get(KEPT, 0) > 0
    kept = clean_corpus(docs)
    assert kept.count() == stats.get(KEPT, 0)


@pytest.mark.slow
def test_clean_corpus_span_dedup_stage(spark):
    """span_dedup_k adds the final Lee-et-al. stage: kept docs sharing
    a k-token run get it cut; everything else is byte-identical to the
    plain clean_corpus output, same rows, same schema."""
    shared = "alpha beta gamma delta epsilon zeta eta theta"
    extra = [
        (
            8,
            shared + " and the miller walks to the market while the sun "
            "is high over the hill and the birds sing",
        ),
        (
            9,
            "when the rain falls on the quiet village the river swells "
            "and the children stay inside " + shared,
        ),
    ]
    base = _docs(spark)
    more = spark.createDataFrame(extra, "doc_id long, text string")
    tokens = F.filter(
        F.split(F.lower("text"), r"[^a-z0-9]+"), lambda x: x != ""
    )
    docs = base.unionByName(more.withColumn("tokens", tokens))

    plain = {r.doc_id: r.text for r in clean_corpus(docs).collect()}
    assert {8, 9} <= set(plain)  # the new docs survive the doc-level funnel

    spanned = clean_corpus(docs, span_dedup_k=8)
    assert spanned.columns == docs.columns
    got = {r.doc_id: r.text for r in spanned.collect()}
    assert set(got) == set(plain)  # a transform, not a filter
    for d in set(plain) - {8, 9}:
        assert got[d] == plain[d], d  # untouched docs byte-identical
    assert got[8] == plain[8].replace(shared + " ", "")
    assert got[9] == plain[9].replace(" " + shared, "")
    # md5 family gives the same result on this corpus
    md5 = {
        r.doc_id: r.text
        for r in clean_corpus(
            docs, span_dedup_k=8, span_hash_family="md5"
        ).collect()
    }
    assert md5 == got


def test_clean_corpus_span_stage_preserves_null_text(spark):
    """A kept doc with NULL text must come back with NULL text, not ''
    (the span cut tokenizes NULL as '' internally; the transform
    contract is 'same rows, shorter text' for untouched docs). NULL
    text only survives the funnel under permissive thresholds — which
    is exactly the config an audit pipeline uses."""
    docs = spark.createDataFrame(
        [(1, None), (2, "alpha beta gamma delta epsilon zeta eta theta x y")],
        "doc_id long, text string",
    ).withColumn(
        "tokens",
        F.filter(F.split(F.lower("text"), r"[^a-z0-9]+"), lambda x: x != ""),
    )
    out = {
        r.doc_id: r.text
        for r in clean_corpus(
            docs, span_dedup_k=8, languages=("und", "en"), min_quality=0
        ).collect()
    }
    assert 1 in out and out[1] is None
    assert out[2] == "alpha beta gamma delta epsilon zeta eta theta x y"


def test_min_quality_rejects_stale_float_scale(spark):
    """r12 (advisor): r11 moved min_quality from a [0,1] float
    (default 0.5) to the integer centi-score [0,100] (default 50). A
    caller still passing 0.5 would silently keep every doc with any
    nonzero score — the boundary now fails loudly, in the batch funnel
    AND the streaming map (same validator)."""
    import pytest
    from pyspark.sql import functions as F

    from bigdataproject_spark.operators.corpus import (
        check_min_quality,
        corpus_funnel,
    )
    from bigdataproject_spark.streaming.corpus_stream import (
        clean_document_stream,
    )

    docs = spark.createDataFrame(
        [(1, "hello world", ["hello", "world"])],
        "doc_id long, text string, tokens array<string>",
    )
    with pytest.raises(ValueError, match=r"\[0,1\] *\n? *float|float\s+scale"):
        corpus_funnel(docs, min_quality=0.5)
    with pytest.raises(ValueError, match="centi-score"):
        clean_document_stream(docs, F.col("tokens"), min_quality=0.9)
    # boundary semantics: 0 and 1 are valid centi-scores, floats >= 1 too
    for ok in (0, 1, 50, 100):
        check_min_quality(ok)
    with pytest.raises(ValueError):
        check_min_quality(0.999)
