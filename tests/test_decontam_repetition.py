"""Unit tests for the round-2 training-pipeline additions: Gopher-style
repetition features and the train/eval n-gram contamination check."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from bigdataproject_spark.operators.decontam import ngram_contamination
from bigdataproject_spark.operators.dedup import portable_hashed_shingles
from bigdataproject_spark.operators.textstats import repetition_features


def _rep_rows(spark, token_lists):
    df = spark.createDataFrame(
        [Row(i=i, tokens=t) for i, t in enumerate(token_lists)],
        "i: long, tokens: array<string>",
    )
    reps = repetition_features("tokens")
    return {
        r["i"]: (r["dup"], r["top"])
        for r in df.select(
            "i",
            reps["dup_token_ratio"].alias("dup"),
            reps["top_bigram_ratio"].alias("top"),
        ).collect()
    }


def test_repetition_features_handcomputed(spark):
    got = _rep_rows(
        spark,
        [
            [],  # no tokens -> both 0
            ["a"],  # one token, no bigram
            ["a", "b", "c", "d"],  # all distinct, all bigrams unique
            ["a", "a", "a", "a"],  # total repetition
            ["a", "b", "a", "b", "a"],  # "a b" x2, "b a" x2 of 4 bigrams
        ],
    )
    assert got[0] == (0.0, 0.0)
    assert got[1] == (0.0, 0.0)
    # r11: ratios are unrounded (bit-exact IEEE int-ratio divisions)
    assert got[2] == (0.0, 1 / 3)  # 3 distinct bigrams, max count 1 of 3
    assert got[3] == (0.75, 1.0)  # 1 distinct of 4 tokens; "a a" is all 3 bigrams
    assert got[4] == (1.0 - 2 / 5, 0.5)  # 2 distinct of 5; max bigram 2 of 4


def test_repetition_zero_shuffle(spark):
    df = spark.createDataFrame(
        [Row(i=1, tokens=["x", "y", "x", "y"])], "i: long, tokens: array<string>"
    )
    reps = repetition_features("tokens")
    plan = (
        df.select(reps["top_bigram_ratio"].alias("t"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan  # pure map stage


def test_ngram_contamination_handcomputed(spark):
    # grams are plain ints here; the operator only needs array columns
    train = spark.createDataFrame(
        [
            Row(id=1, grams=[1, 2, 3, 4]),  # 2 of 4 in eval
            Row(id=2, grams=[9, 10]),  # none in eval
            Row(id=3, grams=[]),  # gram-less doc must still appear
            Row(id=4, grams=[1, 2]),  # fully contaminated
        ],
        "id: long, grams: array<long>",
    )
    ev = spark.createDataFrame(
        [Row(id=100, grams=[1, 2, 7])], "id: long, grams: array<long>"
    )
    out = {
        r["id"]: (r["n_grams"], r["n_hit"], r["contamination"], r["contaminated"])
        for r in ngram_contamination(
            train, ev, id_col="id", grams_col="grams", flag_threshold=0.5
        ).collect()
    }
    assert out[1] == (4, 2, 0.5, 1)
    assert out[2] == (2, 0, 0.0, 0)
    assert out[3] == (0, 0, 0.0, 0)
    assert out[4] == (2, 2, 1.0, 1)


def test_contamination_eval_side_broadcast(spark, sf_dir):
    from bigdataproject_spark.queries_pipeline import q_contamination

    plan = (
        q_contamination(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the eval gram set must probe as a broadcast hash join — never a
    # shuffle of the (100 TB at scale) training posting side
    assert "BroadcastHashJoin" in plan


def test_contamination_exact_dup_is_flagged(spark, sf_dir):
    """A training doc that is an exact copy of an eval doc must flag at
    contamination 1.0 (the case the filter exists for)."""
    from bigdataproject_spark.queries_pipeline import (
        CONTAM_EVAL_CUT,
        CONTAM_N,
        _docs_tokens,
    )

    docs = _docs_tokens(spark, sf_dir)
    base = docs.select(
        "doc_id",
        portable_hashed_shingles("tokens", CONTAM_N).alias("grams"),
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2).alias("kh"),
    )
    ev_doc = base.filter(
        (F.col("kh") < CONTAM_EVAL_CUT) & (F.size("grams") > 0)
    ).first()
    train = base.filter(F.col("kh") >= CONTAM_EVAL_CUT).limit(50).unionByName(
        base.filter(F.col("doc_id") == ev_doc["doc_id"]).select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"), "grams", "kh"
        )
    )
    ev = base.filter(F.col("kh") < CONTAM_EVAL_CUT)
    out = ngram_contamination(
        train, ev, id_col="doc_id", grams_col="grams", flag_threshold=0.5
    )
    planted = out.filter(F.col("doc_id") == ev_doc["doc_id"] + 1_000_000).first()
    assert planted["contamination"] == 1.0
    assert planted["contaminated"] == 1


def test_line_repetition_handcomputed(spark):
    from bigdataproject_spark.operators.textstats import (
        line_repetition_features,
    )

    rows = [
        (0, None),  # NULL text -> all zero
        (1, ""),  # empty -> all zero
        (2, "aa\nbb\ncc"),  # all distinct
        (3, "aa\nbb\naa\n\n  \naa"),  # aa x3; blanks excluded
        (4, "x\r\ny\rx"),  # CRLF + bare CR split; x duplicated
        (5, "longline\nz\nlongline"),  # char frac weighted by length
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    feats = line_repetition_features(F.coalesce("text", F.lit("")))
    got = {
        r["doc_id"]: (
            r["n_lines"], r["n_dup_lines"], r["dup_line_frac"], r["dup_char"]
        )
        for r in df.select(
            "doc_id",
            feats["n_lines"].alias("n_lines"),
            feats["n_dup_lines"].alias("n_dup_lines"),
            feats["dup_line_frac"].alias("dup_line_frac"),
            feats["dup_line_char_frac"].alias("dup_char"),
        ).collect()
    }
    assert got[0] == (0, 0, 0.0, 0.0)
    assert got[1] == (0, 0, 0.0, 0.0)
    assert got[2] == (3, 0, 0.0, 0.0)
    # doc 3: lines [aa, bb, aa, aa] -> 4 lines, 2 dup; chars 8 total,
    # distinct {aa, bb} = 4 -> char frac 0.5
    assert got[3] == (4, 2, 0.5, 0.5)
    assert got[4] == (3, 1, 1 / 3, 1 / 3)
    # doc 5: chars 8+1+8=17, distinct 9 -> 8/17
    assert got[5] == (3, 1, 1 / 3, 8 / 17)


def test_line_repetition_zero_shuffle(spark):
    from bigdataproject_spark.operators.textstats import (
        line_repetition_features,
    )

    df = spark.createDataFrame(
        [(1, "a\nb\na")], "doc_id: long, text: string"
    )
    feats = line_repetition_features("text")
    plan = (
        df.select(feats["dup_line_char_frac"].alias("f"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan  # pure map stage


def test_line_repetition_from_lines_no_resplit(spark):
    """r12 review: constructed line arrays must be consumed AS lines.
    A line whose content embeds CR/LF counts as ONE line through
    from_lines (matching an oracle that counts one line per
    constructed slice), while the text variant — join then split —
    would count its pieces separately."""
    from bigdataproject_spark.operators.textstats import (
        line_repetition_features,
        line_repetition_from_lines,
    )

    df = spark.createDataFrame(
        [(1, ["aa\nbb", "cc", "aa\nbb"])],
        "doc_id: long, lines: array<string>",
    )
    fl = line_repetition_from_lines(F.col("lines"))
    got = df.select(
        fl["n_lines"].alias("n"), fl["n_dup_lines"].alias("d")
    ).collect()[0]
    assert (got["n"], got["d"]) == (3, 1)  # one line per element

    ft = line_repetition_features(F.concat_ws("\n", "lines"))
    got_t = df.select(
        ft["n_lines"].alias("n"), ft["n_dup_lines"].alias("d")
    ).collect()[0]
    assert (got_t["n"], got_t["d"]) == (5, 2)  # re-split: aa,bb,cc,aa,bb
