"""Adversarial edge-corpus parity for the span-dedup family (r12,
the r11 verdict's item 2).

``span_dedup_report`` failed the external driver's hash check in r10
and r11 while being bit-exact locally at every scale factor — on the
driver-generated corpora. If the divergence is a data shape the
generated testdata happens to lack, THIS corpus is built to contain
it: intra-doc repeated-token runs (every 8-gram identical), whole-doc
duplicates, adjacent islands whose boundary gram starts exactly at the
previous span's end, empty text, NULL text, multi/trailing spaces
(empty-string tokens inside grams), exactly-k-token docs, CR/LF
embedded inside tokens, and non-ASCII tokens. Each span query is
compared Spark-vs-DuckDB through the DRIVER'S EXACT compare — sort
columns by name, sort row tuples, md5 of ``repr`` (the same canon +
vhash as tools/drive_contract.py) — so a failure here IS a local
reproduction of the external red cell.
"""

from __future__ import annotations

import hashlib

import duckdb
import pytest

from bigdataproject_spark.queries_pipeline import (
    ORACLE_SPAN_DECONTAM_CLEAN,
    ORACLE_SPAN_DEDUP_CLEAN,
    ORACLE_SPAN_DEDUP_REPORT,
    ORACLE_SPAN_DEDUP_STATS,
    q_span_decontam_clean,
    q_span_dedup_clean,
    q_span_dedup_report,
    q_span_dedup_stats,
)

# One shared 12-token sentence for the whole-doc duplicate pair.
_DUP_SENT = "the quick brown fox jumps over the lazy dog near the river"
# Two 8-grams that sit ADJACENT in doc 4 (span A = tokens 0..8, span
# B = tokens 8..16 — B's first gram starts exactly where A's island
# ends), each duplicated from a different partner doc.
_GRAM_A = "alpha beta gamma delta epsilon zeta eta theta"
_GRAM_B = "iota kappa lambda mu nu xi omicron pi"
_EXACT_K = "one two three four five six seven eight"

EDGE_DOCS: list[tuple[int, str | None]] = [
    # intra-doc repeated-token run: every 8-gram is "x x x x x x x x"
    (1, " ".join(["x"] * 30)),
    # whole-doc duplicates
    (2, _DUP_SENT),
    (3, _DUP_SENT),
    # adjacent islands: A (0..8) then B (8..16), partners in 5 and 6
    (4, f"{_GRAM_A} {_GRAM_B} trailer tokens here"),
    (5, f"prefix words {_GRAM_A} suffix words again"),
    (6, f"{_GRAM_B} unrelated filler text follows now"),
    # empty and NULL text
    (7, ""),
    (8, None),
    # multi/trailing/leading spaces → empty-string tokens inside grams;
    # duplicated so the space-bearing grams actually form spans
    (9, "a  b   c d e f g h i j "),
    (10, "a  b   c d e f g h i j "),
    # exactly k=8 tokens, duplicated (len == k boundary)
    (11, _EXACT_K),
    (12, _EXACT_K),
    # k-1 tokens: below the gram threshold entirely
    (13, "just seven tokens sit right here okay"),
    # CR/LF embedded INSIDE tokens (split is on single space only)
    (14, "line1\nline2 tok\rcarriage mix\r\nboth a b c d e f"),
    (15, "line1\nline2 tok\rcarriage mix\r\nboth a b c d e f"),
    # non-ASCII tokens, duplicated
    (16, "héllo wörld 你好 世界 naïve café über straße déjà vu"),
    (17, "héllo wörld 你好 世界 naïve café über straße déjà vu"),
    # unique background docs (no duplicated grams)
    (18, "completely unique sentence number eighteen with many distinct words"),
    (19, "another entirely different document nineteen carrying fresh vocabulary"),
    # single token / single space
    (20, "solo"),
    (21, " "),
]


def _canon(cols, rows):
    """The driver's exact canonicalization (tools/drive_contract.py)."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(r[i] for i in order) for r in rows)


def _vhash(rows) -> str:
    h = hashlib.md5()
    for r in rows:
        h.update(repr(r).encode())
    return h.hexdigest()


@pytest.fixture(scope="module")
def edge_sf_dir(spark, tmp_path_factory) -> str:
    """A documents.parquet of the edge corpus, shaped like testdata."""
    from pyspark.sql import functions as F

    from bigdataproject_spark.schemas import DOCUMENTS

    base = str(tmp_path_factory.mktemp("span_edge"))
    df = spark.createDataFrame(
        [(i, t) for i, t in EDGE_DOCS], "doc_id long, text string"
    ).select(
        "doc_id",
        "text",
        F.lit("en").alias("lang"),
        F.lit("edge").alias("source"),
        F.length(F.coalesce("text", F.lit(""))).cast("long").alias("n_chars"),
    )
    assert [f.name for f in df.schema.fields] == [
        f.name for f in DOCUMENTS.fields
    ]
    df.coalesce(1).write.mode("overwrite").parquet(f"{base}/documents.parquet")
    return base


CASES = [
    ("span_dedup_stats", q_span_dedup_stats, ORACLE_SPAN_DEDUP_STATS),
    ("span_dedup_clean", q_span_dedup_clean, ORACLE_SPAN_DEDUP_CLEAN),
    ("span_dedup_report", q_span_dedup_report, ORACLE_SPAN_DEDUP_REPORT),
    (
        "span_decontam_clean",
        q_span_decontam_clean,
        ORACLE_SPAN_DECONTAM_CLEAN,
    ),
]


@pytest.mark.parametrize("name,fn,oracle", CASES, ids=[c[0] for c in CASES])
def test_span_edge_corpus_driver_exact_parity(
    spark, edge_sf_dir, name, fn, oracle
):
    df = fn(spark, edge_sf_dir)
    scols = df.columns
    srows = [tuple(r) for r in df.collect()]

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{edge_sf_dir}/documents.parquet/*.parquet')"
    )
    cur = con.execute(oracle)
    ocols = [d[0] for d in cur.description]
    orows = cur.fetchall()
    con.close()

    sc = _canon(scols, srows)
    oc = _canon(ocols, orows)
    assert sorted(scols) == sorted(ocols), name
    assert len(sc) == len(oc), (name, len(sc), len(oc))
    if _vhash(sc) != _vhash(oc):
        diffs = [
            (a, b) for a, b in zip(sc, oc) if repr(a) != repr(b)
        ][:3]
        pytest.fail(f"{name}: driver-exact hash mismatch; first diffs {diffs}")


def test_edge_corpus_actually_exercises_spans(spark, edge_sf_dir):
    """Guard against the corpus degenerating into 'no duplicates found'
    (a trivially-green parity proves nothing): the repeated-run doc,
    the whole-doc dup pair, the adjacent-island doc, the space-token
    pair, the len==k pair, the CR/LF pair and the non-ASCII pair must
    each carry dup spans, and doc 4 must merge A+B into ONE island."""
    rows = {
        r["doc_id"]: r
        for r in q_span_dedup_stats(spark, edge_sf_dir).collect()
    }
    for d in (1, 2, 3, 4, 5, 6, 9, 10, 11, 12, 14, 15, 16, 17):
        assert rows[d]["dup_tokens"] > 0, f"doc {d} has no dup span"
    for d in (7, 8, 13, 18, 19, 20, 21):
        assert rows[d]["dup_tokens"] == 0, f"doc {d} unexpectedly dup"
    # adjacent islands merged: one span covering A+B (16 tokens), not two
    assert rows[4]["n_dup_spans"] == 1 and rows[4]["dup_tokens"] == 16
    # intra-doc run covers the whole doc
    assert rows[1]["dup_tokens"] == rows[1]["total_tokens"] == 30
