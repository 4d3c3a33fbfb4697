"""Document chunking (operators/chunking.py): span math against a pure
Python reference, coverage/overlap invariants, DuckDB oracle parity,
and plan shape (zero shuffle)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from bigdataproject_spark.operators.chunking import chunk_documents, chunk_spans


def _py_spans(n, chunk, overlap):
    stride = chunk - overlap
    if n <= chunk:
        return [(0, 0, min(n, chunk))]
    out, i, start = [], 0, 0
    while start < n:
        if start > 0 and start + overlap >= n:
            break  # would add no new tokens
        out.append((i, start, min(n - start, chunk)))
        if start + chunk >= n:
            break
        i += 1
        start += stride
    return out


@pytest.mark.parametrize(
    "n,chunk,overlap",
    [(0, 5, 0), (1, 5, 0), (5, 5, 0), (6, 5, 0), (10, 5, 0), (11, 5, 0),
     (10, 5, 2), (11, 5, 2), (12, 5, 4), (100, 7, 3), (1, 1, 0)],
)
def test_spans_match_reference(spark, n, chunk, overlap):
    df = spark.createDataFrame([([f"t{i}" for i in range(n)],)], "tokens array<string>")
    got = [
        (s["chunk_id"], s["start"], s["length"])
        for s in df.select(
            chunk_spans("tokens", chunk_tokens=chunk, overlap=overlap).alias("s")
        ).collect()[0]["s"]
    ]
    assert got == _py_spans(n, chunk, overlap)


@pytest.mark.parametrize("n,chunk,overlap", [(137, 16, 0), (137, 16, 5), (64, 8, 7)])
def test_coverage_and_overlap_invariants(spark, n, chunk, overlap):
    toks = [f"t{i}" for i in range(n)]
    df = spark.createDataFrame([(1, toks)], "doc_id long, tokens array<string>")
    rows = sorted(
        chunk_documents(
            df, chunk_tokens=chunk, overlap=overlap
        ).collect(),
        key=lambda r: r["chunk_id"],
    )
    rebuilt = []
    for r in rows:
        parts = r["chunk_text"].split(" ")
        assert len(parts) == r["n_tokens"] <= chunk
        # consecutive chunks repeat exactly `overlap` tokens
        rebuilt.extend(parts if not rebuilt else parts[overlap:])
    assert rebuilt == toks  # full coverage, in order, no gaps
    assert {r["n_chunks"] for r in rows} == {len(rows)}


def test_empty_and_null_docs(spark):
    df = spark.createDataFrame(
        [(1, []), (2, None), (3, ["a"])],
        "doc_id long, tokens array<string>",
    )
    rows = {r["doc_id"]: r for r in chunk_documents(df, chunk_tokens=4).collect()}
    assert len(rows) == 3
    assert rows[1]["n_tokens"] == 0 and rows[1]["chunk_text"] == ""
    assert rows[2]["n_tokens"] == 0
    assert rows[3]["chunk_text"] == "a" and rows[3]["n_chunks"] == 1


def test_spans_on_int_token_ids(spark):
    """chunk_spans is type-agnostic: tokenization policy stays the
    caller's, including integer token-id arrays (the NULL guard must
    not pin the element type to string)."""
    df = spark.createDataFrame(
        [(1, list(range(10))), (2, None)],
        "doc_id long, ids array<int>",
    )
    rows = {
        r["doc_id"]: r["sp"]
        for r in df.select(
            "doc_id", chunk_spans("ids", chunk_tokens=4, overlap=1).alias("sp")
        ).collect()
    }
    assert [(s["start"], s["length"]) for s in rows[1]] == [
        (0, 4), (3, 4), (6, 4)
    ]
    assert [(s["start"], s["length"]) for s in rows[2]] == [(0, 0)]


def test_invalid_params(spark):
    with pytest.raises(ValueError):
        chunk_spans("t", chunk_tokens=0)
    with pytest.raises(ValueError):
        chunk_spans("t", chunk_tokens=4, overlap=4)


def test_duckdb_oracle_parity(spark, sf_dir):
    """Chunk the real documents table and compare against a DuckDB
    implementation of the same span math (list_slice + list_aggregate)."""
    from bigdataproject_spark.sources.readers import load_table

    chunk, overlap, stride = 12, 4, 8
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "tokens",
        F.filter(F.split(F.lower("text"), r"[^a-z0-9]+"), lambda x: x != ""),
    )
    got = {
        (r["doc_id"], r["chunk_id"]): (r["chunk_text"], r["n_tokens"], r["n_chunks"])
        for r in chunk_documents(
            docs, chunk_tokens=chunk, overlap=overlap
        ).collect()
    }
    con = duckdb.connect()
    oracle = con.execute(f"""
        WITH t AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                             x -> x != '') AS toks
          FROM read_parquet('{sf_dir}/documents.parquet')
        ),
        n AS (
          SELECT doc_id, toks, len(toks) AS n,
                 (1 + CAST(floor((greatest(len(toks) - {chunk}, 0) + {stride - 1})
                                 / {stride}) AS INT)) AS n_chunks
          FROM t
        )
        SELECT doc_id, i - 1 AS chunk_id, n_chunks,
               array_to_string(list_slice(toks, (i-1)*{stride} + 1,
                               (i-1)*{stride} + least(n - (i-1)*{stride}, {chunk})), ' ') AS chunk_text,
               least(n - (i-1)*{stride}, {chunk}) AS n_tokens
        FROM (SELECT doc_id, toks, n, n_chunks,
                     unnest(generate_series(1, n_chunks)) AS i
              FROM n)
    """).fetchall()
    want = {(r[0], r[1]): (r[3], r[4], r[2]) for r in oracle}
    assert got == want


def test_zero_shuffle_plan(spark, sf_dir):
    from bigdataproject_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "tokens", F.split("text", " ")
    )
    plan = (
        chunk_documents(docs, chunk_tokens=64)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange hashpartitioning" not in plan
    assert "Exchange rangepartitioning" not in plan
    assert "BatchEvalPython" not in plan
