"""Lexical full-text ranking: BM25 top-k over a document corpus.

The lexical counterpart of operators/simsearch.py's embedding ANN
family — the retrieval op an LLM-data pipeline uses for eval-set
mining, targeted corpus slicing, and hybrid (lexical + vector)
retrieval. Public algorithm: Okapi BM25 (Robertson & Spärck Jones;
the ``ln(1 + (N - df + 0.5)/(df + 0.5))`` idf with the standard
k1/b saturation — the Lucene-documented flavor). The reference engine
has no search operator; this is north-star pipeline surface.

Spark-first plan — the query is KNOWN at plan time, so the vocabulary
is never exploded and nothing document-sized ever shuffles:

  1. a map pass over the corpus computes, per doc, the term
     frequency of each QUERY term (``F.size(F.filter(tokens, ...))``
     — native higher-order functions inside codegen, |query| counters
     per row) plus the doc length;
  2. corpus statistics (N, avgdl, per-term document frequencies) are
     ONE map-side-combinable aggregate over those counters collapsing
     to a SINGLE row, which re-enters the plan as a broadcast nested
     loop join (1 row — constant-folded into the score expression at
     execution);
  3. the score is a pure column expression; top-k is the standard
     TakeOrderedAndProject (no global sort materialization).

At 100 TB this is: TWO passes over the same pruned columnar
projection (the per-doc counter map is not materialized, so the stats
aggregate and the scoring side each rescan the parquet — deliberate:
persisting a corpus-sized counter table to dodge a column-pruned
rescan is a worse trade at every scale), a ~|query|-integer-wide
aggregate, zero wide shuffles. Scoring M queries batches the same
scan M ways or unions — for high-QPS serving you would materialize an
inverted index instead; this operator is the exact-scoring batch path
(mining, labeling, decontam-adjacent slicing), where rescanning
columnar parquet beats maintaining an index you query once.
"""

from __future__ import annotations

import math
import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["bm25_topk", "bm25_topk_multi", "rrf_fuse"]


def _house_tokens(text_col):
    """The engine's standard lowercase [a-z0-9]+ tokenizer (identical
    to queries_pipeline._SQL_TOKENS so oracles stay exact)."""
    return F.filter(
        F.split(F.lower(F.coalesce(text_col, F.lit(""))), r"[^a-z0-9]+"),
        lambda t: t != "",
    )


def bm25_topk(
    docs: DataFrame,
    query: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    tokens_col: str | None = None,
) -> DataFrame:
    """Top-``k`` docs for ``query`` by BM25: (doc_id, score), score
    rounded to 6dp, ties broken by ascending doc_id (deterministic
    output — same discipline as every ranked query in the registry).
    Docs matching NO query term score 0 and are excluded. ``query`` is
    tokenized with the house tokenizer; duplicate query terms count
    once (standard bag-of-words-query BM25). Pass ``tokens_col`` to
    rank over a pre-tokenized column instead (tokenization policy
    stays the caller's, as everywhere in the engine)."""
    terms = sorted({w for w in re.split(r"[^a-z0-9]+", query.lower()) if w})
    if not terms:
        raise ValueError(f"query {query!r} has no tokens")
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")

    def _tf(term: str):
        # NOTE: the lambda must take exactly ONE parameter — a second
        # parameter makes F.filter pass the element INDEX into it,
        # silently clobbering any default-arg closure trick
        return F.size(F.filter(toks, lambda x: x == F.lit(term)))

    toks = F.col(tokens_col) if tokens_col else _house_tokens(F.col(text_col))
    per_doc = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).cast("long").alias("dl"),
        *[_tf(t).cast("long").alias(f"tf_{i}") for i, t in enumerate(terms)],
    )

    # ONE combinable aggregate → a single stats row, broadcast back in.
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(terms))
        ],
    )
    scored = per_doc.join(F.broadcast(stats))

    n = F.col("n_docs").cast("double")
    score = F.lit(0.0)
    for i in range(len(terms)):
        tf = F.col(f"tf_{i}").cast("double")
        df = F.col(f"df_{i}").cast("double")
        idf = F.log((n - df + F.lit(0.5)) / (df + F.lit(0.5)) + F.lit(1.0))
        denom = tf + F.lit(k1) * (
            F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl")
        )
        score = score + idf * tf * F.lit(k1 + 1.0) / denom
    return (
        scored.where(
            sum((F.col(f"tf_{i}") > 0).cast("int") for i in range(len(terms)))
            > 0
        )
        .select("doc_id", F.round(score, 6).alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id"))
        .limit(k)
    )


def bm25_topk_multi(
    docs: DataFrame,
    queries: list[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    tokens_col: str | None = None,
    partial_topk_salts: int = 64,
) -> DataFrame:
    """Batch BM25: top-``k`` docs for EVERY query in ``queries`` from
    ONE shared corpus pass — (query, doc_id, score), per-query ranking
    identical to :func:`bm25_topk` (same sorted-term score expression,
    so the floats are bit-equal to M single-query runs). The shape an
    eval-mining pipeline actually runs: M queries against the same
    100 TB corpus must not pay M corpus scans.

    Plan: the DISTINCT terms across all queries get one native tf
    counter each in a single map pass (a term shared by several
    queries is counted once); corpus stats (N, avgdl, every df)
    collapse to ONE broadcast row exactly as in the single-query
    operator; per-query scores are pure column expressions over the
    shared counters, exploded to (query, doc_id, score) rows for
    MATCHING docs only. Per-query top-k is TWO windows (r12, per the
    r11 advice): a PARTIAL top-k partitioned by (query, salt) — salt =
    a deterministic hash of doc_id mod ``partial_topk_salts``, so a
    query whose terms match most of the corpus spreads over
    ``partial_topk_salts`` reducers instead of funneling the whole
    match set through one — then the final per-query window over at
    most ``k × partial_topk_salts`` rows per query. Keeping the k best
    of every salt group keeps a superset of the global top-k, so the
    result is identical; the salt is a pure function of doc_id
    (deterministic under stage retry — no spark_partition_id, no row
    ids). Scale note: like bm25_topk the un-materialized counter
    projection makes the stats aggregate and the scoring side each
    rescan the pruned parquet (two passes total — for M queries still
    two, not 2M)."""
    qterms = {
        q: sorted({w for w in re.split(r"[^a-z0-9]+", q.lower()) if w})
        for q in queries
    }
    if not queries:
        raise ValueError("need at least one query")
    for q, ts in qterms.items():
        if not ts:
            raise ValueError(f"query {q!r} has no tokens")
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    if partial_topk_salts < 1:
        raise ValueError(
            f"partial_topk_salts must be >= 1, got {partial_topk_salts}"
        )
    terms = sorted({t for ts in qterms.values() for t in ts})
    idx = {t: i for i, t in enumerate(terms)}

    toks = F.col(tokens_col) if tokens_col else _house_tokens(F.col(text_col))

    def _tf(term: str):
        return F.size(F.filter(toks, lambda x: x == F.lit(term)))

    per_doc = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).cast("long").alias("dl"),
        *[_tf(t).cast("long").alias(f"tf_{i}") for i, t in enumerate(terms)],
    )
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(terms))
        ],
    )
    scored = per_doc.join(F.broadcast(stats))

    n = F.col("n_docs").cast("double")

    def _score(ts: list[str]):
        s = F.lit(0.0)
        for t in ts:  # sorted within the query — same order as bm25_topk
            i = idx[t]
            tf = F.col(f"tf_{i}").cast("double")
            df = F.col(f"df_{i}").cast("double")
            idf = F.log((n - df + F.lit(0.5)) / (df + F.lit(0.5)) + F.lit(1.0))
            denom = tf + F.lit(k1) * (
                F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl")
            )
            s = s + idf * tf * F.lit(k1 + 1.0) / denom
        return s

    def _matches(ts: list[str]):
        return (
            sum((F.col(f"tf_{idx[t]}") > 0).cast("int") for t in ts) > 0
        )

    entries = F.array(
        *[
            F.struct(
                F.lit(q).alias("query"),
                F.round(_score(ts), 6).alias("score"),
                _matches(ts).alias("m"),
            )
            for q, ts in qterms.items()
        ]
    )
    from pyspark.sql import Window

    exploded = (
        scored.select("doc_id", F.explode(entries).alias("e"))
        .where(F.col("e.m"))
        .select("doc_id", F.col("e.query").alias("query"),
                F.col("e.score").alias("score"))
    )
    # Partial top-k on (query, salt): a hot query's match set spreads
    # over partial_topk_salts reducers; each group's k best is a
    # superset of that group's contribution to the global top-k, so
    # the final per-query window sees ≤ k·salts rows per query and the
    # result is unchanged.
    salt = F.pmod(F.xxhash64("doc_id"), F.lit(partial_topk_salts))
    wp = Window.partitionBy("query", "_salt").orderBy(
        F.col("score").desc(), F.col("doc_id")
    )
    partial = (
        exploded.withColumn("_salt", salt)
        .withColumn("_prn", F.row_number().over(wp))
        .where(F.col("_prn") <= k)
    )
    w = Window.partitionBy("query").orderBy(
        F.col("score").desc(), F.col("doc_id")
    )
    return (
        partial.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .select("query", "doc_id", "score")
        .orderBy("query", F.col("score").desc(), "doc_id")
    )


def rrf_fuse(
    rankings: list[DataFrame],
    *,
    id_col: str = "doc_id",
    score_col: str = "score",
    rrf_k: int = 60,
    k: int = 10,
    max_list_rows: int = 100_000,
) -> DataFrame:
    """Reciprocal-rank fusion of top-k lists (Cormack et al. 2009, the
    standard hybrid-retrieval combiner): each input ranking contributes
    ``1 / (rrf_k + rank)`` per doc, summed across lists — fusing e.g. a
    BM25 list with an ANN cosine list without score calibration.
    Returns (id_col, rrf_score, n_lists) top-``k`` by fused score,
    ties broken by ascending id.

    ``rrf_score`` is UNROUNDED (r11 float audit): each contribution is
    a single IEEE division of exact integers (bit-identical on every
    engine) and for the common two-list fusion the sum is order-free
    (float addition is commutative), so the fused score is bit-exact
    cross-engine — whereas ``round(sum, 6)`` was the half-boundary
    hazard (1/64 alone is a terminating binary fraction). With ≥3
    lists the groupBy sum order can shift the last ULP; hash-checked
    pipelines should fuse two lists per row (the driver row does).

    CONTRACT: the inputs are TOP-K LISTS (each df has ≤ thousands of
    rows — the output of :func:`bm25_topk` / simsearch's top-k, never a
    corpus). Ranks are assigned with a single-partition window, which
    is exactly right at that size and would be wrong on a corpus —
    fuse after retrieval, not instead of it; ``max_list_rows`` makes
    that contract fail loudly instead of degrading. r12 (per the r11
    advice): the guard is LAZY and in-plan — the old eager
    ``limit(n+1).count()`` probe executed each ranking's full upstream
    plan twice (probe + fused plan), doubling e.g. the hybrid row's
    BM25 corpus scan and brute-cosine scan. Now each input is bounded
    by ``limit(max_list_rows + 1)`` (capping the single-partition
    window's worst case) and an ``assert_true`` on the assigned rank
    is folded into the contribution expression: a list exceeding the
    cap raises at EXECUTION with this message instead of at call time,
    and the operator stays a pure lazy plan — every upstream scan runs
    exactly once. Rank order within a list is (score desc, id asc),
    matching every ranked query in the engine."""
    from pyspark.sql import Window

    if not rankings:
        raise ValueError("need at least one ranking")
    if k <= 0 or rrf_k <= 0:
        raise ValueError(f"k and rrf_k must be positive, got k={k} rrf_k={rrf_k}")
    if max_list_rows < 1:
        raise ValueError(f"max_list_rows must be >= 1, got {max_list_rows}")
    w = Window.orderBy(F.col(score_col).desc(), F.col(id_col))
    parts = []
    for i, df in enumerate(rankings):
        rn = F.row_number().over(w)
        # assert_true returns NULL when the predicate holds (→ +0.0
        # below) and raises at execution when it doesn't; adding it
        # into the contribution keeps it un-prunable by the optimizer.
        guard = F.assert_true(
            rn <= F.lit(max_list_rows),
            F.lit(
                f"rankings[{i}] has > {max_list_rows} rows — rrf_fuse "
                f"fuses TOP-K LISTS, not corpora (raise max_list_rows "
                f"only if you know the single-partition window is fine)"
            ),
        )
        contrib = (
            F.lit(1.0) / (F.lit(rrf_k) + rn).cast("double")
        ) + F.coalesce(guard.cast("double"), F.lit(0.0))
        parts.append(
            df.limit(max_list_rows + 1).select(
                F.col(id_col), contrib.alias("_contrib")
            )
        )
    allp = parts[0]
    for p in parts[1:]:
        allp = allp.unionByName(p)
    return (
        allp.groupBy(id_col)
        .agg(
            F.sum("_contrib").alias("rrf_score"),
            F.count(F.lit(1)).cast("long").alias("n_lists"),
        )
        .orderBy(F.col("rrf_score").desc(), F.col(id_col))
        .limit(k)
    )


def bm25_reference(docs: list[tuple], query_terms: list[str], *, k1=1.2, b=0.75):
    """Pure-Python BM25 for property tests: ``docs`` is
    [(doc_id, [tokens])]; returns {doc_id: score} over matching docs
    (unrounded). Deliberately independent of the Spark expression."""
    n = len(docs)
    avgdl = sum(len(t) for _, t in docs) / n if n else 0.0
    df = {
        t: sum(1 for _, toks in docs if t in toks) for t in query_terms
    }
    out = {}
    for doc_id, toks in docs:
        s = 0.0
        for t in query_terms:
            tf = toks.count(t)
            if tf == 0:
                continue
            idf = math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
            s += idf * tf * (k1 + 1.0) / (
                tf + k1 * (1.0 - b + b * len(toks) / avgdl)
            )
        if s > 0:
            out[doc_id] = s
    return out
