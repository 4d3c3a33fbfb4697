"""Property-based invariants (SURVEY §5 item 4) over hypothesis-generated
micro-tables. Examples are kept small and few — each property runs a
handful of real Spark jobs, not hundreds.

Invariants:
  * bucketing partitions rows: Σ density over buckets == row count;
  * top-decile flag rate per key ≈ 10% (ties may widen, never exceed 50%);
  * co-occurrence: Σ edge weights == Σ C(n_i, 2) over per-row distinct
    entity counts; edges are canonically ordered (src < dst);
  * pairwise Jaccard is symmetric in construction (id_a < id_b, no dupes)
    and bounded in (0, 1].
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from bigdataproject_spark.functions.entities import pair_combinations_expr
from bigdataproject_spark.operators.energy import bucket_energy, bucket_media_time, flag_top_pct

_SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    times=st.lists(
        st.floats(min_value=0, max_value=500, allow_nan=False), min_size=1, max_size=80
    )
)
@settings(**_SETTINGS)
def test_bucketing_partitions_rows(spark, times):
    df = spark.createDataFrame([(t,) for t in times], "t double")
    agg = bucket_energy(
        df.withColumn("k", F.lit("x")),
        key="k",
        bucket=bucket_media_time("t"),
        weight=F.lit(1.0),
    )
    total = agg.agg(F.sum("density")).first()[0]
    assert total == len(times)
    # buckets are aligned to the window and non-negative
    assert all(r.bucket % 10 == 0 and r.bucket >= 0 for r in agg.collect())


@given(
    energies=st.lists(
        st.floats(min_value=0, max_value=1e6, allow_nan=False),
        min_size=2,
        max_size=60,
        unique=True,
    )
)
@settings(**_SETTINGS)
def test_flag_rate_bounded(spark, energies):
    df = spark.createDataFrame(
        [("k", float(e)) for e in energies], "key string, energy double"
    )
    flagged = flag_top_pct(df, key="key", order="energy", pct=0.9)
    rows = flagged.collect()
    n_high = sum(r.is_high for r in rows)
    n = len(rows)
    # unique energies: percent_rank >= 0.9 flags ceil(0.1*(n-1)) of n rows
    assert 1 <= n_high <= max(1, n // 2)
    # the flagged rows are exactly the largest energies
    cut = sorted(energies)[-n_high]
    assert all((r.energy >= cut) == r.is_high for r in rows)


@given(
    rows=st.lists(
        st.lists(st.sampled_from("abcdefg"), min_size=0, max_size=6),
        min_size=1,
        max_size=40,
    )
)
@settings(**_SETTINGS)
def test_cooccurrence_pair_count(spark, rows):
    df = spark.createDataFrame([(list(set(r)),) for r in rows], "entities array<string>")
    pairs = df.select(F.explode(pair_combinations_expr("entities")).alias("p"))
    total_pairs = pairs.count()
    expected = sum(len(set(r)) * (len(set(r)) - 1) // 2 for r in rows)
    assert total_pairs == expected
    # canonical ordering src < dst holds for every emitted pair
    bad = pairs.filter(F.col("p.src") >= F.col("p.dst")).count()
    assert bad == 0


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["w%d" % i for i in range(12)]), min_size=3, max_size=10
        ),
        min_size=2,
        max_size=12,
    )
)
@settings(**_SETTINGS)
def test_jaccard_pairs_bounds_and_dedup(spark, docs):
    from bigdataproject_spark.operators.dedup import jaccard_pairs

    df = spark.createDataFrame(
        [(i, list(dict.fromkeys(d))) for i, d in enumerate(docs)],
        "id int, sh array<string>",
    )
    out = jaccard_pairs(df, id_col="id", shingles_col="sh", threshold=0.0).collect()
    seen = set()
    for r in out:
        assert r.id_a < r.id_b
        assert (r.id_a, r.id_b) not in seen
        seen.add((r.id_a, r.id_b))
        assert 0.0 < r.jaccard <= 1.0


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "dd", "eee"]), min_size=0, max_size=30
        ),
        min_size=1,
        max_size=8,
    )
)
@settings(**_SETTINGS)
def test_repetition_feature_bounds(spark, docs):
    """Repetition signals are ratios: dup_token_ratio ∈ [0, 1),
    top_bigram_ratio ∈ [0, 1]; all-equal tokens maximize both; a doc of
    all-distinct tokens zeroes dup_token_ratio."""
    from bigdataproject_spark.operators.textstats import repetition_features

    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "i long, tokens array<string>"
    )
    reps = repetition_features("tokens")
    rows = df.select(
        "i",
        F.size("tokens").alias("n"),
        F.size(F.array_distinct("tokens")).alias("nd"),
        reps["dup_token_ratio"].alias("dup"),
        reps["top_bigram_ratio"].alias("top"),
    ).collect()
    for r in rows:
        assert 0.0 <= r.dup < 1.0 or (r.n == 0 and r.dup == 0.0)
        assert 0.0 <= r.top <= 1.0
        if r.n > 0 and r.nd == r.n:
            assert r.dup == 0.0
        if r.n >= 2 and r.nd == 1:
            assert r.top == 1.0


@given(
    train=st.lists(
        st.lists(st.integers(min_value=0, max_value=50), min_size=0, max_size=12),
        min_size=1,
        max_size=6,
    ),
    ev=st.lists(st.integers(min_value=0, max_value=50), min_size=0, max_size=20),
)
@settings(**_SETTINGS)
def test_contamination_matches_set_arithmetic(spark, train, ev):
    """n_hit == |grams ∩ eval_set| per doc; rate bounded [0,1]; every
    train row appears exactly once in the output."""
    from bigdataproject_spark.operators.decontam import ngram_contamination

    tdf = spark.createDataFrame(
        [(i, sorted(set(g))) for i, g in enumerate(train)],
        "id long, grams array<bigint>",
    )
    edf = spark.createDataFrame([(0, sorted(set(ev)))], "id long, grams array<bigint>")
    out = {
        r["id"]: r
        for r in ngram_contamination(
            tdf, edf, id_col="id", grams_col="grams"
        ).collect()
    }
    assert set(out) == set(range(len(train)))
    eset = set(ev)
    for i, g in enumerate(train):
        gs = set(g)
        r = out[i]
        assert r["n_grams"] == len(gs)
        assert r["n_hit"] == len(gs & eset)
        assert 0.0 <= r["contamination"] <= 1.0


@given(
    n=st.integers(min_value=0, max_value=300),
    chunk=st.integers(min_value=1, max_value=40),
    data=st.data(),
)
@settings(**_SETTINGS)
def test_chunking_coverage_property(spark, n, chunk, data):
    """For ANY (n, chunk_tokens, overlap): chunks are token-aligned,
    ≤ chunk_tokens long, consecutive chunks repeat exactly `overlap`
    tokens, and stripping the repeats reconstructs the document."""
    from bigdataproject_spark.operators.chunking import chunk_documents

    overlap = data.draw(st.integers(min_value=0, max_value=chunk - 1))
    toks = [f"t{i}" for i in range(n)]
    df = spark.createDataFrame([(1, toks)], "doc_id long, tokens array<string>")
    rows = sorted(
        chunk_documents(df, chunk_tokens=chunk, overlap=overlap).collect(),
        key=lambda r: r["chunk_id"],
    )
    assert rows[0]["n_chunks"] == len(rows)
    rebuilt: list[str] = []
    for r in rows:
        parts = r["chunk_text"].split(" ") if r["chunk_text"] else []
        assert len(parts) == r["n_tokens"] <= chunk
        rebuilt.extend(parts if not rebuilt else parts[overlap:])
    assert rebuilt == toks


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["banner", "footer", "body one", "body two", "x", "  "]),
            min_size=0, max_size=6,
        ),
        min_size=1, max_size=8,
    ),
    keep_first=st.booleans(),
)
@settings(**_SETTINGS)
def test_linededup_invariants(spark, docs, keep_first):
    """Line dedup: kept lines are a subsequence of the input; lines
    below min_count survive everywhere; blank lines always survive;
    keep_first keeps exactly one occurrence of each hot line."""
    from collections import Counter

    from bigdataproject_spark.operators.linededup import dedup_lines

    rows = [(i, "\n".join(lines)) for i, lines in enumerate(docs)]
    out = {
        r["doc_id"]: r["text"]
        for r in dedup_lines(
            spark.createDataFrame(rows, "doc_id long, text string"),
            keep_first=keep_first,
        ).collect()
    }
    norm = lambda ln: ln.strip().lower()  # noqa: E731
    counts = Counter(
        norm(ln) for _, t in rows for ln in t.split("\n") if ln.strip()
    )
    kept_hot = Counter()
    for i, t in rows:
        if t == "":  # empty doc: rebuilt empty, no line accounting
            assert out[i] == ""
            continue
        inp = t.split("\n")
        got = out[i].split("\n") if out[i] else []
        # subsequence of the input lines, original text preserved
        it = iter(inp)
        assert all(any(ln == cand for cand in it) for ln in got)
        dropped = Counter(inp)
        for ln in got:
            dropped[ln] -= 1
        for ln, n in dropped.items():
            if n > 0:
                # only hot (count >= 2), non-blank lines may be dropped
                assert ln.strip() and counts[norm(ln)] >= 2
        kept_hot.update(
            norm(ln) for ln in got if ln.strip() and counts[norm(ln)] >= 2
        )
    if keep_first:
        hot = {k for k, n in counts.items() if n >= 2}
        assert all(kept_hot[k] == 1 for k in hot)
    else:
        assert not kept_hot


@given(
    tokens=st.lists(st.integers(min_value=0, max_value=40), min_size=1, max_size=30),
    target=st.integers(min_value=5, max_value=60),
)
@settings(**_SETTINGS)
def test_packing_invariants(spark, tokens, target):
    """Packing: every chunk assigned exactly once; pack ids start at 0
    and are nondecreasing along the order; every pack except the last
    would overflow if it also took the next pack's first chunk."""
    from bigdataproject_spark.operators.packing import pack_sequences

    rows = [(0, i, n) for i, n in enumerate(tokens)]
    out = sorted(
        (
            (r["chunk_id"], r["pack_id"], r["n_tokens"])
            for r in pack_sequences(
                spark.createDataFrame(rows, "shard int, chunk_id int, n_tokens int"),
                shard_col="shard", order_cols=["chunk_id"],
                target_tokens=target,
            ).collect()
        )
    )
    assert len(out) == len(tokens)
    packs = [p for _, p, _ in out]
    assert packs[0] == 0
    # dense, nondecreasing ids: no gaps even when a chunk > target
    assert all(b - a in (0, 1) for a, b in zip(packs, packs[1:]))
    # next-fit bound: every pack's total stays under target + max chunk
    totals: dict[int, int] = {}
    for _, p, n in out:
        totals[p] = totals.get(p, 0) + n
    assert all(t < target + max(tokens) for t in totals.values())


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "d", "e"]), min_size=0, max_size=14
        ),
        min_size=1,
        max_size=10,
    ),
    k=st.integers(min_value=1, max_value=4),
)
@settings(**_SETTINGS)
def test_span_dedup_matches_bruteforce(spark, docs, k):
    """Span dedup ≡ a pure-Python brute force on tiny random corpora:
    same maximal spans (duplicated k-gram starts merged over overlap
    AND adjacency), same cleaned text, and conservation of tokens —
    small vocab maximizes collisions, so internal repeats, cross-doc
    shares and island merges all occur."""
    from bigdataproject_spark.operators.spandedup import (
        remove_duplicate_spans,
        span_dedup_stats,
    )

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    # brute force: split exactly like the engine (split('', ' ') == [''])
    toks_by_doc = {i: t.split(" ") for i, t in rows}
    from collections import Counter

    counts = Counter(
        " ".join(t[s : s + k])
        for t in toks_by_doc.values()
        if len(t) >= k
        for s in range(len(t) - k + 1)
    )
    spans_by_doc = {}
    for i, t in toks_by_doc.items():
        starts = [
            s
            for s in range(len(t) - k + 1)
            if len(t) >= k and counts[" ".join(t[s : s + k])] >= 2
        ]
        merged = []
        for s in starts:
            if merged and s <= merged[-1][1]:  # overlap or adjacency
                merged[-1] = (merged[-1][0], max(merged[-1][1], s + k))
            else:
                merged.append((s, s + k))
        if merged:
            spans_by_doc[i] = merged

    stats = {
        r.doc_id: r
        for r in span_dedup_stats(
            df, id_col="doc_id", text_col="text", k=k
        ).collect()
    }
    clean = {
        r.doc_id: r.clean_text
        for r in remove_duplicate_spans(
            df, id_col="doc_id", text_col="text", k=k
        ).collect()
    }
    assert set(stats) == set(toks_by_doc)
    for i, t in toks_by_doc.items():
        want = spans_by_doc.get(i, [])
        dup = sum(e - s for s, e in want)
        assert stats[i].n_dup_spans == len(want), (i, k, rows)
        assert stats[i].dup_tokens == dup, (i, k, rows)
        assert stats[i].total_tokens == len(t)
        cut = set()
        for s, e in want:
            cut.update(range(s, e))
        want_clean = " ".join(tok for j, tok in enumerate(t) if j not in cut)
        assert clean[i] == want_clean, (i, k, rows)


@given(
    rows=st.lists(
        st.lists(st.sampled_from("abcdefg"), min_size=0, max_size=6),
        min_size=1,
        max_size=30,
    )
)
@settings(**_SETTINGS)
def test_edge_generators_agree(spark, rows):
    """r12: graph_edges switched pair generation from the higher-order
    pair_combinations_expr array build to a double-explode codegen
    pipeline (6.3x CPU at sf100). On DISTINCT entity sets (the
    extraction contract) the two generators are row-identical; on RAW
    possibly-duplicate input the operator applies array_distinct first
    (the expression would emit meaningless self-pairs per duplicate),
    so the pinned law is: operator(raw) == expr(distinct(raw)). Both
    halves are asserted — the raw rows feed the operator, their
    distinct projections feed the expression."""
    from bigdataproject_spark.operators.graph import graph_edges

    raw = spark.createDataFrame(
        [(r,) for r in rows], "entities array<string>"
    )
    distinct = spark.createDataFrame(
        [(list(set(r)),) for r in rows], "entities array<string>"
    )
    via_expr = sorted(
        map(
            tuple,
            distinct.select(
                F.explode(pair_combinations_expr("entities")).alias("p")
            )
            .select("p.src", "p.dst")
            .groupBy("src", "dst")
            .count()
            .collect(),
        )
    )
    for src_df in (raw, distinct):
        via_operator = sorted(
            map(
                tuple,
                graph_edges(src_df)
                .select("Source", "Target", "Weight")
                .collect(),
            )
        )
        assert via_operator == via_expr
