"""Reader safety DURING compaction — the r8 versioned layout's core
promise (operators/versioned.py): an external search service (IVF) or
batch probe (dedup index) that reads INSIDE the compaction swap window
never errors and never sees torn state. The windows are hook-injected
by wrapping ``publish_version`` (the pointer flip + GC step, imported
function-locally by both compactors): the hook reads ONCE right before
the flip (next generation complete on disk, pointer still naming the
old one) and once right after (pointer flipped, superseded generations
GC'd to the grace copy) — the two instants the pre-versioned
rename-aside layout could not survive. A third case proves the
one-generation GRACE window: a scan plan resolved BEFORE a compaction
still collects correctly AFTER it (the superseded generation lives
until the NEXT compaction's GC), and the mid-flip pointer-less fallback
resolves to the newest complete generation.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from bigdataproject_spark.operators import versioned
from bigdataproject_spark.operators.dedup import hashed_word_shingles
from bigdataproject_spark.operators.dedup_index import (
    compact_index,
    incremental_minhash_pairs,
    write_minhash_index,
)
from bigdataproject_spark.operators.simsearch import (
    ivf_append_index,
    ivf_compact_index,
    ivf_index_drift,
    ivf_topk_indexed,
    ivf_write_index_from_centroids,
    sample_centroids,
)
from bigdataproject_spark.operators.versioned import table_read_dir
from bigdataproject_spark.sources.readers import load_table


def _hooked_publish(reader_assert, seen):
    """A publish_version wrapper that runs ``reader_assert(table)``
    immediately before AND after the real flip — the two sides of the
    swap window."""
    real = versioned.publish_version

    def hook(spark, path, table, version, prev_live):
        reader_assert(f"pre-flip:{table}")
        real(spark, path, table, version, prev_live)
        reader_assert(f"post-flip:{table}")
        seen.append(table)

    return hook


def test_ivf_search_inside_compaction_swap_never_errors(
    spark, sf_dir, tmp_path, monkeypatch
):
    emb = load_table(spark, sf_dir, "embeddings")
    seed = emb.filter(F.col("vec_id") % 3 == 0)
    delta = emb.filter(F.col("vec_id") % 3 == 1)
    queries = emb.filter(F.col("vec_id") % 13 == 0)
    ctrs = sample_centroids(
        seed, id_col="vec_id", vec_col="embedding", n_centroids=8
    )
    idx = str(tmp_path / "idx")
    ivf_write_index_from_centroids(
        seed, idx, ctrs, id_col="vec_id", vec_col="embedding"
    )
    ivf_append_index(
        delta, idx, id_col="vec_id", vec_col="embedding", guard_ids=True
    )

    def _search():
        return [
            (r.q_id, r.rank, r.neighbor_id, r.cosine)
            for r in ivf_topk_indexed(
                spark, idx, queries, id_col="vec_id", vec_col="embedding",
                k=5, n_probe=8,
            ).collect()
        ]

    expected = _search()
    drift_before = ivf_index_drift(spark, idx)

    def reader_assert(where):
        # the search service's poll — full resolve + scan + rank
        assert _search() == expected, where
        # and the drift monitor's poll (a pure reader since r8)
        d = ivf_index_drift(spark, idx)
        assert d["n_indexed_at_build"] == drift_before["n_indexed_at_build"], where
        assert d["n_appended_total"] == drift_before["n_appended_total"], where

    seen: list[str] = []
    monkeypatch.setattr(
        versioned, "publish_version", _hooked_publish(reader_assert, seen)
    )
    ivf_compact_index(spark, idx)
    assert seen == ["cells", "stats"]  # both swaps actually exercised
    monkeypatch.undo()
    assert _search() == expected


def test_ivf_grace_window_and_pointerless_fallback(
    spark, sf_dir, tmp_path
):
    """A scan resolved BEFORE a compaction collects fine AFTER it (the
    superseded generation survives one cycle); with the pointer file
    deleted (the non-atomic fallback's mid-flip instant) resolution
    falls through to the newest complete generation."""
    emb = load_table(spark, sf_dir, "embeddings")
    seed = emb.filter(F.col("vec_id") % 3 == 0)
    ctrs = sample_centroids(
        seed, id_col="vec_id", vec_col="embedding", n_centroids=8
    )
    idx = str(tmp_path / "idx")
    ivf_write_index_from_centroids(
        seed, idx, ctrs, id_col="vec_id", vec_col="embedding"
    )
    pre_dir = table_read_dir(spark, idx, "cells")
    pre_plan = spark.read.parquet(pre_dir)
    n = pre_plan.count()

    ivf_compact_index(spark, idx)
    assert table_read_dir(spark, idx, "cells") != pre_dir
    assert pre_plan.count() == n  # grace copy still on disk
    assert os.path.isdir(pre_dir)

    # mid-flip fallback: no pointer -> newest complete generation
    os.remove(f"{idx}/cells.version")
    d = table_read_dir(spark, idx, "cells")
    assert glob.glob(f"{d}/_SUCCESS")
    assert spark.read.parquet(d).count() == n
    # a second compaction heals the pointer and GCs the grace copy
    ivf_compact_index(spark, idx)
    assert os.path.isfile(f"{idx}/cells.version")
    assert not os.path.isdir(pre_dir)


def test_dedup_probe_inside_compaction_swap_never_errors(
    spark, tmp_path, monkeypatch
):
    def _docs(rows):
        df = spark.createDataFrame(rows, "doc_id long, text string")
        tokens = F.filter(
            F.split(F.lower("text"), r"[^a-z0-9]+"), lambda x: x != ""
        )
        return df.withColumn("shingles", hashed_word_shingles(tokens, 3))

    base = (
        "the story begins when the old sailor and the young cook set out "
        "to sea because the harbor is empty and the wind is fair for travel"
    )
    stored = _docs(
        [
            (1, base),
            (2, "completely different content about spark query engines "
                "and their adaptive execution of shuffles joins and "
                "aggregates at scale with columnar storage and readers"),
        ]
    )
    probe = _docs(
        [
            (21, base + " tonight"),  # near-dup of stored 1
            (22, "totally novel musings on cartography and the projection "
                 "of coastlines onto flat maps with careful attention to "
                 "distortion near the poles and the equator alike"),
        ]
    )
    idx = str(tmp_path / "idx")
    write_minhash_index(
        stored, idx, id_col="doc_id", shingles_col="shingles"
    )

    def _pairs():
        return sorted(
            (r["id_a"], r["id_b"], r["jaccard"], r["vs_index"])
            for r in incremental_minhash_pairs(
                spark, probe, idx,
                id_col="doc_id", shingles_col="shingles", threshold=0.8,
            ).collect()
        )

    expected = _pairs()
    assert expected  # the probe really finds the stored near-dup

    def reader_assert(where):
        assert _pairs() == expected, where

    seen: list[str] = []
    monkeypatch.setattr(
        versioned, "publish_version", _hooked_publish(reader_assert, seen)
    )
    compact_index(spark, idx)
    assert seen == ["bands", "shingles"]
    monkeypatch.undo()
    assert _pairs() == expected
