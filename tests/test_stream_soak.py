"""Stream SOAK proofs for the bounded-maintenance-debt claims
(VERDICT r7 item 4): the per-fold unit tests argue that in-stream
auto-compaction bounds the maintained indexes' debt; these tests prove
it END-TO-END by driving O(40) micro-batches through the foreachBatch
writers and asserting — at EVERY batch, not just the end — that

* the data tables' part-file counts stay under a cap that is a function
  of the compaction POLICY only (never of how many batches have run —
  that independence IS the boundedness statement),
* the IVF stats ledger stays folded (file count and ROW count capped by
  policy, r7 marker pruning included),
* the versioned layout's generation GC keeps at most two generations of
  any table on disk (current + the one-cycle reader grace copy),
* the r7 localCheckpoint release plumbing leaks ZERO block-manager
  entries over the whole soak,

and that the final state is still CORRECT: the IVF drift report's
totals are exact and a full search equals a from-scratch rebuild over
the union; the dedup index's membership and survivor ledger equal the
expected sets.

The writers are driven directly (the established pattern of
tests/test_streaming_index.py's replay tests) — foreachBatch calls the
same function with the same (batch_df, batch_id) contract, and a real
file-source query at 40 micro-batches would spend its wall-clock in
trigger bookkeeping, not in the code under test.
"""

from __future__ import annotations

import pytest

import glob

from pyspark.sql import functions as F

from bigdataproject_spark.operators.dedup import hashed_word_shingles
from bigdataproject_spark.operators.simsearch import (
    ivf_index_drift,
    ivf_topk_indexed,
    ivf_write_index_from_centroids,
    sample_centroids,
)
from bigdataproject_spark.operators.versioned import table_read_dir
from bigdataproject_spark.sources.readers import load_table
from bigdataproject_spark.streaming.index_stream import make_index_batch_writer
from bigdataproject_spark.streaming.ivf_stream import make_ivf_batch_writer


def _n_persistent_rdds(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def _n_files(path: str, pattern: str = "**/*.parquet") -> int:
    return len(glob.glob(f"{path}/{pattern}", recursive=True))


def _n_generations(idx: str, table: str) -> int:
    """On-disk generation count for one logical table: versioned dirs
    plus the legacy flat dir if it still exists (the grace copy after
    the first compaction)."""
    return len(glob.glob(f"{idx}/{table}-v[0-9]*")) + len(
        glob.glob(f"{idx}/{table}")
    )


@pytest.mark.slow
def test_ivf_stream_soak_bounded_debt(spark, sf_dir, tmp_path):
    N_BATCHES = 40
    COMPACT_EVERY = 4
    N_CENTROIDS = 8
    FILES_PER_APPEND_CELL = 4  # simsearch._IVF_FILES_PER_CELL

    emb = load_table(spark, sf_dir, "embeddings")
    seed = emb.filter(F.col("vec_id") % 3 == 0)
    rest = emb.filter(F.col("vec_id") % 3 != 0)
    queries = emb.filter(F.col("vec_id") % 13 == 0)
    ctrs = sample_centroids(
        seed, id_col="vec_id", vec_col="embedding", n_centroids=N_CENTROIDS
    )
    idx = str(tmp_path / "idx")
    ivf_write_index_from_centroids(
        seed, idx, ctrs, id_col="vec_id", vec_col="embedding"
    )

    # policy-derived caps, INDEPENDENT of N_BATCHES: after a compaction
    # the cells table is <= files_per_cell (1 at this size) per cell,
    # and each of the <= COMPACT_EVERY-1 appends since then adds at most
    # FILES_PER_APPEND_CELL files per touched cell. The ledger between
    # folds holds the <=3 folded rows plus one row (one file) per
    # append since the fold.
    CELLS_CAP = N_CENTROIDS * (1 + COMPACT_EVERY * FILES_PER_APPEND_CELL)
    STATS_ROWS_CAP = 3 + COMPACT_EVERY
    STATS_FILES_CAP = 1 + COMPACT_EVERY

    rdds_before = _n_persistent_rdds(spark)
    reports = {}
    writer = make_ivf_batch_writer(
        idx,
        id_col="vec_id",
        vec_col="embedding",
        compact_every_n_batches=COMPACT_EVERY,
        on_report=lambda bid, rep: reports.__setitem__(bid, rep),
        lease_owner="ivf-soak",
    )
    appended = 0
    for b in range(N_BATCHES):
        batch = rest.filter(F.col("vec_id") % N_BATCHES == b)
        writer(batch, b)
        appended += batch.count()
        # bounded THROUGHOUT: every cap holds at every batch boundary
        cells_dir = table_read_dir(spark, idx, "cells")
        stats_dir = table_read_dir(spark, idx, "stats")
        assert _n_files(cells_dir) <= CELLS_CAP, b
        assert _n_files(stats_dir, "*.parquet") <= STATS_FILES_CAP, b
        assert spark.read.parquet(stats_dir).count() <= STATS_ROWS_CAP, b
        assert _n_generations(idx, "cells") <= 2, b
        assert _n_generations(idx, "stats") <= 2, b

    assert sorted(reports) == list(range(N_BATCHES))
    assert sum(r["n_appended"] for r in reports.values()) == appended

    # drift totals exact after ~10 ledger folds + marker prunes
    drift = ivf_index_drift(spark, idx)
    assert drift["n_indexed_at_build"] == seed.count()
    assert drift["n_appended_total"] == appended == rest.count()

    # r9 cadence fields under soak: N_BATCHES/COMPACT_EVERY compactions
    # ran, each one publish per table — the generation integer equals
    # that count exactly (no crashes in this soak, so the upper bound
    # is tight), and the pointer age is a sane recent wall-clock number
    # the grace-window alarm can consume.
    assert drift["generation"] == N_BATCHES // COMPACT_EVERY
    assert drift["publish_count"] == drift["generation"]
    assert 0.0 <= drift["last_publish_age_seconds"] < 3600.0

    # zero leaked localCheckpoint blocks across the whole soak (<=,
    # not ==: in a shared session an EARLIER test's lingering block can
    # be garbage-collected mid-soak, dropping the absolute count — the
    # soak's own claim is only that it adds nothing)
    assert _n_persistent_rdds(spark) <= rdds_before

    # final correctness: search equals a from-scratch rebuild over the
    # union, partial and full probe
    full = str(tmp_path / "full")
    ivf_write_index_from_centroids(
        seed.unionByName(rest), full, ctrs, id_col="vec_id", vec_col="embedding"
    )

    def _search(p, n_probe):
        return [
            (r.q_id, r.rank, r.neighbor_id, r.cosine)
            for r in ivf_topk_indexed(
                spark, p, queries, id_col="vec_id", vec_col="embedding",
                k=5, n_probe=n_probe,
            ).collect()
        ]

    for n_probe in (2, N_CENTROIDS):
        assert _search(idx, n_probe) == _search(full, n_probe), n_probe


def _soak_docs(spark, batch: int, n_docs: int = 3, dup_of_first: bool = False):
    """n_docs unique documents for one micro-batch (distinct synthetic
    vocabulary per (batch, doc) so nothing collides across the soak);
    ``dup_of_first`` swaps doc 0 in for a re-crawled copy of the very
    first document (same id, same text — the cross-batch already-stored
    path)."""
    rows = []
    for j in range(n_docs):
        b, dj = (0, 0) if (dup_of_first and j == 0) else (batch, j)
        text = f"document {b} {dj} " + " ".join(
            f"w{b}x{dj}x{k}" for k in range(30)
        )
        rows.append((100 * b + dj, text))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    tokens = F.filter(
        F.split(F.lower("text"), r"[^a-z0-9]+"), lambda x: x != ""
    )
    return df.withColumn("shingles", hashed_word_shingles(tokens, 3))


@pytest.mark.slow
def test_dedup_index_stream_soak_bounded_debt(spark, tmp_path):
    N_BATCHES = 30
    COMPACT_EVERY = 5
    # after a compaction each table is ~1 file; each append since adds
    # at most spark.sql.shuffle.partitions (4 in tests) part files.
    FILES_CAP = 1 + COMPACT_EVERY * 4

    idx, out = str(tmp_path / "idx"), str(tmp_path / "out")
    rdds_before = _n_persistent_rdds(spark)
    writer = make_index_batch_writer(
        idx, out, id_col="doc_id", shingles_col="shingles",
        threshold=0.8, compact_every_n_batches=COMPACT_EVERY,
        lease_owner="dedup-soak",
    )
    expected_ids: set[int] = set()
    for b in range(N_BATCHES):
        dup = b > 0 and b % 7 == 0  # every 7th batch re-crawls doc 0
        writer(_soak_docs(spark, b, dup_of_first=dup), b)
        for j in range(3):
            if not (dup and j == 0):
                expected_ids.add(100 * b + j)
        for table in ("bands", "shingles"):
            d = table_read_dir(spark, idx, table)
            assert _n_files(d, "*.parquet") <= FILES_CAP, (b, table)
            assert _n_generations(idx, table) <= 2, (b, table)

    expected_ids.add(0)  # batch 0's doc 0 itself
    stored = {
        r["id"]
        for r in spark.read.parquet(
            table_read_dir(spark, idx, "shingles")
        ).collect()
    }
    assert stored == expected_ids
    emitted = [
        r["doc_id"] for r in spark.read.parquet(f"{out}/batch=*").collect()
    ]
    assert len(emitted) == len(set(emitted))  # no doc emitted twice
    assert set(emitted) == expected_ids
    assert _n_persistent_rdds(spark) <= rdds_before
