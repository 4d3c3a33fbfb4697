"""IVF ANN: probing all cells must equal brute force exactly; partial
probe trades bounded recall."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdataproject_spark.operators.simsearch import brute_force_topk, ivf_topk
from bigdataproject_spark.sources.readers import load_table


def _topk_sets(rows):
    out = {}
    for r in rows:
        out.setdefault(r.q_id, set()).add(r.neighbor_id)
    return out


def test_full_probe_equals_brute_force(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 3)
    exact = brute_force_topk(emb, q, id_col="vec_id", vec_col="embedding", k=5)
    full = ivf_topk(
        emb, q, id_col="vec_id", vec_col="embedding", k=5,
        n_centroids=8, n_probe=8,
    )
    e = sorted((r.q_id, r.rank, r.neighbor_id, r.cosine) for r in exact.collect())
    f = sorted((r.q_id, r.rank, r.neighbor_id, r.cosine) for r in full.collect())
    assert e == f


def test_partial_probe_recall(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    exact = _topk_sets(
        brute_force_topk(emb, q, id_col="vec_id", vec_col="embedding", k=10).collect()
    )
    approx = _topk_sets(
        ivf_topk(
            emb, q, id_col="vec_id", vec_col="embedding", k=10,
            n_centroids=16, n_probe=6,
        ).collect()
    )
    recalls = [
        len(exact[qid] & approx.get(qid, set())) / len(exact[qid]) for qid in exact
    ]
    # random synthetic embeddings are the worst case for IVF (no cluster
    # structure); still require a meaningful floor
    assert sum(recalls) / len(recalls) >= 0.5


def test_empty_corpus(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    out = ivf_topk(
        emb.limit(0), emb.limit(3), id_col="vec_id", vec_col="embedding", k=5
    )
    assert out.count() == 0
    assert out.columns == ["q_id", "neighbor_id", "cosine", "rank"]


def test_tiny_corpus_clamps_centroids(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    out = ivf_topk(
        emb.filter(F.col("vec_id") < 4), emb.filter(F.col("vec_id") < 2),
        id_col="vec_id", vec_col="embedding", k=5, n_centroids=16, n_probe=4,
    )
    assert out.count() > 0  # k clamped to corpus size instead of throwing


def test_sampleq_full_probe_equals_brute_force(spark, sf_dir):
    """The sample-quantizer IVF (the hash-checked registry variant) must
    also collapse to exact brute force when every cell is probed, and
    its assignment plan must stay map-side (no shuffle of the corpus
    for cell assignment)."""
    from bigdataproject_spark.operators.simsearch import ivf_topk_sampleq

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 3)
    exact = brute_force_topk(emb, q, id_col="vec_id", vec_col="embedding", k=5)
    full = ivf_topk_sampleq(
        emb, q, id_col="vec_id", vec_col="embedding", k=5,
        n_centroids=8, n_probe=8,
    )
    e = sorted((r.q_id, r.rank, r.neighbor_id, r.cosine) for r in exact.collect())
    f = sorted((r.q_id, r.rank, r.neighbor_id, r.cosine) for r in full.collect())
    assert e == f


def test_sampleq_empty_corpus(spark, sf_dir):
    from bigdataproject_spark.operators.simsearch import ivf_topk_sampleq

    emb = load_table(spark, sf_dir, "embeddings")
    out = ivf_topk_sampleq(
        emb.limit(0), emb.limit(3), id_col="vec_id", vec_col="embedding", k=5
    )
    assert out.count() == 0
    assert out.columns == ["q_id", "neighbor_id", "cosine", "rank"]


def test_ivf_indexed_prunes_and_full_probe_is_exact(spark, sf_dir, tmp_path):
    """The materialized IVF layout must (a) scan only probed cells via
    PARTITION pruning — not a post-scan data filter — and (b) reproduce
    exact brute force when every cell is probed."""
    from pyspark.sql import functions as F

    from bigdataproject_spark.operators.simsearch import (
        brute_force_topk,
        ivf_topk_indexed,
        ivf_write_index,
    )
    from bigdataproject_spark.sources.readers import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    idx = str(tmp_path / "ivf_index")
    ivf_write_index(emb, idx, id_col="vec_id", vec_col="embedding", n_centroids=8)

    import os

    cell_dirs = {d for d in os.listdir(f"{idx}/cells") if d.startswith("cell=")}
    assert len(cell_dirs) > 1  # real Hive layout

    narrow = ivf_topk_indexed(
        spark, idx, queries, id_col="vec_id", vec_col="embedding", k=5, n_probe=2
    )
    plan = narrow._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [cell" in plan or "PartitionFilters: [isnotnull(cell" in plan
    # the cell predicate must prune partitions, not filter rows post-scan
    assert "PushedFilters: [In(cell" not in plan

    full = ivf_topk_indexed(
        spark, idx, queries, id_col="vec_id", vec_col="embedding", k=5,
        n_probe=len(cell_dirs),
    )
    brute = brute_force_topk(
        emb, queries, id_col="vec_id", vec_col="embedding", k=5
    )
    a = [(r.q_id, r.rank, r.neighbor_id, r.cosine) for r in full.collect()]
    b = [(r.q_id, r.rank, r.neighbor_id, r.cosine) for r in brute.collect()]
    assert a == b


def test_ivf_write_index_empty_corpus_raises(spark, sf_dir, tmp_path):
    import pytest
    from pyspark.sql import functions as F

    from bigdataproject_spark.operators.simsearch import ivf_write_index
    from bigdataproject_spark.sources.readers import load_table

    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 0)
    with pytest.raises(ValueError, match="empty"):
        ivf_write_index(
            emb, str(tmp_path / "idx"), id_col="vec_id", vec_col="embedding"
        )


def test_ivf_indexed_blas_equals_native(spark, sf_dir, tmp_path):
    """impl='blas' (cogrouped matmul + per-cell partial top-k) must
    return the same ranked neighbors as the native join path, at
    partial AND full probe, with and without self-exclusion."""
    from pyspark.sql import functions as F

    from bigdataproject_spark.operators.simsearch import (
        ivf_topk_indexed,
        ivf_write_index,
    )
    from bigdataproject_spark.sources.readers import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 17 == 0)
    idx = str(tmp_path / "ivf_index")
    ivf_write_index(emb, idx, id_col="vec_id", vec_col="embedding", n_centroids=8)

    for n_probe in (2, 8):
        for excl in (True, False):
            kw = dict(
                id_col="vec_id", vec_col="embedding", k=5,
                n_probe=n_probe, exclude_self=excl,
            )
            a = [
                (r.q_id, r.rank, r.neighbor_id, r.cosine)
                for r in ivf_topk_indexed(spark, idx, queries, **kw).collect()
            ]
            b = [
                (r.q_id, r.rank, r.neighbor_id, r.cosine)
                for r in ivf_topk_indexed(
                    spark, idx, queries, impl="blas", **kw
                ).collect()
            ]
            assert a == b, (n_probe, excl)
