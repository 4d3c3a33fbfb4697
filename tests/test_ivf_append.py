"""Incremental IVF index maintenance (r6): append assigns new vectors
to EXISTING centroids map-side (no refit, no rewrite), search over the
appended index equals search over an index rebuilt with the same
centroids, and the drift metric recommends a rebuild when appended
data leaves the build-time distribution."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdataproject_spark.operators.simsearch import (
    brute_force_topk,
    ivf_append_index,
    ivf_index_drift,
    ivf_topk_indexed,
    ivf_write_index,
    ivf_write_index_from_centroids,
    sample_centroids,
)
from bigdataproject_spark.sources.readers import load_table


def _collected(df):
    return [(r.q_id, r.rank, r.neighbor_id, r.cosine) for r in df.collect()]


@pytest.mark.slow
def test_append_equals_rebuild_with_same_centroids(spark, sf_dir, tmp_path):
    """build(A) + append(B) must search EXACTLY like build(A∪B) when
    both builds share the same centroids — partial and full probe,
    native and blas."""
    emb = load_table(spark, sf_dir, "embeddings")
    a = emb.filter(F.col("vec_id") % 3 != 0)
    b = emb.filter(F.col("vec_id") % 3 == 0)
    queries = emb.filter(F.col("vec_id") % 13 == 0)
    ctrs = sample_centroids(a, id_col="vec_id", vec_col="embedding", n_centroids=8)

    inc = str(tmp_path / "inc")
    ivf_write_index_from_centroids(a, inc, ctrs, id_col="vec_id", vec_col="embedding")
    rep = ivf_append_index(b, inc, id_col="vec_id", vec_col="embedding")
    assert rep["n_appended"] == b.count() > 0

    full = str(tmp_path / "full")
    ivf_write_index_from_centroids(
        emb, full, ctrs, id_col="vec_id", vec_col="embedding"
    )
    for n_probe in (2, 8):
        for impl in ("native", "blas"):
            kw = dict(
                id_col="vec_id", vec_col="embedding", k=5,
                n_probe=n_probe, impl=impl,
            )
            got = _collected(ivf_topk_indexed(spark, inc, queries, **kw))
            want = _collected(ivf_topk_indexed(spark, full, queries, **kw))
            assert got == want, (n_probe, impl)


def test_append_on_kmeans_index_full_probe_exact(spark, sf_dir, tmp_path):
    """Appending onto a KMeans-built index keeps full-probe search
    exactly equal to brute force over the union corpus."""
    emb = load_table(spark, sf_dir, "embeddings")
    a = emb.filter(F.col("vec_id") % 4 != 0)
    b = emb.filter(F.col("vec_id") % 4 == 0)
    queries = emb.filter(F.col("vec_id") % 17 == 0)
    idx = str(tmp_path / "kidx")
    ivf_write_index(a, idx, id_col="vec_id", vec_col="embedding", n_centroids=8)
    ivf_append_index(b, idx, id_col="vec_id", vec_col="embedding")
    got = _collected(
        ivf_topk_indexed(
            spark, idx, queries, id_col="vec_id", vec_col="embedding",
            k=5, n_probe=8,
        )
    )
    want = _collected(
        brute_force_topk(emb, queries, id_col="vec_id", vec_col="embedding", k=5)
    )
    assert got == want


def test_drift_recommends_rebuild_on_distribution_shift(spark, tmp_path):
    base = spark.createDataFrame(
        [(i, [float(i % 5) / 10.0, float(i % 7) / 10.0, 0.0]) for i in range(60)],
        "vec_id bigint, embedding array<double>",
    )
    idx = str(tmp_path / "drift")
    ctrs = sample_centroids(base, id_col="vec_id", vec_col="embedding", n_centroids=4)
    ivf_write_index_from_centroids(base, idx, ctrs, id_col="vec_id", vec_col="embedding")

    # no appends yet: neutral report
    rep0 = ivf_index_drift(spark, idx)
    assert rep0["drift_ratio"] == 1.0 and not rep0["rebuild_recommended"]

    # in-distribution append: no rebuild
    near = spark.createDataFrame(
        [(100 + i, [float(i % 5) / 10.0 + 0.01, float(i % 7) / 10.0, 0.0]) for i in range(20)],
        "vec_id bigint, embedding array<double>",
    )
    rep1 = ivf_append_index(near, idx, id_col="vec_id", vec_col="embedding")
    assert not rep1["rebuild_recommended"]
    assert rep1["batch_mean_d2"] is not None

    # far-away append: drift ratio blows past the threshold
    far = spark.createDataFrame(
        [(200 + i, [50.0 + i, -40.0, 9.0]) for i in range(20)],
        "vec_id bigint, embedding array<double>",
    )
    rep2 = ivf_append_index(far, idx, id_col="vec_id", vec_col="embedding")
    assert rep2["rebuild_recommended"]
    assert rep2["drift_ratio"] > 2.0
    assert rep2["n_appended_total"] == 40


def test_append_backfills_missing_stats(spark, sf_dir, tmp_path):
    """A pre-stats index (or a wiped stats dir) gets its build row
    reconstructed from the current cells table before the first
    append — drift stays meaningful."""
    import shutil

    emb = load_table(spark, sf_dir, "embeddings")
    a = emb.filter(F.col("vec_id") % 2 == 0)
    b = emb.filter(F.col("vec_id") % 2 == 1).limit(10)
    idx = str(tmp_path / "nostats")
    ivf_write_index(a, idx, id_col="vec_id", vec_col="embedding", n_centroids=8)
    shutil.rmtree(f"{idx}/stats")
    rep = ivf_append_index(b, idx, id_col="vec_id", vec_col="embedding")
    assert rep["n_indexed_at_build"] == a.count()
    assert rep["build_mean_d2"] is not None and rep["build_mean_d2"] > 0
    assert rep["n_appended"] == 10


def test_append_empty_batch_is_noop(spark, sf_dir, tmp_path):
    emb = load_table(spark, sf_dir, "embeddings")
    idx = str(tmp_path / "empty")
    ivf_write_index(
        emb.limit(30), idx, id_col="vec_id", vec_col="embedding", n_centroids=4
    )
    before = spark.read.parquet(f"{idx}/cells").count()
    rep = ivf_append_index(
        emb.filter(F.col("vec_id") < 0), idx, id_col="vec_id", vec_col="embedding"
    )
    assert rep["n_appended"] == 0 and rep["batch_mean_d2"] is None
    assert not rep["rebuild_recommended"]
    assert spark.read.parquet(f"{idx}/cells").count() == before
    # no append stats row was recorded
    kinds = [r["kind"] for r in spark.read.parquet(f"{idx}/stats").collect()]
    assert kinds == ["build"]


def test_from_centroids_empty_list_raises(spark, sf_dir, tmp_path):
    emb = load_table(spark, sf_dir, "embeddings")
    with pytest.raises(ValueError, match="empty centroid list"):
        ivf_write_index_from_centroids(
            emb, str(tmp_path / "x"), [], id_col="vec_id", vec_col="embedding"
        )


def test_append_null_vectors_search_as_null_tail(spark, tmp_path):
    """Appended NULL vectors land deterministically (first centroid) and
    surface as null-cosine tail rows in search — never crash the append
    or the scan."""
    base = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(10)],
        "vec_id bigint, embedding array<double>",
    )
    idx = str(tmp_path / "nulls")
    ctrs = sample_centroids(base, id_col="vec_id", vec_col="embedding", n_centroids=2)
    ivf_write_index_from_centroids(base, idx, ctrs, id_col="vec_id", vec_col="embedding")
    extra = spark.createDataFrame(
        [(100, None), (101, [3.0, 1.0])], "vec_id bigint, embedding array<double>"
    )
    rep = ivf_append_index(extra, idx, id_col="vec_id", vec_col="embedding")
    assert rep["n_appended"] == 2
    q = spark.createDataFrame([(1, [1.0, 1.0])], "vec_id bigint, embedding array<double>")
    out = ivf_topk_indexed(
        spark, idx, q, id_col="vec_id", vec_col="embedding", k=20, n_probe=2
    ).collect()
    by_id = {r.neighbor_id: r.cosine for r in out}
    assert 101 in by_id and by_id[101] is not None
    assert 100 in by_id and by_id[100] is None  # null-cosine tail row
