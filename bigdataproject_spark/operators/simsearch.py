"""Similarity search over embedding columns (north-star op, BASELINE.json).

Two paths:
  * :func:`brute_force_topk` — exact cosine top-k: broadcast the (small)
    query set against the corpus, rank per query. The corpus is scanned
    once; per-row work is a JVM higher-order-function dot product. This is
    the correctness baseline and is already the right plan when |queries|
    is small: no shuffle on the corpus at all (broadcast join), and the
    top-k per query is a TakeOrdered-style window with a tiny output.
  * :func:`lsh_bucket_topk` — the scale path: sign-quantize each vector on
    its first ``n_bits`` dimensions (axis-aligned random-hyperplane LSH),
    search only within the query's bucket. Recall < 1 by construction;
    accuracy/latency is tuned by n_bits (and multi-probe at the caller's
    discretion). At 100TB the bucket column becomes the partition key so a
    query touches one partition instead of the full corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from bigdataproject_spark.functions.vectors import cosine_similarity


def sign_bucket(vec: Column | str, n_bits: int = 8) -> Column:
    """LSH bucket id from the sign pattern of the first n_bits dims:
    Σ 2^i·[v_i > 0] — deterministic, SQL-expressible, cheap."""
    v = F.col(vec) if isinstance(vec, str) else vec
    bits = [
        F.when(F.element_at(v, i + 1) > 0, F.lit(1 << i)).otherwise(F.lit(0))
        for i in range(n_bits)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    k: int = 10,
    exclude_self: bool = True,
) -> DataFrame:
    """Exact top-k by cosine: (q_id, neighbor_id, cosine, rank).

    cosine rounded 6dp before ranking; (−cosine, neighbor_id) ordering makes
    ranks deterministic under ties."""
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    q = queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("qv"))
    joined = c.crossJoin(F.broadcast(q))
    if exclude_self:
        joined = joined.filter(F.col("neighbor_id") != F.col("q_id"))
    sim = joined.select(
        "q_id",
        "neighbor_id",
        F.round(cosine_similarity("qv", "cv"), 6).alias("cosine"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("q_id", "rank")
    )


def lsh_bucket_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    k: int = 10,
    n_bits: int = 8,
    exclude_self: bool = True,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's sign bucket.

    Same output shape as :func:`brute_force_topk`; the bucket equi-join
    replaces the cross join, cutting compared pairs by ~2^n_bits."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        sign_bucket(vec_col, n_bits).alias("bkt"),
    )
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("qv"),
        sign_bucket(vec_col, n_bits).alias("bkt"),
    )
    joined = c.join(F.broadcast(q), on="bkt")
    if exclude_self:
        joined = joined.filter(F.col("neighbor_id") != F.col("q_id"))
    sim = joined.select(
        "q_id",
        "neighbor_id",
        F.round(cosine_similarity("qv", "cv"), 6).alias("cosine"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("q_id", "rank")
    )
