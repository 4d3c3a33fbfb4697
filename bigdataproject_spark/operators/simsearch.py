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

from bigdataproject_spark.functions.vectors import cosine_from_norms, l2_norm

# Budget for the query-side probe plan that every search path
# materializes driver-side (the native paths broadcast it; the blas
# paths collect it into per-cell numpy blocks). Same role as
# ``broadcast_max_bytes`` in embedding_neardup_pairs; sized to the
# uncompressed-rows scale a local driver comfortably holds.
_SEARCH_BROADCAST_MAX_BYTES = 256 << 20


# Catalyst reports spark.sql.defaultSizeInBytes (Long.MaxValue by
# default) for leaves it cannot size — LogicalRDD / createDataFrame
# frames, not file scans. Anything at or past this threshold is the
# SENTINEL, not a measurement (a real 100 TB scan is ~1e14, four
# orders of magnitude under it).
_UNKNOWN_STATS_BYTES = 1 << 62


def _measured_query_bytes(q: DataFrame, *, n_probe: int) -> int:
    """count() × max-row-bytes × n_probe — the MEASURED probe budget
    estimate. ONE aggregate job over the query side only (never the
    corpus), with the per-row byte estimate computed as a native
    expression over EVERY row — a head sample would under-estimate a
    table whose leading partition holds short/NULL-vector rows while
    later partitions hold full-width ones, and the guard would still
    admit an over-budget driver block. Used when metadata alone cannot
    size the query batch (see :func:`_query_batch_splits`)."""
    from pyspark.sql.types import ArrayType, StringType

    b = F.lit(32).cast("long")
    for f in q.schema.fields:
        c = F.col(f.name)
        if isinstance(f.dataType, ArrayType):
            term = F.greatest(F.coalesce(F.size(c), F.lit(0)), F.lit(0)) * 8 + 16
        elif isinstance(f.dataType, StringType):
            term = F.coalesce(F.length(c), F.lit(0)) * 2 + 16
        else:
            term = F.lit(8)
        b = b + term.cast("long")
    row = q.agg(
        F.count(F.lit(1)).alias("n"), F.max(b).alias("row_bytes")
    ).collect()[0]
    if not row["n"]:
        return 0
    return row["n"] * row["row_bytes"] * max(n_probe, 1)


def _query_batch_splits(
    q: DataFrame, *, n_probe: int, broadcast_max_bytes: int
) -> int:
    """How many q_id-hash batches a query table must be split into so
    each batch's probe assignment fits the driver-side budget.

    Two-tier estimate. Tier 1 (metadata only, no job): Catalyst
    footer-stats size of the query projection × 4 (footer bytes are
    compressed, broadcast rows are not — the same factor the
    embedding_neardup guard uses, dedup.py _plan_size_bytes) × n_probe
    (the probe plan repeats each query row, vector included, once per
    probed cell). If THAT clears the budget, done — the common case
    pays zero jobs. Tier 2: when metadata says over-budget OR reports
    the unknown-size sentinel (createDataFrame/LogicalRDD frames have
    no Catalyst size), the estimate is MEASURED via
    :func:`_measured_query_bytes` — two tiny jobs over the query side.
    Tier 2 matters for selective filters over big tables: Catalyst's
    Filter keeps its child's sizeInBytes, so a 1% query slice of a
    large embedding table metadata-reads as the whole file and a
    metadata-only guard would split a comfortably-in-budget batch into
    pointless corpus re-scans (measured 3× on the sf10 steady-state
    blas path before this tier existed)."""
    from bigdataproject_spark.operators.dedup import _plan_size_bytes

    if broadcast_max_bytes <= 0:
        raise ValueError("broadcast_max_bytes must be positive")
    size = _plan_size_bytes(q)
    if (
        size < _UNKNOWN_STATS_BYTES
        and size * 4 * max(n_probe, 1) <= broadcast_max_bytes
    ):
        return 1
    est = _measured_query_bytes(q, n_probe=n_probe)
    return max(1, -(-est // broadcast_max_bytes))


def _union_query_batches(parts: list[DataFrame]) -> DataFrame:
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("q_id", "rank")


def _batched_over_queries(
    search_one,
    q: DataFrame,
    *,
    n_probe: int,
    broadcast_max_bytes: int,
) -> DataFrame:
    """The ONE batching orchestration every search entry point shares
    (native broadcast joins and blas collects alike — both materialize
    the query side driver-side): size the query table via
    :func:`_query_batch_splits`, and when over budget, split it into
    q_id-hash batches, run ``search_one`` on each, and union. Exact,
    because per-query results never depend on other queries; each
    batch's cost is a linear re-scan of the corpus — the price of never
    materializing an over-budget driver block."""
    n_splits = _query_batch_splits(
        q, n_probe=n_probe, broadcast_max_bytes=broadcast_max_bytes
    )
    if n_splits == 1:
        return search_one(q)
    parts = [
        search_one(
            q.filter(F.pmod(F.xxhash64("q_id"), F.lit(n_splits)) == i)
        )
        for i in range(n_splits)
    ]
    return _union_query_batches(parts)


def _rank_topk(joined: DataFrame, k: int) -> DataFrame:
    """Shared native ranking tail: 6dp-rounded cosine, deterministic
    (cosine desc, neighbor_id asc) window, top-k per query."""
    sim = joined.select(
        "q_id",
        "neighbor_id",
        F.round(cosine_from_norms("qv", "cv", "qn", "cn"), 6).alias("cosine"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("q_id", "rank")
    )


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
    impl: str = "native",
    broadcast_max_bytes: int = _SEARCH_BROADCAST_MAX_BYTES,
) -> DataFrame:
    """Exact top-k by cosine: (q_id, neighbor_id, cosine, rank).

    cosine rounded 6dp before ranking; (−cosine, neighbor_id) ordering makes
    ranks deterministic under ties. Norms are hoisted per-row (linear) out
    of the per-pair expression (quadratic, bit-identical — see
    functions.vectors.cosine_from_norms).

    ``impl='blas'``: same exact result through the corpus-in-place
    numpy matmul (query block collected + broadcast — bounded by the
    same budget as the native path's broadcast join — and a
    mapInPandas partial top-k over the corpus scan; see
    :func:`ivf_topk_indexed`); the interpreted per-pair cosine is the
    cost center once |queries| × |corpus| reaches millions of pairs."""
    if impl not in ("native", "blas"):
        raise ValueError(f"brute_force_topk: unknown impl {impl!r}")
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        l2_norm(vec_col).alias("cn"),
    )
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("qv"),
        l2_norm(vec_col).alias("qn"),
    )
    if impl == "blas":
        return _blas_query_batched(
            c.withColumn("cell", F.lit(0)),
            q.withColumn("cell", F.lit(0)),
            k=k,
            exclude_self=exclude_self,
            broadcast_max_bytes=broadcast_max_bytes,
        )

    # The pinned F.broadcast(q) materializes the query table driver-side
    # exactly like the blas collect does — same budget, same batching.
    def _one(qb: DataFrame) -> DataFrame:
        joined = c.crossJoin(F.broadcast(qb))
        if exclude_self:
            joined = joined.filter(F.col("neighbor_id") != F.col("q_id"))
        return _rank_topk(joined, k)

    return _batched_over_queries(
        _one, q, n_probe=1, broadcast_max_bytes=broadcast_max_bytes
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
    impl: str = "native",
    broadcast_max_bytes: int = _SEARCH_BROADCAST_MAX_BYTES,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's sign bucket.

    Same output shape as :func:`brute_force_topk`; the bucket equi-join
    replaces the cross join, cutting compared pairs by ~2^n_bits.
    ``impl='blas'`` routes through the corpus-in-place matmul with the
    sign bucket as the cell key (see :func:`ivf_topk_indexed`). NULL
    vectors: the native path's bucket expression yields a NULL bucket,
    which joins nothing — the blas path reproduces that by keying bad
    rows under the unmatchable NULL bucket too."""
    if impl not in ("native", "blas"):
        raise ValueError(f"lsh_bucket_topk: unknown impl {impl!r}")
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        l2_norm(vec_col).alias("cn"),
        sign_bucket(vec_col, n_bits).alias("bkt"),
    )
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("qv"),
        l2_norm(vec_col).alias("qn"),
        sign_bucket(vec_col, n_bits).alias("bkt"),
    )
    if impl == "blas":
        return _blas_query_batched(
            c.filter(F.col("bkt").isNotNull()).withColumnRenamed("bkt", "cell"),
            q.filter(F.col("bkt").isNotNull()).withColumnRenamed("bkt", "cell"),
            k=k,
            exclude_self=exclude_self,
            broadcast_max_bytes=broadcast_max_bytes,
        )

    def _one(qb: DataFrame) -> DataFrame:
        joined = c.join(F.broadcast(qb), on="bkt")
        if exclude_self:
            joined = joined.filter(F.col("neighbor_id") != F.col("q_id"))
        return _rank_topk(joined, k)

    return _batched_over_queries(
        _one, q, n_probe=1, broadcast_max_bytes=broadcast_max_bytes
    )


def _fit_quantizer(
    corpus: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    n_centroids: int,
    seed: int,
    max_iter: int,
):
    """Shared IVF quantizer fit (ivf_topk and ivf_write_index must stay
    in lockstep — same featurization, clamping, and seeding). Returns
    (assigned, ctr_df, k_eff) or None for an empty corpus."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    c_feat = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        l2_norm(vec_col).alias("cn"),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"),
    )
    n_rows = c_feat.count()
    if n_rows == 0:
        return None
    k_eff = min(n_centroids, n_rows)
    model = KMeans(
        k=k_eff, seed=seed, maxIter=max_iter, featuresCol="features"
    ).fit(c_feat)
    assigned = model.transform(c_feat).select(
        "neighbor_id", "cv", "cn", F.col("prediction").alias("cell")
    )
    centroids = [
        (i, [float(x) for x in ctr]) for i, ctr in enumerate(model.clusterCenters())
    ]
    ctr_df = corpus.sparkSession.createDataFrame(
        centroids, "cell int, ctr array<double>"
    )
    return assigned, ctr_df, k_eff


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    exclude_self: bool = True,
    seed: int = 42,
    max_iter: int = 8,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: KMeans coarse quantizer +
    multi-probe. ``max_iter=8`` (vs MLlib's default 20): a coarse
    quantizer only partitions space — loose convergence shifts cell
    boundaries, and multi-probe already covers boundary loss, so extra
    Lloyd iterations buy recall nothing measurable while the fit
    dominates the query's wall time.

    Train-once/search-many: the corpus is partitioned into ``n_centroids``
    KMeans cells (pyspark.ml, JVM-side); each query probes only its
    ``n_probe`` nearest cells, so compared pairs shrink by roughly
    n_probe/n_centroids versus brute force while multi-probe recovers most
    boundary-loss recall (the standard IVF trade; raise n_probe for
    recall, n_centroids for speed). The centroid table is tiny and
    broadcast; at 100TB the corpus would additionally be written
    partitioned/bucketed by ``cell`` so a probe prunes file I/O, not just
    the join.
    """
    fitted = _fit_quantizer(
        corpus,
        id_col=id_col,
        vec_col=vec_col,
        n_centroids=n_centroids,
        seed=seed,
        max_iter=max_iter,
    )
    if fitted is None:
        # KMeans cannot fit zero rows; empty corpus → empty result with
        # the output schema
        q0 = queries.select(F.col(id_col).alias("q_id"))
        return q0.limit(0).select(
            "q_id",
            F.lit(None).cast("long").alias("neighbor_id"),
            F.lit(None).cast("double").alias("cosine"),
            F.lit(None).cast("int").alias("rank"),
        )
    assigned, ctr_df, n_centroids = fitted
    return _ivf_search(
        assigned,
        ctr_df,
        queries,
        id_col=id_col,
        vec_col=vec_col,
        k=k,
        n_probe=min(n_probe, n_centroids),
        exclude_self=exclude_self,
    )


def _ivf_search(
    assigned: DataFrame,
    ctr_df: DataFrame,
    queries: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    k: int,
    n_probe: int,
    exclude_self: bool,
) -> DataFrame:
    """Shared IVF search tail: probe the ``n_probe`` nearest cells per
    query (tiny cross join against the broadcast centroid table,
    squared-L2 — the quantizer's metric), then rank by cosine within the
    probed cells. Used by both the KMeans and the sample quantizer."""
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("qv"),
        l2_norm(vec_col).alias("qn"),
    )
    sq_dist = F.aggregate(
        F.zip_with(F.col("qv").cast("array<double>"), "ctr", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    wprobe = Window.partitionBy("q_id").orderBy(F.asc("d2"), F.asc("cell"))
    probes = (
        q.crossJoin(F.broadcast(ctr_df))
        .select("q_id", "qv", "qn", "cell", sq_dist.alias("d2"))
        .withColumn("pr", F.row_number().over(wprobe))
        .filter(F.col("pr") <= n_probe)
        .select("q_id", "qv", "qn", "cell")
    )

    joined = assigned.join(F.broadcast(probes), on="cell")
    if exclude_self:
        joined = joined.filter(F.col("neighbor_id") != F.col("q_id"))
    sim = joined.select(
        "q_id",
        "neighbor_id",
        F.round(cosine_from_norms("qv", "cv", "qn", "cn"), 6).alias("cosine"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("q_id", "rank")
    )


def sample_centroids(
    corpus: DataFrame, *, id_col: str, vec_col: str, n_centroids: int
) -> list[tuple[int, list[float]]]:
    """Deterministic 'sample' coarse quantizer: the centroids are the
    vectors of the ``n_centroids`` smallest ids, cell = rank in that
    order (FLANN-style sampled quantizer with a deterministic sample).
    Unlike a KMeans fit, this is plain SQL given the corpus — so an IVF
    search built on it is cross-engine hash-checkable, and stays correct
    when the underlying data is regenerated. Driver collect bounded by
    ``n_centroids`` rows (the same boundedness as the centroid table the
    KMeans path already materializes via ``clusterCenters()``)."""
    rows = (
        corpus.select(
            F.col(id_col).alias("i"),
            F.col(vec_col).cast("array<double>").alias("v"),
        )
        .orderBy("i")
        .limit(n_centroids)
        .collect()
    )
    return [(cell, list(r["v"])) for cell, r in enumerate(rows)]


def assign_cell_expr(
    vec: Column | str, centroids: list[tuple[int, list[float]]]
) -> Column:
    """Nearest-centroid cell id as ONE map-side expression over a literal
    centroid array — the 100 TB shape for quantizer assignment: a pure
    projection inside the scan stage, no join, no shuffle (mirrors what
    ``KMeansModel.transform`` does JVM-side). Ties on squared-L2 break
    to the smallest cell (strict ``<`` keeps the earliest in the fold).

    Pass a NAMED ``array<double>`` column: the vector is referenced once
    per centroid inside the fold, and a named column is a cheap
    attribute where an inline cast would copy the array per centroid."""
    v = F.col(vec) if isinstance(vec, str) else vec
    ctrs = F.array(
        *[
            F.struct(
                F.lit(cell).alias("cell"),
                F.array(*[F.lit(float(x)) for x in ctr])
                .cast("array<double>")
                .alias("ctr"),
            )
            for cell, ctr in centroids
        ]
    )

    def _d2(c: Column) -> Column:
        return F.aggregate(
            F.zip_with(v, c, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    def _step(acc: Column, s: Column) -> Column:
        nd = _d2(s["ctr"])
        better = acc["cell"] < 0
        better = better | (nd < acc["d2"])
        return F.struct(
            F.when(better, nd).otherwise(acc["d2"]).alias("d2"),
            F.when(better, s["cell"]).otherwise(acc["cell"]).alias("cell"),
        )

    init = F.struct(
        F.lit(None).cast("double").alias("d2"), F.lit(-1).alias("cell")
    )
    return F.aggregate(ctrs, init, _step, lambda acc: acc["cell"])


def ivf_topk_sampleq(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    exclude_self: bool = True,
) -> DataFrame:
    """IVF approximate top-k with the deterministic sample quantizer
    (:func:`sample_centroids`): same multi-probe search mechanics as
    :func:`ivf_topk` (shared ``_ivf_search`` tail), but every stage —
    centroid pick, cell assignment, probe selection, cosine ranking —
    is reproducible in ANSI SQL, which makes this the hash-checkable
    registry variant. Cell assignment is a map-side literal-centroid
    argmin (:func:`assign_cell_expr`), so the corpus is never shuffled
    for the assignment — the same scale shape as KMeans transform."""
    centroids = sample_centroids(
        corpus, id_col=id_col, vec_col=vec_col, n_centroids=n_centroids
    )
    if not centroids:
        q0 = queries.select(F.col(id_col).alias("q_id"))
        return q0.limit(0).select(
            "q_id",
            F.lit(None).cast("long").alias("neighbor_id"),
            F.lit(None).cast("double").alias("cosine"),
            F.lit(None).cast("int").alias("rank"),
        )
    assigned = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        l2_norm(vec_col).alias("cn"),
        F.col(vec_col).cast("array<double>").alias("_vd"),
    ).select(
        "neighbor_id", "cv", "cn", assign_cell_expr("_vd", centroids).alias("cell")
    )
    ctr_df = corpus.sparkSession.createDataFrame(
        centroids, "cell int, ctr array<double>"
    )
    return _ivf_search(
        assigned,
        ctr_df,
        queries,
        id_col=id_col,
        vec_col=vec_col,
        k=k,
        n_probe=min(n_probe, len(centroids)),
        exclude_self=exclude_self,
    )


def ivf_write_index(
    corpus: DataFrame,
    path: str,
    *,
    id_col: str,
    vec_col: str,
    n_centroids: int = 16,
    seed: int = 42,
    max_iter: int = 8,
) -> None:
    """Materialize the IVF index: corpus written Hive-partitioned by cell
    plus a centroid table — the train-once/search-many storage layout
    :func:`ivf_topk` computes in memory (same quantizer fit:
    :func:`_fit_quantizer`).

    At 100 TB this is the shape that matters: a probe then prunes file
    I/O (``PartitionFilters`` on ``cell=``), not just the join, so a
    query reads n_probe/n_centroids of the corpus bytes. Writes
    ``{path}/cells`` (neighbor_id, cv, cn, cell) and
    ``{path}/centroids`` (cell, ctr). Raises on an empty corpus — an
    index of nothing is unreadable parquet, so fail loudly at build
    time instead of at first search."""
    fitted = _fit_quantizer(
        corpus,
        id_col=id_col,
        vec_col=vec_col,
        n_centroids=n_centroids,
        seed=seed,
        max_iter=max_iter,
    )
    if fitted is None:
        raise ValueError("ivf_write_index: corpus is empty; nothing to index")
    assigned, ctr_df, _ = fitted
    assigned.write.mode("overwrite").partitionBy("cell").parquet(f"{path}/cells")
    ctr_df.write.mode("overwrite").parquet(f"{path}/centroids")


def ivf_topk_indexed(
    spark,
    path: str,
    queries: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    k: int = 10,
    n_probe: int = 4,
    exclude_self: bool = True,
    impl: str = "native",
    broadcast_max_bytes: int = _SEARCH_BROADCAST_MAX_BYTES,
) -> DataFrame:
    """IVF search against a :func:`ivf_write_index` layout with PARTITION
    pruning: only the DISTINCT probed cell ids (≤ n_centroids values — a
    bounded driver-side collect by construction, never query- or
    data-sized) are collected, and they become a static ``isin`` filter
    on the partition column, so the scan reads only the probed cells'
    files. The probe assignment itself (q_id, qv, qn, cell) stays a
    distributed plan and reaches the corpus join as a broadcast — so
    the QUERY BATCH must fit the broadcast budget (n_queries × n_probe
    rows incl. vectors; building the broadcast relation materializes it
    driver-side like any broadcast join). That budget is ENFORCED, not
    just documented: the query plan's footer-stats estimate
    (× 4 compressed→uncompressed × n_probe — same arithmetic as the
    embedding_neardup guard) is checked against ``broadcast_max_bytes``
    and an oversized query table is automatically split into q_id-hash
    batches, each searched independently and unioned — exact, because
    per-query results never depend on other queries. Each batch re-runs
    the probe-cell collect and corpus scan; that linear re-scan cost is
    the price of never materializing an over-budget driver block. The
    probe plan is evaluated
    twice (once reduced to distinct cells, once in the join); it is a
    scan + broadcast-centroid cross-join + tiny window, so recompute is
    cheaper than a session-lifetime persist leak. Semantics identical to
    :func:`ivf_topk` given the same centroids; with
    ``n_probe >= n_centroids`` it equals exact brute force (tested).

    ``impl='blas'``: the per-pair interpreted cosine (a higher-order
    zip_with/aggregate — evaluated outside whole-stage codegen) is
    replaced by an Arrow/numpy matmul that keeps the corpus IN PLACE:
    the probe assignment (already bounded by the batch budget above)
    is collected and broadcast as per-cell numpy blocks, and a
    mapInPandas pass over the partition-pruned corpus scan emits a
    per-Arrow-batch partial top-k — so the corpus never shuffles and
    the final ranking window sees a few (k + ties) candidates per
    query per scanned batch instead of every (query, cell-member)
    pair. The same JVM-exit move as
    ``embedding_neardup_pairs(impl='blas')``; measured 14× on sf10
    2000-query batches. Rank ties at the 6dp-rounded cosine boundary
    resolve by the same (cosine desc, neighbor asc) window either way;
    raw cosines can differ from the native fold in the last ulp (the
    embedding_neardup round-6 caveat), equality-tested at the default
    scale."""
    if impl not in ("native", "blas"):
        raise ValueError(f"ivf_topk_indexed: unknown impl {impl!r}")
    ctr_df = spark.read.parquet(f"{path}/centroids")
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("qv"),
        l2_norm(vec_col).alias("qn"),
    )
    # The probe plan replicates each query row at most once per EXISTING
    # centroid — sizing the budget by raw n_probe against a smaller index
    # (e.g. the documented n_probe >= n_centroids brute-force setting)
    # would over-split by n_probe/n_centroids and multiply redundant
    # corpus re-scans. The centroid table is <= n_centroids rows; its
    # count is a trivial job next to a search.
    est_probe = min(max(n_probe, 1), max(ctr_df.count(), 1))
    return _batched_over_queries(
        lambda qb: _ivf_indexed_search(
            spark, path, ctr_df, qb,
            k=k, n_probe=n_probe, exclude_self=exclude_self, impl=impl,
        ),
        q,
        n_probe=est_probe,
        broadcast_max_bytes=broadcast_max_bytes,
    )


def _ivf_indexed_search(
    spark,
    path: str,
    ctr_df: DataFrame,
    q: DataFrame,
    *,
    k: int,
    n_probe: int,
    exclude_self: bool,
    impl: str,
) -> DataFrame:
    """One budget-sized batch of :func:`ivf_topk_indexed` (q already
    projected to (q_id, qv, qn) and guaranteed within the broadcast
    budget by the caller's :func:`_query_batch_splits` split)."""
    sq_dist = F.aggregate(
        F.zip_with(
            F.col("qv").cast("array<double>"), "ctr", lambda a, b: (a - b) * (a - b)
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    wprobe = Window.partitionBy("q_id").orderBy(F.asc("d2"), F.asc("cell"))
    probe_plan = (
        q.crossJoin(F.broadcast(ctr_df))
        .select("q_id", "qv", "qn", "cell", sq_dist.alias("d2"))
        .withColumn("pr", F.row_number().over(wprobe))
        .filter(F.col("pr") <= n_probe)
        .select("q_id", "qv", "qn", "cell")
    )
    # Driver sees only the distinct probed cell ids (≤ n_centroids ints)
    # for the static partition filter; the full (q_id, qv, qn, cell)
    # assignment never leaves the executors — with a large query table a
    # row collect here would be a driver OOM.
    cells = sorted(r["cell"] for r in probe_plan.select("cell").distinct().collect())
    corpus = spark.read.parquet(f"{path}/cells").filter(F.col("cell").isin(cells))
    if impl == "blas":
        return _ivf_blas_topk(
            corpus, probe_plan, k=k, exclude_self=exclude_self
        )
    joined = corpus.join(F.broadcast(probe_plan), on="cell")
    if exclude_self:
        joined = joined.filter(F.col("neighbor_id") != F.col("q_id"))
    sim = joined.select(
        "q_id",
        "neighbor_id",
        F.round(cosine_from_norms("qv", "cv", "qn", "cn"), 6).alias("cosine"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("q_id", "rank")
    )


def _blas_query_batched(
    c: DataFrame,
    q: DataFrame,
    *,
    k: int,
    exclude_self: bool,
    broadcast_max_bytes: int,
) -> DataFrame:
    """Byte-guarded front door for the non-indexed blas paths
    (brute-force / sign-bucket): `_ivf_blas_topk` collects the query
    plan driver-side, so an over-budget query table is split into
    q_id-hash batches first — each batch re-scans the corpus (linear,
    map-only), the per-query results are independent, and the union is
    exact."""
    return _batched_over_queries(
        lambda qb: _ivf_blas_topk(c, qb, k=k, exclude_self=exclude_self),
        q,
        n_probe=1,
        broadcast_max_bytes=broadcast_max_bytes,
    )


def _bad_corpus_candidates(all_qids, bad_nids, *, k: int, exclude_self: bool):
    """Vectorized (query, bad-corpus-row) candidate pairs for one Arrow
    batch. Bad (NULL / zero-norm vector) corpus rows carry NULL cosine,
    which the global window ranks LAST, neighbor_id asc — so only the
    smallest bad neighbor ids in this batch can ever reach a query's
    global top-k. Cap: k when self matches are kept; with
    ``exclude_self`` the only entries ever removed for a query q are the
    copies of q itself — at most the batch's max per-id multiplicity —
    so k + max_multiplicity smallest ids are a provable superset for
    every query (a duplicate-ridden corpus cannot evict a ranked id, the
    k+1 constant could). One repeat/tile cross product, no per-row
    Python loop; the emission stays O(k·|queries|) per batch instead of
    |bad rows|·|queries|. Returns (q_arr, n_arr) or None."""
    import numpy as np

    if len(bad_nids) == 0 or len(all_qids) == 0:
        return None
    cap = k
    if exclude_self:
        _, counts = np.unique(bad_nids, return_counts=True)
        cap = k + int(counts.max())
    bad = np.sort(bad_nids)[:cap]
    if len(bad) == 0 or len(all_qids) == 0:
        return None
    q_rep = np.repeat(all_qids, len(bad))
    n_til = np.tile(bad, len(all_qids))
    if exclude_self:
        keep = q_rep != n_til
        q_rep, n_til = q_rep[keep], n_til[keep]
    return (q_rep, n_til) if len(q_rep) else None


def _ivf_blas_topk(
    corpus: DataFrame,
    probe_plan: DataFrame,
    *,
    k: int,
    exclude_self: bool,
) -> DataFrame:
    """numpy realization of the indexed IVF search (see
    :func:`ivf_topk_indexed` ``impl='blas'``) that keeps the corpus IN
    PLACE: the probe assignment — already bounded by the documented
    query-batch budget — is collected and broadcast as per-cell numpy
    blocks, and a mapInPandas pass over the partition-pruned corpus
    scan runs a chunk×cell-queries matmul per Arrow batch, emitting a
    per-batch partial top-k with epsilon slack so every global top-k
    member (including rank ties at the rounding boundary) survives
    into the exact Spark-side window. The corpus never shuffles (the
    cogroup alternative would move n_probe/n_centroids of the corpus
    per batch — terabytes at 100 TB); the only exchange is the tiny
    candidate ranking."""
    import numpy as np
    import pandas as pd

    from bigdataproject_spark.operators.dedup import _BLAS_ID_PANDAS_DTYPES

    id_type = probe_plan.schema["q_id"].dataType.simpleString()
    n_type = corpus.schema["neighbor_id"].dataType.simpleString()
    for t in (id_type, n_type):
        if t not in _BLAS_ID_PANDAS_DTYPES:
            raise TypeError(
                f"ivf_topk_indexed(impl='blas'): unsupported id type {t!r} "
                f"(supported: {sorted(_BLAS_ID_PANDAS_DTYPES)}); use "
                "impl='native' for other id types"
            )
    qd, nd = (_BLAS_ID_PANDAS_DTYPES[t] for t in (id_type, n_type))

    # bounded by the same budget as the native path's broadcast join:
    # n_queries × n_probe rows incl. vectors. NULL or zero-norm query
    # vectors cannot enter the matmul — they are carried separately so
    # the null-cosine tail rows the native path emits for them are
    # reproduced (ranked after every real cosine, neighbor-id asc).
    by_cell: dict[int, tuple] = {}
    acc: dict[int, list] = {}
    for r in probe_plan.collect():
        acc.setdefault(r["cell"], []).append((r["q_id"], r["qv"], r["qn"]))
    for cell, lst in acc.items():
        good, bad_ids = [], []
        for qid, qv, qn_ in lst:
            if qv is not None and qn_ is not None and qn_ > 0:
                good.append((qid, qv, qn_))
            else:
                bad_ids.append(qid)
        bad_q = np.array(bad_ids)
        by_cell[cell] = (
            np.array([x[0] for x in good]),
            (
                np.array([x[1] for x in good], dtype=np.float64)
                if good
                else np.zeros((0, 0))
            ),
            np.array([x[2] for x in good], dtype=np.float64),
            bad_q,
        )
    bc = corpus.sparkSession.sparkContext.broadcast(by_cell)
    _register_search_broadcast(corpus.sparkSession, bc)

    def _scan(batches):
        import numpy as np

        def _emit(q_arr, n_arr, c_arr):
            return pd.DataFrame(
                {"q_id": q_arr, "neighbor_id": n_arr, "cosine": c_arr}
            ).astype({"q_id": qd, "neighbor_id": nd, "cosine": "float64"})

        for pdf in batches:
            outs = []
            for cell, grp in pdf.groupby("cell"):
                entry = bc.value.get(cell)
                if entry is None or len(grp) == 0:
                    continue
                qids, qm, qn, bad_qids = entry
                all_qids = np.concatenate([qids, bad_qids]) if len(
                    bad_qids
                ) else qids
                # corpus rows whose vector is NULL or zero-norm pair
                # with probing queries as null-cosine candidates (NaN
                # here; converted to NULL Spark-side) — the native
                # path's behavior, capped at the smallest bad ids per
                # batch (a duplicate-safe superset of any query's
                # global NULL-tail top-k — see _bad_corpus_candidates)
                # and emitted as ONE vectorized cross product so a
                # NULL-heavy corpus cannot degrade the scan to
                # per-row Python.
                cn_raw = grp["cn"].to_numpy()
                bad_c = grp["cv"].isna().to_numpy() | ~(
                    np.nan_to_num(cn_raw.astype(np.float64), nan=0.0) > 0
                )
                pair = _bad_corpus_candidates(
                    all_qids,
                    grp["neighbor_id"].to_numpy()[bad_c],
                    k=k,
                    exclude_self=exclude_self,
                )
                if pair is not None:
                    outs.append(_emit(pair[0], pair[1], np.nan))
                grp = grp[~bad_c]
                if len(grp) == 0:
                    continue
                nids = grp["neighbor_id"].to_numpy()
                # a bad QUERY sees every good corpus row at null cosine;
                # the global ranking is neighbor-id asc, so the k
                # smallest ids of this batch are a superset of its
                # contribution to the global top-k.
                for bq in bad_qids:
                    ns = np.sort(nids[nids != bq] if exclude_self else nids)[:k]
                    if len(ns):
                        outs.append(_emit(np.full(len(ns), bq), ns, np.nan))
                if len(qids) == 0:
                    continue
                cm = np.stack(grp["cv"].to_numpy()).astype(np.float64)
                cn = grp["cn"].to_numpy().astype(np.float64)
                cos = (qm @ cm.T) / np.outer(qn, cn)
                cos = np.where(np.isfinite(cos), cos, -np.inf)
                if exclude_self:
                    cos = np.where(
                        qids[:, None] == nids[None, :], -np.inf, cos
                    )
                kk = min(k, cos.shape[1])
                kth = np.partition(cos, cos.shape[1] - kk, axis=1)[
                    :, cos.shape[1] - kk
                ]
                # 1.1e-6 slack > the 5e-7 round-6 quantum: a candidate
                # tied with the k-th at the rounded boundary is never
                # dropped before the exact window ranks it.
                mask = np.isfinite(cos) & (cos >= kth[:, None] - 1.1e-6)
                ii, jj = np.nonzero(mask)
                if len(ii):
                    outs.append(_emit(qids[ii], nids[jj], cos[ii, jj]))
            if outs:
                yield pd.concat(outs, ignore_index=True)

    cand = corpus.select("cell", "neighbor_id", "cv", "cn").mapInPandas(
        _scan, schema=f"q_id {id_type}, neighbor_id {n_type}, cosine double"
    )
    # NaN is the in-band null marker (pandas float columns cannot carry
    # NULL through Arrow); restore real NULLs so ordering matches the
    # native path (desc ranks NULL last).
    sim = cand.select(
        "q_id",
        "neighbor_id",
        F.when(F.isnan("cosine"), F.lit(None))
        .otherwise(F.round("cosine", 6))
        .alias("cosine"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("q_id", "rank")
    )


# Broadcasts created by the blas search paths, per SparkContext id:
# a long-lived search service calls release_search_broadcasts() between
# batches so per-batch query blocks do not accumulate for the session
# lifetime (they are otherwise only reclaimed when the result frames
# are garbage-collected).
_SEARCH_BCS: dict[int, list] = {}


def _register_search_broadcast(spark, bc) -> None:
    _SEARCH_BCS.setdefault(id(spark.sparkContext), []).append(bc)


def release_search_broadcasts(spark) -> int:
    """Unpersist every broadcast the blas search paths created on this
    session's SparkContext; returns how many were released. Safe to
    call only AFTER the result DataFrames have been fully consumed."""
    bcs = _SEARCH_BCS.pop(id(spark.sparkContext), [])
    for bc in bcs:
        try:
            bc.unpersist()
        except Exception:
            pass
    return len(bcs)
