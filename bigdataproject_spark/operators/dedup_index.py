"""Incremental near-dup detection against a persisted signature index.

Production dedup is incremental: a daily crawl batch must be checked
against the WHOLE historical corpus without recomputing the corpus'
signatures (re-running full-corpus LSH per batch is quadratic in
corpus-lifetime). The store is the minhash index itself — band rows for
candidate generation plus hashed shingle sets for exact verification —
so a batch costs: signatures over the BATCH only, one equi-join against
the stored band rows, verification joins against the stored shingle
sets, then an append of the accepted docs' rows. The reference's
resumable dedup (crawler/spider_worker.py:105-113) is the exact-id
version of this idea; this generalizes it to content similarity.

Scale shape: the stored `bands` table is read with a filter pushed on
nothing (every band row is a candidate target) but joined on the
high-entropy (band_id, band_hash) key — the batch side is small, so
AQE broadcasts it and the corpus-side table is scanned once, never
shuffled. The verify joins touch only candidate ids (semi-join-sized
reads). State lives entirely in parquet — no driver memory, resumable
by construction, and `append_to_index` keeps it monotone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdataproject_spark.operators.dedup import _plan_size_bytes, lsh_band_rows


def _prepared(
    docs: DataFrame, *, id_col: str, shingles_col: str
) -> DataFrame:
    """(id, sh) for the shingles store — EVERY doc, including empty/NULL
    shingle sets (normalized to []). The shingles table doubles as the
    index's id-membership set: filtering out short docs here would let
    the same id be accepted again by a later batch (the already-stored
    guard in accept_batch / index_stream reads this table). Empty rows
    are inert everywhere else — they have no band rows, so they never
    appear in candidates, and the verify joins only probe candidate
    ids."""
    sh = F.col(shingles_col)
    empty = F.array().cast(docs.schema[shingles_col].dataType.simpleString())
    return docs.select(
        F.col(id_col).alias("id"), F.coalesce(sh, empty).alias("sh")
    )


def write_minhash_index(
    docs: DataFrame,
    path: str,
    *,
    id_col: str,
    shingles_col: str,
    num_hashes: int = 32,
    bands: int = 8,
    hash_family: str = "murmur3",
    append: bool = False,
) -> None:
    """Materialize (or extend) the index: ``{path}/bands`` with
    (id, band_id, band_hash) and ``{path}/shingles`` with (id, sh).

    The same (num_hashes, bands, hash_family) MUST be used for every
    write and query against one index path — band keys from different
    families never collide, so a mismatch silently finds nothing;
    callers keep the parameters with the path (they are also the
    arguments of :func:`incremental_minhash_pairs`)."""
    mode = "append" if append else "overwrite"
    band_df = lsh_band_rows(
        docs,
        id_col=id_col,
        shingles_col=shingles_col,
        num_hashes=num_hashes,
        bands=bands,
        hash_family=hash_family,
    )
    band_df.write.mode(mode).parquet(f"{path}/bands")
    _prepared(docs, id_col=id_col, shingles_col=shingles_col).write.mode(
        mode
    ).parquet(f"{path}/shingles")


def incremental_minhash_pairs(
    spark: SparkSession,
    new_docs: DataFrame,
    path: str,
    *,
    id_col: str,
    shingles_col: str,
    threshold: float,
    num_hashes: int = 32,
    bands: int = 8,
    hash_family: str = "murmur3",
) -> DataFrame:
    """Verified near-dup pairs touching the new batch: (id_a, id_b,
    jaccard, vs_index) where id_a is always a new-batch doc, id_b is a
    stored doc (``vs_index`` true) or another new-batch doc (``vs_index``
    false, emitted once with id_a < id_b). Equivalent to running the
    full-corpus pipeline on stored ∪ new and keeping the pairs that
    involve a new doc (equality tested in tests/test_dedup_index.py).

    Rows are unique per ORIENTED (id_a, id_b). On a RESUMED batch
    (some batch ids already appended to the store) self-pairs are
    dropped, a pair reachable both via the store and via the batch
    reports ``vs_index`` true, and a pair of two batch docs one of
    which is also stored can appear in both orientations — once as
    (new, stored) and once as (smaller-new, larger-new); accept_batch
    handles both and stays idempotent.

    No identical-set collapse here (the batch is the small side; the
    collapse front-end pays off on full-corpus self-joins — see
    minhash_lsh_dedup_pairs)."""
    new_prep = _prepared(new_docs, id_col=id_col, shingles_col=shingles_col)
    new_bands = lsh_band_rows(
        new_docs,
        id_col=id_col,
        shingles_col=shingles_col,
        num_hashes=num_hashes,
        bands=bands,
        hash_family=hash_family,
    )
    stored_bands = spark.read.parquet(f"{path}/bands")
    stored_sh = spark.read.parquet(f"{path}/shingles")

    nb = new_bands.select(
        F.col("id").alias("id_a"), "band_id", "band_hash"
    )
    # new vs stored: every (new, old) bucket collision kept as
    # (new, old); the id_a != id_b guard drops the degenerate self-pair
    # a RESUMED batch would produce (its ids already live in the store).
    cand_old = (
        nb.join(
            stored_bands.select(
                F.col("id").alias("id_b"), "band_id", "band_hash"
            ),
            on=["band_id", "band_hash"],
        )
        .filter(F.col("id_a") != F.col("id_b"))
        .select("id_a", "id_b")
        .withColumn("vs_index", F.lit(True))
    )
    cand_new = (
        nb.join(
            new_bands.select(
                F.col("id").alias("id_b"), "band_id", "band_hash"
            ),
            on=["band_id", "band_hash"],
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .withColumn("vs_index", F.lit(False))
    )
    # one row per (id_a, id_b): when a pair is reachable both ways
    # (partner id present in the store AND in the batch — the resumed
    # case again), vs_index=true wins, recording that the store already
    # knows the partner.
    cands = (
        cand_old.unionByName(cand_new)
        .groupBy("id_a", "id_b")
        .agg(F.max("vs_index").alias("vs_index"))
    )

    lookup_a = new_prep.select(
        F.col("id").alias("id_a"), F.col("sh").alias("sh_a")
    )
    # One row per id when an id exists in both store and batch (the
    # resumed case; same content by assumption): keep the batch copy and
    # ANTI-JOIN the store against the broadcast batch ids. NOT
    # dropDuplicates over the union — that shuffles the ENTIRE store
    # per batch (measured 40% of a 5k-batch check against a 500k store);
    # the anti-join leaves the store map-side.
    batch_ids = F.broadcast(new_prep.select(F.col("id")))
    lookup_b = (
        stored_sh.join(batch_ids, "id", "left_anti")
        .select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
        .unionByName(
            new_prep.select(
                F.col("id").alias("id_b"), F.col("sh").alias("sh_b")
            )
        )
    )
    joined = cands.join(lookup_a, "id_a").join(lookup_b, "id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    jac = F.round(inter / union, 6)
    return joined.select(
        "id_a", "id_b", jac.alias("jaccard"), "vs_index"
    ).filter(F.col("jaccard") >= threshold)


def dropped_ids(
    pairs: DataFrame, already_stored: DataFrame, *, id_col: str
) -> DataFrame:
    """The ONE keep-policy both the batch (:func:`accept_batch`) and the
    streaming (streaming/index_stream.py) flows share: from the verified
    pair set, drop the batch doc (id_a) when the partner is stored, else
    the larger batch id (min-id survivor — consistent with the
    connected-components min-label policy); union the already-stored ids
    so a resumed batch stays idempotent. One pass over the candidate
    pipeline — two .filter() branches would evaluate the whole
    LSH+verify plan twice."""
    return (
        pairs.select(
            F.when(F.col("vs_index"), F.col("id_a"))
            .otherwise(F.col("id_b"))
            .alias(id_col)
        )
        .unionByName(already_stored)
        .distinct()
    )


def accept_batch(
    spark: SparkSession,
    new_docs: DataFrame,
    path: str,
    *,
    id_col: str,
    shingles_col: str,
    threshold: float,
    num_hashes: int = 32,
    bands: int = 8,
    hash_family: str = "murmur3",
    lease_owner: str | None = None,
) -> DataFrame:
    """The full incremental step: find the batch docs that are NOT
    near-dups of the stored corpus or of an earlier (smaller-id) batch
    doc, append their signatures to the index, and return them.

    Keep-policy mirrors the engine default: a batch doc is dropped when
    it matches the stored corpus, or a smaller batch id (the min id of
    a within-batch dup chain survives — consistent with the
    connected-components min-label policy; use operators/concomp.py on
    the pairs when explicit cluster ids are needed).

    The drop-list is localCheckpoint'd BEFORE the index append: that
    truncates the survivor plan's lineage so it no longer reads
    ``{path}/bands`` — re-evaluating the returned frame after the
    append must not see the batch's own just-appended signatures.

    ``lease_owner`` (default: this applicationId) is checked against a
    compaction lease on the index (operators/lease.py): an append racing
    another writer's :func:`compact_index` swap would be silently
    dropped by the swap, so it raises loudly instead."""
    from bigdataproject_spark.operators.lease import assert_unleased

    assert_unleased(
        spark, path, lease_owner or spark.sparkContext.applicationId
    )
    pairs = incremental_minhash_pairs(
        spark,
        new_docs,
        path,
        id_col=id_col,
        shingles_col=shingles_col,
        threshold=threshold,
        num_hashes=num_hashes,
        bands=bands,
        hash_family=hash_family,
    )
    already_stored = new_docs.select(F.col(id_col)).join(
        spark.read.parquet(f"{path}/shingles").select(
            F.col("id").alias(id_col)
        ),
        id_col,
        "left_semi",
    )
    # idempotent resume rides inside dropped_ids: a batch id already
    # present in the store (a crash after a partial append, a re-run)
    # must not append a second copy of its signatures.
    dropped = dropped_ids(
        pairs, already_stored, id_col=id_col
    ).localCheckpoint()
    survivors = new_docs.join(dropped, id_col, "left_anti")
    write_minhash_index(
        survivors,
        path,
        id_col=id_col,
        shingles_col=shingles_col,
        num_hashes=num_hashes,
        bands=bands,
        hash_family=hash_family,
        append=True,
    )
    return survivors


_TARGET_FILE_BYTES = 128 << 20  # one comfortable parquet split


def compact_index(
    spark: SparkSession,
    path: str,
    *,
    num_files: int | None = None,
    lease_owner: str | None = None,
) -> dict[str, dict[str, int]]:
    """Rewrite the index in place: thousands of per-batch appended part
    files (``accept_batch`` appends every batch) become a few large
    files, clustered for the read patterns the index serves.

    ``bands`` is re-bucketed on ``band_hash`` and sorted within files by
    (band_id, band_hash): batch checks join on that key, so clustering
    gives parquet min-max row-group skipping and locality the
    arrival-order appends destroy. ``shingles`` is re-bucketed on ``id``
    (the verify joins and the resume anti-join both probe by id).
    ``num_files`` defaults to footer-estimated size / 128 MiB.

    OFFLINE maintenance op: no concurrent writer (an append racing the
    swap would vanish into the renamed-aside copy — enforced
    best-effort by the writer lease this function acquires, see
    operators/lease.py; :func:`accept_batch` checks it and raises) and
    no concurrent reader (the rename-swap leaves each table briefly
    nonexistent — run it between batches, quiesce or retry external
    readers). ``lease_owner`` defaults to this applicationId; a
    restartable maintenance loop should pass a restart-stable string
    (the streaming flow passes its checkpoint path) so its own stale
    lease after a crash is stolen back instead of wedging it.
    Crash-safe by re-run, with NO window that can lose data: the live
    table is never deleted, only atomically RENAMED aside to
    ``{table}__old`` after the compacted temp dir is complete, then the
    temp dir is renamed into place and the old copy dropped. On entry a
    missing live dir (crash between the two renames) is healed from
    the completed temp dir, else from the renamed-aside original; a
    stale temp/old dir from any earlier crash is cleared before the
    rewrite. Returns per-table {files_before, files_after, rows}.
    """
    from bigdataproject_spark.operators.lease import acquire_lease, release_lease

    owner = lease_owner or spark.sparkContext.applicationId
    acquire_lease(spark, path, owner)
    try:
        return _compact_index_leased(spark, path, num_files)
    finally:
        release_lease(spark, path, owner)


def _compact_index_leased(
    spark: SparkSession, path: str, num_files: int | None
) -> dict[str, dict[str, int]]:
    """:func:`compact_index` body, lease already held."""
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    Path = jvm.org.apache.hadoop.fs.Path

    stats: dict[str, dict[str, int]] = {}
    for table, keys in (("bands", ["band_hash"]), ("shingles", ["id"])):
        live = f"{path}/{table}"
        tmp = f"{path}/{table}__compacting"
        old = f"{path}/{table}__old"
        fs = Path(live).getFileSystem(hconf)

        # heal an interrupted previous run: live is missing only in the
        # window between rename(live→old) and rename(tmp→live), where
        # BOTH complete copies exist — prefer the compacted temp dir
        # (marked complete by _SUCCESS), fall back to the original.
        if not fs.exists(Path(live)):
            if fs.exists(Path(f"{tmp}/_SUCCESS")):
                src = tmp
            elif fs.exists(Path(old)):
                src = old
            else:
                raise IOError(
                    f"compact_index: {live} missing and no recovery copy"
                )
            if not fs.rename(Path(src), Path(live)):
                raise IOError(
                    f"compact_index: recovery rename {src} -> {live} failed"
                )
        # stale leftovers from a crash after recovery was possible
        fs.delete(Path(tmp), True)
        fs.delete(Path(old), True)

        df = spark.read.parquet(live)
        if table == "bands":
            # a crash between a replayed append's bands write and its
            # shingles write leaves duplicate band rows (idempotence is
            # exact at shingle granularity only — see
            # streaming/index_stream.py). Harmless for candidate
            # generation (pairs are grouped), but growth is unbounded
            # under repeated crashes; compaction is where they die.
            df = df.dropDuplicates(["id", "band_id", "band_hash"])
        n = num_files
        if n is None:
            n = max(1, -(-_plan_size_bytes(df) // _TARGET_FILE_BYTES))
        sort_cols = ["band_id", "band_hash"] if table == "bands" else ["id"]
        (
            df.repartition(n, *keys)
            .sortWithinPartitions(*sort_cols)
            .write.mode("overwrite")
            .parquet(tmp)
        )

        def _parts(p: str) -> int:
            return sum(
                1
                for st in fs.listStatus(Path(p))
                if st.getPath().getName().endswith(".parquet")
            )

        before = _parts(live)
        rows = spark.read.parquet(tmp).count()
        if not fs.rename(Path(live), Path(old)):
            raise IOError(f"compact_index: rename {live} -> {old} failed")
        if not fs.rename(Path(tmp), Path(live)):
            # roll the original back so the index stays readable; if the
            # rollback ALSO fails the live dir is missing (still healable
            # on re-run from __old/__compacting) — say so instead of
            # reporting only the first failure.
            restored = fs.rename(Path(old), Path(live))
            raise IOError(
                f"compact_index: rename {tmp} -> {live} failed "
                f"(live restored from {old}: {'yes' if restored else 'NO'}"
                f"{'' if restored else ' — re-run compact_index to heal'})"
            )
        fs.delete(Path(old), True)
        stats[table] = {
            "files_before": before,
            "files_after": _parts(live),
            "rows": rows,
        }
    return stats
