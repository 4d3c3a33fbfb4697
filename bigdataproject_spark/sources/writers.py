"""Writers (SURVEY §2.1 S6–S7, §2.13 M2).

The reference hardcodes ``coalesce(1)`` single-file CSV sinks
(hot/preprocess_high_energy.py:86, danmaku_analysis_cluster.py:157-158)
and assembles nested JSON on the driver after a full ``collect()``
(hot/spark_energy.py:98-116). Here single-file output is an *option*
(default: keep the write parallel — at 100TB a coalesce(1) is a
single-task serialization point), and JSON is written by executors via
``df.write.json``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _prep(
    df: DataFrame,
    single_file: bool,
    partition_by: list[str] | None,
    sort_by: list | None = None,
) -> DataFrame:
    if single_file and partition_by:
        raise ValueError("single_file and partition_by are mutually exclusive")
    if sort_by and not single_file:
        raise ValueError("sort_by requires single_file=True")
    # repartition(1), not coalesce(1): coalesce propagates up through
    # every narrow transformation to the previous shuffle boundary, so
    # the whole upstream computation would run on ONE core — the
    # reference's exact mistake. One extra shuffle confines the
    # single-task section to the write itself. The price of that shuffle
    # is row ORDER: a single reducer fetches its map outputs in
    # nondeterministic order, so an upstream orderBy does NOT survive
    # into the file on a real cluster (it happens to today on
    # single-partition local inputs — never rely on it). Callers that
    # need an ordered file pass ``sort_by``; the sortWithinPartitions
    # runs inside the one write task, after the exchange, so the
    # guarantee is structural, not incidental.
    if not single_file:
        return df
    out = df.repartition(1)
    return out.sortWithinPartitions(*sort_by) if sort_by else out


def write_parquet(
    df: DataFrame,
    path: str,
    *,
    mode: str = "overwrite",
    single_file: bool = False,
    partition_by: list[str] | None = None,
    sort_by: list | None = None,
) -> None:
    """Canonical columnar sink; ``partition_by`` enables partition pruning.
    ``sort_by`` (single_file only) makes the one output file ordered —
    see :func:`_prep` for why an upstream orderBy is not enough."""
    w = _prep(df, single_file, partition_by, sort_by).write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_csv(
    df: DataFrame,
    path: str,
    *,
    mode: str = "overwrite",
    header: bool = True,
    single_file: bool = False,
    sort_by: list | None = None,
) -> None:
    """Compatibility CSV sink (S6). ``single_file=True`` reproduces the
    reference's human-readable one-file output; pass ``sort_by`` when
    that file must be ORDERED (ranked exports) — repartition(1) alone
    does not preserve upstream sort order on a cluster."""
    _prep(df, single_file, None, sort_by).write.mode(mode).option(
        "header", header
    ).csv(path)


def write_json(
    df: DataFrame,
    path: str,
    *,
    mode: str = "overwrite",
    single_file: bool = False,
    sort_by: list | None = None,
) -> None:
    """Executor-side JSON sink (replaces driver-side json.dump, S7).

    Nested rows (e.g. struct timelines) serialize directly; no collect().
    """
    _prep(df, single_file, None, sort_by).write.mode(mode).json(path)


def training_shard_plan(
    df: DataFrame, *, key_col: str, n_shards: int
) -> DataFrame:
    """The shard-assignment plan behind :func:`write_training_shards`,
    exposed so plan-hygiene gates can pin its shape: one projection
    adding the content-keyed shard id, then exactly ONE exchange (the
    repartition on shard)."""
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    if "shard" in df.columns:
        # withColumn would silently overwrite it — e.g. re-sharding a
        # corpus read back from a previous write_training_shards, whose
        # partition column materializes as 'shard' on read.
        raise ValueError(
            "training_shard_plan: input already has a 'shard' column "
            "(reserved for the shard assignment); drop or rename it first"
        )
    return df.withColumn(
        "shard", F.pmod(F.xxhash64(key_col), F.lit(n_shards)).cast("int")
    ).repartition("shard")


def write_training_shards(
    df: DataFrame,
    path: str,
    *,
    key_col: str,
    n_shards: int,
    mode: str = "overwrite",
    format: str = "parquet",
) -> None:
    """Shard a training corpus into ``shard=N/`` partitions with a
    DETERMINISTIC content-keyed assignment: shard = xxhash64(key) mod
    n_shards. Determinism matters the same way it does for
    operators/sampling.py — a retried job, a re-run on regenerated
    data, or a different cluster layout lands every record in the same
    shard, so downstream epoch shuffling / resume bookkeeping stays
    stable. One shuffle (repartition on the shard id so each shard is
    written contiguously by as few tasks as possible), then a
    Hive-partitioned layout a trainer can read shard-by-shard with
    partition pruning."""
    w = (
        training_shard_plan(df, key_col=key_col, n_shards=n_shards)
        .write.mode(mode)
        .partitionBy("shard")
    )
    if format == "parquet":
        w.parquet(path)
    elif format == "json":
        w.json(path)
    else:
        raise ValueError(f"unsupported shard format {format!r}")
