"""Temporal join operators the reference's event/time-series data model
implies but Spark lacks as built-ins: as-of join and bounded range join.

Both are implemented as compositions of existing DataFrame ops (SURVEY
custom-operator rule (a)) with scale-first physical shapes:

  * as-of join: union + running ``max(struct(ts, payload…))`` window —
    ONE shuffle on the key, no per-row range probe, no skew-prone theta
    join. This is the standard log-merge formulation: right rows sort
    before left rows at equal (key, ts), so "at or before" ties resolve
    to the right row. The match is ONE atomic struct (never per-column
    ``last(ignorenulls)``, which would stitch values from different
    right rows whenever the latest row carries a NULL payload column),
    and struct comparison past the leading ts field gives a
    deterministic winner among right rows tied on (key, ts).
  * range join: time-band bucketing — each left row probes only its own
    and the preceding bucket (band width = range width), turning the
    theta join into an equi-join on (key, bucket) + residual filter.
    At 100TB this is the difference between a broadcast-nested-loop
    (quadratic) and a hash join whose fan-out is bounded by bucket
    population.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str,
    ts: str,
    right_payload: list[str],
    how: str = "left",
) -> DataFrame:
    """For each left row, attach the payload of the latest right row with
    the same ``key`` and right.ts <= left.ts.

    Returns all left columns plus ``right_payload`` columns (null when no
    prior right row exists; ``how='inner'`` drops those rows — dropped by
    whether a right ROW matched, so a matched row whose payload values
    are all NULL is kept). The payload is attached as one atomic struct:
    all returned columns come from the SAME right row (the DuckDB
    ``ASOF JOIN`` contract), and right rows tied on (key, ts) resolve
    deterministically by lexicographic payload comparison.
    """
    if how not in ("left", "inner"):
        raise ValueError(
            f"asof_join: unknown how {how!r} (expected 'left' or 'inner')"
        )
    lcols = left.columns
    l = left.withColumn("_side", F.lit(1))
    for c in right_payload:
        l = l.withColumn(f"_rp_{c}", F.lit(None).cast(right.schema[c].dataType))
    r = right.select(
        F.col(key),
        F.col(ts),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_rp_{c}") for c in right_payload],
    )
    for c in lcols:
        if c not in (key, ts):
            r = r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    unioned = l.select(
        *lcols, "_side", *[f"_rp_{c}" for c in right_payload]
    ).unionByName(r.select(*lcols, "_side", *[f"_rp_{c}" for c in right_payload]))

    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # ONE running max over a struct led by ts: the whole matched right
    # row travels together (max is order-insensitive, so the result is
    # deterministic even among frame rows tied on the window ordering).
    matched = F.max(
        F.when(
            F.col("_side") == 0,
            F.struct(
                F.col(ts).alias("_ts"),
                *[F.col(f"_rp_{c}").alias(f"_rp_{c}") for c in right_payload],
            ),
        )
    ).over(w)
    out = unioned.select(*lcols, "_side", matched.alias("_m")).filter(
        F.col("_side") == 1
    )
    if how == "inner":
        out = out.filter(F.col("_m").isNotNull())
    for c in right_payload:
        out = out.withColumn(
            c if c not in lcols else f"right_{c}", F.col(f"_m._rp_{c}")
        )
    return out.drop("_side", "_m")


def range_join_count(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str,
    left_ts: str,
    right_ts: str,
    lookback_s: int,
) -> DataFrame:
    """Count right rows with the same key in [left.ts - lookback_s, left.ts)
    — strictly before the left row, within the lookback window (the lower
    bound is INCLUSIVE: a right row exactly lookback_s earlier counts, as
    the ``>=`` predicate and the DuckDB oracle both implement).

    Banded equi-join: both sides are bucketed by ``lookback_s``; a left row
    only joins buckets {b, b-1}, which is exhaustive because the window is
    exactly one bucket wide. Returns left rows (all columns) + ``n_in_range``
    (only rows with ≥1 match; outer-count variants compose with a left join).

    Output cardinality is per left ROW, not per distinct left row: two
    identical left rows each get their own output row.

    Physical shape (r6 rewrite): ``n_in_range`` is a function of
    (key, ts) ALONE, so the probe side is ``distinct (key, ts)`` — every
    exchange before the final join carries two columns, map-side
    combinable — and the per-pair counts equi-join back onto the full
    left. Only that last join touches full-width left rows, and AQE
    broadcasts the counts side whenever it is small. This is
    deterministic under stage retry by construction (no row ids, no
    nondeterministic expressions anywhere — the r5 formulation stamped
    monotonically_increasing_id before the explode, and a retried,
    reordered map task could regenerate one left row's two probe rows
    with different ids, splitting its count across two output rows);
    duplicate left rows ride through the back-join, each picking up the
    identical count their shared (key, ts) determines. Left rows with a
    NULL key or ts can never satisfy the range predicate and drop out of
    both joins consistently.
    """
    if lookback_s <= 0:
        raise ValueError(
            f"range_join_count: lookback_s must be positive, got {lookback_s}"
        )
    pairs = left.select(
        F.col(key).alias("_k"), F.col(left_ts).alias("_t")
    ).distinct()
    lb = F.floor(F.unix_timestamp(F.col("_t")) / lookback_s)
    rb = F.floor(F.unix_timestamp(F.col(right_ts)) / lookback_s)
    probes = pairs.withColumn(
        "_bucket", F.explode(F.array(lb.cast("long"), (lb - 1).cast("long")))
    )
    build = right.select(
        F.col(key).alias("_rkey"),
        F.col(right_ts).alias("_rts"),
        rb.cast("long").alias("_bucket"),
    )
    joined = probes.join(
        build,
        (F.col("_k") == F.col("_rkey"))
        & (probes["_bucket"] == build["_bucket"])
        & (F.col("_rts") < F.col("_t"))
        & (
            F.col("_rts")
            >= F.col("_t") - F.expr(f"INTERVAL {lookback_s} SECONDS")
        ),
    )
    counts = joined.groupBy("_k", "_t").agg(
        F.count(F.lit(1)).alias("n_in_range")
    )
    return left.join(
        counts,
        (F.col(key) == F.col("_k")) & (F.col(left_ts) == F.col("_t")),
    ).select(*left.columns, "n_in_range")
