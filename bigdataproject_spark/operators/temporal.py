"""Temporal join operators the reference's event/time-series data model
implies but Spark lacks as built-ins: as-of join and bounded range join.

Both are implemented as compositions of existing DataFrame ops (SURVEY
custom-operator rule (a)) with scale-first physical shapes:

  * as-of join: union + running ``last(..., ignorenulls)`` window — ONE
    shuffle on the key, no per-row range probe, no skew-prone theta join.
    This is the standard log-merge formulation: right rows sort before
    left rows at equal (key, ts), so "at or before" ties resolve to the
    right row, and the window carries the latest right payload forward.
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
    prior right row exists; ``how='inner'`` drops those rows).
    """
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
    out = unioned.select(
        *lcols,
        "_side",
        *[
            F.last(f"_rp_{c}", ignorenulls=True).over(w).alias(f"_m_{c}")
            for c in right_payload
        ],
    ).filter(F.col("_side") == 1)
    for c in right_payload:
        out = out.withColumn(c if c not in lcols else f"right_{c}", F.col(f"_m_{c}"))
    out = out.drop("_side", *[f"_m_{c}" for c in right_payload])
    if how == "inner":
        first = right_payload[0]
        out = out.filter(
            F.col(first if first not in lcols else f"right_{first}").isNotNull()
        )
    return out


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
    """
    lb = F.floor(F.unix_timestamp(F.col(left_ts)) / lookback_s)
    rb = F.floor(F.unix_timestamp(F.col(right_ts)) / lookback_s)
    probes = left.withColumn(
        "_bucket", F.explode(F.array(lb.cast("long"), (lb - 1).cast("long")))
    )
    build = right.select(
        F.col(key).alias("_rkey"),
        F.col(right_ts).alias("_rts"),
        rb.cast("long").alias("_bucket"),
    )
    joined = probes.join(
        build,
        (F.col(key) == F.col("_rkey"))
        & (probes["_bucket"] == build["_bucket"])
        & (F.col("_rts") < F.col(left_ts))
        & (
            F.col("_rts")
            >= F.col(left_ts) - F.expr(f"INTERVAL {lookback_s} SECONDS")
        ),
    )
    return (
        joined.groupBy(*[F.col(c) for c in left.columns])
        .agg(F.count(F.lit(1)).alias("n_in_range"))
    )
