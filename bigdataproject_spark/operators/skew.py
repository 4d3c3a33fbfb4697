"""Skew mitigation primitives for hot keys at scale (SURVEY §7.4.7 /
100TB design notes).

AQE's skew-join splitting (on in session.py) handles most cases at
runtime; these operators cover the two shapes AQE cannot fix:

  * ``salted_aggregate``: a two-level aggregate for hot GROUP BY keys —
    partial aggregate on (key, salt), final on key. The first shuffle
    spreads a hot key over ``n_salts`` reducers; the second moves only
    n_salts pre-aggregated rows per key. Works for any algebraic
    aggregate (sum/count/min/max and avg via sum+count).
  * ``salted_broadcast_left``: broadcast-join fallback for a skewed
    *large-large* join where one side's hot keys fit in memory after
    isolation — hot keys are broadcast-joined, the remainder
    shuffle-joined, results unioned. The hot-key list is either given
    or sampled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    *,
    key: str,
    agg_exprs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-level (salted) aggregate.

    ``agg_exprs`` maps output column → (input column, fn) with fn in
    {sum, count, min, max}. Example::

        salted_aggregate(df, key="k",
                         agg_exprs={"total": ("v", "sum"), "n": ("v", "count")})

    Equivalent to ``df.groupBy(key).agg(...)`` — the salt only reshapes
    the shuffle. (Spark's own HashAggregate already does partial
    aggregation per *partition*; salting additionally bounds the FINAL
    reducer's fan-in for a hot key, which matters when one key's partials
    still overwhelm a single reducer at 100TB.)
    """
    fn_map = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    refn_map = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    salted = df.withColumn("_salt", (F.rand(seed=42) * n_salts).cast("int"))
    partial = salted.groupBy(key, "_salt").agg(
        *[fn_map[fn](col).alias(out) for out, (col, fn) in agg_exprs.items()]
    )
    return partial.groupBy(key).agg(
        *[refn_map[fn](out).alias(out) for out, (col, fn) in agg_exprs.items()]
    )


def hot_keys(
    df: DataFrame, key: str, *, threshold_frac: float = 0.01, min_count: int = 5
) -> list:
    """Sample-based hot-key detection: keys holding more than
    ``threshold_frac`` of a 1% sample. Cheap (single narrow scan of the
    sample), driver-side result is tiny by construction (≤ 1/frac keys).
    ``min_count`` is an absolute floor so tiny samples (where one
    occurrence already exceeds the fraction) don't flag everything."""
    sample = df.select(key).sample(fraction=0.01, seed=42)
    total = sample.count()
    if total == 0:
        return []
    cut = max(threshold_frac * total, float(min_count))
    rows = sample.groupBy(key).count().filter(F.col("count") > cut).collect()
    return [r[0] for r in rows]


def salted_broadcast_left(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    hot: list | None = None,
) -> DataFrame:
    """Skew-isolating inner join: rows with hot join keys go through a
    broadcast join (the hot slice of ``right`` must fit in memory —
    guaranteed small key count by construction), the cold remainder
    through a normal shuffle join; union the two.

    Same result as ``left.join(right, on)`` for any key split.
    """
    if hot is None:
        hot = hot_keys(left, on)
    if not hot:
        return left.join(right, on=on)
    is_hot = F.col(on).isin(hot)
    hot_part = left.filter(is_hot).join(
        F.broadcast(right.filter(is_hot)), on=on
    )
    cold_part = left.filter(~is_hot).join(right.filter(~is_hot), on=on)
    return hot_part.unionByName(cold_part)
