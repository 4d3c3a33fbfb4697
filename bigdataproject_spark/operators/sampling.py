"""Deterministic sampling for training-data pipelines.

``rand()``-based sampling is the wrong tool at 100 TB: it is
partitioning-dependent, unstable across retries/stragglers (a recomputed
task resamples!), and irreproducible across engines. These operators cut
on a content-independent 48-bit key hash instead
(``dedup.portable_hash48``): the keep-set is a pure function of the key,
stable across runs, cluster sizes, engines (the identical hash is
computable in ANSI SQL), and composable — a 10% sample is a strict
subset of a 20% sample of the same keys.

``stratified_sample_filter`` is the data-mixture primitive: per-stratum
rates (e.g. per language / per source weights when rebalancing a
training mix) as one map-stage predicate — no shuffle, no per-stratum
jobs, pushed into the scan when the stratum is a partition column.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column
from pyspark.sql import functions as F

from bigdataproject_spark.operators.dedup import portable_hash48

_HASH_SPACE = 1 << 48


def sample_cut(fraction: float) -> int:
    """Integer threshold on the 48-bit key hash for a given keep rate."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return int(fraction * _HASH_SPACE)


def deterministic_sample_filter(key: Column | str, fraction: float) -> Column:
    """Boolean keep-predicate: hash48(key) < fraction · 2^48."""
    k = F.col(key) if isinstance(key, str) else key
    return portable_hash48(k.cast("string")) < F.lit(sample_cut(fraction))


def stratified_sample_filter(
    key: Column | str,
    stratum: Column | str,
    fractions: Mapping[str, float],
    *,
    default_fraction: float = 0.0,
) -> Column:
    """Per-stratum deterministic keep-predicate (data-mixture sampling).

    ``fractions`` maps stratum value → keep rate; unlisted strata use
    ``default_fraction``. One hash + one lookup per row — a pure
    map-stage expression. Because every stratum cuts the same hash,
    per-stratum keep-sets nest monotonically in the rate, so reweighting
    a mixture between pipeline versions only adds/removes rows at the
    margin (cache- and dedup-friendly).

    Small mixtures (≤16 strata) use a CASE chain (codegen-friendly,
    cheapest); larger ones a constant-folded MAP literal lookup
    (``try_element_at`` — NULL on miss, never ANSI-throws), keeping the
    expression tree FLAT instead of an O(n)-depth nested-when tower that
    blows up analysis/codegen for a 500-source mixture map. A NULL
    stratum falls to ``default_fraction`` on both paths. Beyond a few
    thousand strata, prefer joining a broadcast rate table instead of an
    in-plan literal."""
    k = F.col(key) if isinstance(key, str) else key
    s = F.col(stratum) if isinstance(stratum, str) else stratum
    default_cut = F.lit(sample_cut(default_fraction))
    if len(fractions) <= 16:
        cut: Column = default_cut
        for value, frac in fractions.items():
            cut = F.when(s == value, F.lit(sample_cut(frac))).otherwise(cut)
    else:
        m = F.map_from_arrays(
            F.array(*[F.lit(v) for v in fractions]),
            F.array(*[F.lit(sample_cut(f)) for f in fractions.values()]),
        )
        cut = F.coalesce(F.try_element_at(m, s), default_cut)
    return portable_hash48(k.cast("string")) < cut
