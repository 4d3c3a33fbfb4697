"""Train/eval n-gram contamination check — the decontamination step every
LLM training pipeline runs before training: flag training documents that
share word n-grams with the evaluation/benchmark set (GPT-3 appendix C
introduced the 13-gram form; Gopher and successors kept it as a standard
filter).

Scale design (the 100 TB shape):
  * the EVAL side is tiny (benchmark suites are 1e3–1e6 grams) — its
    distinct gram set is BROADCAST to the training scan, so the probe is
    a map-side hash lookup per gram, no shuffle of the 100 TB side;
  * gram keys are portable 48-bit md5 hashes (``dedup.portable_hash48``):
    8 bytes per gram instead of an n-word string, and the identical value
    is computable in ANSI SQL, so the whole operator is hash-checkable
    against a DuckDB oracle (collisions are mirrored cross-engine);
  * the only shuffle is the per-document aggregate of hit counts, which
    is map-side combinable (sum of 0/1 ints).

The reference has no decontamination surface; this is a north-star
LLM-pipeline operator (driver brief: training-data pipeline ops are
first-class components).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def ngram_contamination(
    train: DataFrame,
    eval_df: DataFrame,
    *,
    id_col: str,
    grams_col: str,
    flag_threshold: float = 0.5,
) -> DataFrame:
    """Per-training-doc contamination against an eval gram set.

    ``train``/``eval_df`` carry a distinct-gram array column
    (``grams_col``, e.g. from ``dedup.portable_hashed_shingles``). Returns
    one row per train row: (id, n_grams, n_hit, contamination,
    contaminated) where contamination = n_hit / n_grams (0.0 for gram-less
    docs) and contaminated flags rate >= ``flag_threshold``.
    """
    ev = (
        eval_df.select(F.explode(grams_col).alias("g"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    posting = train.select(
        F.col(id_col),
        F.size(grams_col).cast("long").alias("n_grams"),
        # explode_outer: a gram-less doc keeps one null-gram row so it
        # still appears in the output with n_hit = 0.
        F.explode_outer(grams_col).alias("g"),
    )
    agg = (
        posting.join(F.broadcast(ev), "g", "left")
        .groupBy(id_col, "n_grams")
        .agg(F.sum(F.coalesce("_hit", F.lit(0))).cast("long").alias("n_hit"))
    )
    rate: Column = F.when(
        F.col("n_grams") > 0, F.col("n_hit") / F.col("n_grams")
    ).otherwise(F.lit(0.0))
    return agg.select(
        id_col,
        "n_grams",
        "n_hit",
        # unrounded: single IEEE division of two exact longs is
        # bit-identical cross-engine; round() is the half-boundary
        # hazard (r11 float audit, the r10 span-dedup failure class)
        rate.alias("contamination"),
        (rate >= flag_threshold).cast("int").alias("contaminated"),
    )
