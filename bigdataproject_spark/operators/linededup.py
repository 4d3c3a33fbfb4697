"""Corpus-level line deduplication (boilerplate removal).

Web corpora repeat navigation chrome, cookie banners, and footers
across millions of pages; C4 and RefinedWeb-style pipelines drop the
repeated SPANS while keeping the documents. This operator counts
exact-normalized line occurrences across the whole corpus and rewrites
each document without its over-represented lines. The reference has no
counterpart (danmaku are single lines); north-star op per
BASELINE.json.

Scale shape: explode lines → ONE map-side-combinable count shuffle on
the 8-byte line hash → broadcast-or-shuffle join of the hot-line set
back onto the exploded lines (the hot set is tiny by definition:
lines repeated ≥ min_count; AQE broadcasts it) → per-document
reassembly via collect_list(struct(pos, line)) + array_sort. The
reassembly buffer is bounded by document size (same bound as the
document itself), unlike the unbounded timeline case.

Semantics:
  * lines are split on '\n'; counting normalizes (trim + casefold) so
    formatting variants of one boilerplate line pool together, but the
    ORIGINAL line text is what survives into the rebuilt document;
  * whitespace-only lines are never counted and never dropped — they
    are formatting, not content, and dropping them would corrupt
    documents that merely share blank lines;
  * ``keep_first=False`` (default): every occurrence of a line seen
    ≥ min_count times is dropped (boilerplate removal);
    ``keep_first=True``: the single globally-first occurrence (by
    (doc id, position)) survives — C4's "all but one" convention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _lines(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return docs.select(
        F.col(id_col).alias("_id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("_pos", "_line"),
    ).withColumn(
        "_key",
        F.when(
            F.trim("_line") != "",
            F.xxhash64(F.lower(F.trim("_line"))),
        ),
    )


def hot_lines(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 2,
) -> DataFrame:
    """(line_key, n_occurrences) for normalized lines appearing at least
    ``min_count`` times corpus-wide — the audit view (join a sample of
    line text back for human review)."""
    return (
        _lines(docs, id_col, text_col)
        .filter(F.col("_key").isNotNull())
        .groupBy(F.col("_key").alias("line_key"))
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .filter(F.col("n_occurrences") >= min_count)
    )


def dedup_lines(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 2,
    keep_first: bool = False,
) -> DataFrame:
    """Rewrite ``text_col`` with over-represented lines removed; other
    columns pass through. Documents whose every line is dropped come
    back with empty text (they stay accounted for — filter downstream).
    """
    others = [c for c in docs.columns if c != text_col]
    lines = _lines(docs, id_col, text_col)
    hot = hot_lines(
        docs, id_col=id_col, text_col=text_col, min_count=min_count
    ).select(F.col("line_key").alias("_key"), F.lit(True).alias("_hot"))

    marked = lines.join(F.broadcast(hot), "_key", "left")
    if keep_first:
        # Rank ONLY the hot rows: a corpus-wide window over every line
        # would put all NULL-key (blank) lines into a single window
        # partition — one task sorting billions of rows at scale. The
        # hot subset is the boilerplate fraction; everything else is
        # trivially kept.
        w = Window.partitionBy("_key").orderBy("_id", "_pos")
        hot_rows = (
            lines.join(F.broadcast(hot.select("_key")), "_key")
            .withColumn("_rn", F.row_number().over(w))
        )
        marked = marked.join(
            hot_rows.filter(F.col("_rn") > 1).select(
                "_id", "_pos", F.lit(True).alias("_dup_occ")
            ),
            ["_id", "_pos"],
            "left",
        ).withColumn("_drop", F.col("_dup_occ").isNotNull())
    else:
        marked = marked.withColumn("_drop", F.col("_hot").isNotNull())

    rebuilt = (
        marked.filter(~F.col("_drop"))
        .groupBy("_id")
        .agg(
            F.concat_ws(
                "\n",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("_pos", "_line"))
                    ),
                    lambda s: s["_line"],
                ),
            ).alias("_new_text")
        )
    )
    out = docs.join(
        rebuilt.withColumnRenamed("_id", id_col), id_col, "left"
    )
    return out.select(
        *others,
        F.coalesce(F.col("_new_text"), F.lit("")).alias(text_col),
    ).select(*docs.columns)
