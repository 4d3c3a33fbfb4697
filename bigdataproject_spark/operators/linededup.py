"""Corpus-level line deduplication (boilerplate removal).

Web corpora repeat navigation chrome, cookie banners, and footers
across millions of pages; C4 and RefinedWeb-style pipelines drop the
repeated SPANS while keeping the documents. This operator counts
exact-normalized line occurrences across the whole corpus and rewrites
each document without its over-represented lines. The reference has no
counterpart (danmaku are single lines); north-star op per
BASELINE.json.

Scale shape: explode lines → ONE map-side-combinable aggregation on
the 8-byte line hash (count + min(struct(doc, pos)) — both partial-agg
friendly, so a line occurring 10^9 times costs its combiner-reduced
count, never a 10^9-row task) → join of the hot-line set back onto the
exploded lines → per-document reassembly via
collect_list(struct(pos, line)) + array_sort. The hot-set join carries
NO broadcast hint: with the default ``min_count=2`` a web-scale corpus
can have billions of qualifying lines, so a pinned broadcast is a
guaranteed OOM — AQE converts to broadcast at runtime exactly when the
measured hot-set size is actually small. The reassembly buffer is
bounded by document size (same bound as the document itself), unlike
the unbounded timeline case.

Semantics:
  * lines are split on ``\\r\\n?|\\n`` and rejoined with ``\\n`` — CRLF,
    LF, AND lone-CR (classic-Mac) corpora all come back LF-normalized,
    and a CR-delimited variant of a line pools with its LF twin in
    counting (the alternative, preserving a stray ``\\r``, poisons
    downstream exact-hash dedup);
  * counting normalizes (trim + casefold) so formatting variants of
    one boilerplate line pool together, but the ORIGINAL line text is
    what survives into the rebuilt document;
  * whitespace-only lines are never counted and never dropped — they
    are formatting, not content, and dropping them would corrupt
    documents that merely share blank lines;
  * ``keep_first=False`` (default): every occurrence of a line seen
    ≥ min_count times is dropped (boilerplate removal);
    ``keep_first=True``: the single globally-first occurrence (by
    (doc id, position)) survives — C4's "all but one" convention. The
    first occurrence is ``min(struct(doc, pos))`` computed inside the
    same count aggregation: no per-key window, so a single hot line
    never serializes into one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _lines(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return docs.select(
        F.col(id_col).alias("_id"),
        F.posexplode(F.split(F.col(text_col), r"\r\n?|\n")).alias(
            "_pos", "_line"
        ),
    ).withColumn(
        "_key",
        F.when(
            F.trim("_line") != "",
            F.xxhash64(F.lower(F.trim("_line"))),
        ),
    )


def _hot_stats(
    docs: DataFrame, *, id_col: str, text_col: str, min_count: int
) -> DataFrame:
    """(_key, _n, _first) for normalized lines appearing ≥ min_count
    times — one combinable shuffle (partial count + partial min)."""
    return (
        _lines(docs, id_col, text_col)
        .filter(F.col("_key").isNotNull())
        .groupBy("_key")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.min(F.struct("_id", "_pos")).alias("_first"),
        )
        .filter(F.col("_n") >= min_count)
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
    return _hot_stats(
        docs, id_col=id_col, text_col=text_col, min_count=min_count
    ).select(
        F.col("_key").alias("line_key"), F.col("_n").alias("n_occurrences")
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
    hot = _hot_stats(
        docs, id_col=id_col, text_col=text_col, min_count=min_count
    ).select("_key", "_first")

    marked = lines.join(hot, "_key", "left")
    if keep_first:
        # globally-first occurrence of a hot line survives; the keep
        # mark is an equality against the pre-aggregated min struct —
        # no window, no per-key ordering task.
        drop = F.col("_first").isNotNull() & ~(
            (F.col("_id") == F.col("_first._id"))
            & (F.col("_pos") == F.col("_first._pos"))
        )
    else:
        drop = F.col("_first").isNotNull()
    marked = marked.withColumn("_drop", drop)

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
