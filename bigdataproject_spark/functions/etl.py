"""Messy-string ETL — native rebuild of the reference tag pipeline's
cleaning step (F11/P9 composite, tag/main.py:52-57):

  * ``parse_cn_count``: "1.2万" → 12000.0 — digits extracted with
    regexp, multiplied by 10000 when the 万 (ten-thousands) unit marker
    is present, plain cast otherwise; unparseable → null.
  * ``clean_tag_transactions``: comma-joined tag string → non-empty
    array, exclusion-word filter, rating cast — the transaction-building
    ETL in front of FP-Growth (A7).

All pure Catalyst expressions (the reference does this with chained
withColumn + a CASE WHEN, same shape; here it's reusable and typed).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_NUM_PAT = r"([0-9]+\.?[0-9]*)"


def parse_cn_count(col: Column | str) -> Column:
    """Parse a CJK-unit count string ("1.2万" → 12000.0, "850" → 850.0).

    Reference: tag/main.py:52-54 — regexp-extract the number, ×10000 iff
    the string contains 万. try_cast keeps unparseable input null under
    ANSI mode (the reference relied on legacy-cast null semantics)."""
    c = F.col(col) if isinstance(col, str) else col
    num = F.regexp_extract(c, _NUM_PAT, 1).try_cast("double")
    return F.when(c.contains("万"), num * 10000).otherwise(num)


def clean_tag_transactions(
    df: DataFrame,
    *,
    tags_col: str,
    rating_col: str,
    exclude_words: Sequence[str] = (),
    sep: str = ",",
) -> DataFrame:
    """tags string → ``tags_arr`` array + ``rating`` double, dropping rows
    with empty tag sets, null ratings, or excluded tag words
    (tag/main.py:55-57's compound filter)."""
    out = df.withColumn(
        "tags_arr",
        F.filter(F.split(F.col(tags_col), sep), lambda t: t != ""),
    ).withColumn("rating", F.col(rating_col).try_cast("double"))
    cond = (F.size("tags_arr") > 0) & F.col("rating").isNotNull()
    for w in exclude_words:
        cond = cond & ~F.array_contains("tags_arr", w)
    return out.filter(cond)
