"""Tiered keyword scoring — native rebuild of reference UDF U1.

Reference semantics (hot/spark_energy.py:35-59, ``get_weighted_score``):
a 4-tier keyword dictionary; the FIRST tier (checked in declared order,
god→high→mid→noise) containing ANY keyword of the case-folded text wins;
null/empty text scores the default. A text holding both a noise word and a
god word scores the god weight — naive per-keyword weight sums are wrong
(SURVEY §7.4.2).

Rebuild: an ordered ``F.when`` chain over ``rlike`` alternations — pure
Catalyst expression, fully codegen'd, no Python worker. The dictionary is
injected as data (config), not hardcoded (the reference hardcodes CJK
keyword sets at hot/spark_energy.py:39-46).
"""

from __future__ import annotations

import re
from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

# Weights from hot/spark_energy.py:48-57; keyword sets are data, these
# defaults mirror the reference's tiers (god 5.0 / high 3.0 / mid 2.0 /
# noise 0.5 / default 1.0).
DEFAULT_TIERS: list[tuple[Sequence[str], float]] = [
    (["名场面", "泪目", "神作", "封神", "巅峰"], 5.0),
    (["666", "燃", "爆", "帅", "太强", "厉害"], 3.0),
    (["哈哈", "笑死", "草", "好看", "喜欢"], 2.0),
    (["第一", "签到", "打卡", "路过"], 0.5),
]
DEFAULT_SCORE = 1.0  # null/empty/no-match → 1.0 (hot/spark_energy.py:36,57)


def _alternation(keywords: Sequence[str]) -> str:
    # Substring containment (the UDF uses `kw in text`), so no anchors;
    # escape metacharacters since keywords are literals.
    return "|".join(re.escape(k) for k in keywords)


def tiered_score_expr(
    text: Column | str,
    tiers: Sequence[tuple[Sequence[str], float]] | None = None,
    default: float = DEFAULT_SCORE,
) -> Column:
    """Column expression implementing U1 tier-precedence scoring.

    ``tiers`` is an ordered list of (keywords, weight); first tier with any
    case-insensitive substring hit wins. Equivalent SQL (for oracles)::

        CASE WHEN lower(text) ~ '(t1kw1|t1kw2)' THEN w1
             WHEN lower(text) ~ '(t2kw1|...)'   THEN w2 ... ELSE default END
    """
    tiers = DEFAULT_TIERS if tiers is None else tiers
    col = F.lower(F.col(text) if isinstance(text, str) else text)
    expr: Column | None = None
    for keywords, weight in tiers:
        cond = col.rlike(_alternation(keywords))
        expr = F.when(cond, F.lit(weight)) if expr is None else expr.when(cond, F.lit(weight))
    assert expr is not None, "at least one tier required"
    # null text: `lower(null) rlike ...` is null → falls through to otherwise,
    # matching the UDF's `if not text: return 1.0` (hot/spark_energy.py:36).
    return expr.otherwise(F.lit(default))
