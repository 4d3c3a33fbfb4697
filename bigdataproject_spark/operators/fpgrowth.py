"""FP-Growth frequent-itemset / association-rule mining (SURVEY §2.12).

Thin, parameterized wrapper over ``pyspark.ml.fpm.FPGrowth`` — the
reference hardcodes minSupport=0.05 / minConfidence=0.3
(tag/main.py:187-188, tag/fp_growth_analysis.py:69-70). MLlib's
implementation is the distributed PFP (parallel FP-Growth): item-frequency
count, per-partition conditional FP-trees, pattern growth — all JVM-side,
no Python boundary, and already the right algorithm at scale.
"""

from __future__ import annotations

from pyspark.ml.fpm import FPGrowth
from pyspark.sql import DataFrame


def fit_fpgrowth(
    transactions: DataFrame,
    *,
    items_col: str = "items",
    min_support: float = 0.05,
    min_confidence: float = 0.3,
):
    """Fit an FPGrowth model on an array<string> transaction column."""
    fp = FPGrowth(
        itemsCol=items_col, minSupport=min_support, minConfidence=min_confidence
    )
    return fp.fit(transactions)


def mine_itemsets(transactions: DataFrame, **kw) -> DataFrame:
    """freqItemsets: (items array<string>, freq long) — tag/main.py:191."""
    return fit_fpgrowth(transactions, **kw).freqItemsets


def mine_association_rules(transactions: DataFrame, **kw) -> DataFrame:
    """associationRules: (antecedent, consequent, confidence, lift,
    support) — tag/main.py:194."""
    return fit_fpgrowth(transactions, **kw).associationRules
