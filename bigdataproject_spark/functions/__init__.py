"""Scalar/array function surface (SURVEY §2.8, §2.10).

Every reference Python UDF is rebuilt as a native Catalyst expression so
plans stay inside WholeStageCodegen (no JVM→Python row round-trips):

  * U1 tiered sentiment score  -> :mod:`scoring` (ordered when-chain)
  * U3 entity extraction       -> :mod:`entities` (higher-order array fns)
  * U2 tokenization            -> :mod:`tokenize` (regex native; jieba
    pandas_udf only if the lib is present)
"""

from bigdataproject_spark.functions.entities import extract_entities_expr
from bigdataproject_spark.functions.scoring import tiered_score_expr
from bigdataproject_spark.functions.tokenize import tokenize_expr
from bigdataproject_spark.functions.vectors import cosine_similarity, dot, l2_norm

__all__ = [
    "extract_entities_expr",
    "tiered_score_expr",
    "tokenize_expr",
    "cosine_similarity",
    "dot",
    "l2_norm",
]
