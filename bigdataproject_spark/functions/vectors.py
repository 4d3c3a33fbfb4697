"""Vector math over array<float|double> columns — all native expressions.

Used by the similarity-search and embedding-dedup operators. Everything is
``F.zip_with`` / ``F.aggregate`` (JVM higher-order functions), so the hot
path never leaves the executor JVM; at 100TB the dominant cost is the scan
plus the (broadcast) join against the query set, not the arithmetic.

Arithmetic is done in double regardless of storage type (embeddings store
float32) so results are stable and match a double-precision oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _as_double(col: Column) -> Column:
    return col.cast("array<double>")


def dot(a: Column | str, b: Column | str) -> Column:
    """Σ aᵢ·bᵢ (double)."""
    prod = F.zip_with(_as_double(_c(a)), _as_double(_c(b)), lambda x, y: x * y)
    return F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column | str) -> Column:
    """‖a‖₂ (double)."""
    return F.sqrt(F.aggregate(_as_double(_c(a)), F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """dot(a,b) / (‖a‖‖b‖); null if either norm is 0."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot(a, b) / denom)
