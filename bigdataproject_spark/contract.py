"""Query contract type shared by the registry modules."""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    """One driver-checkable query: Spark builder + DuckDB oracle SQL.

    ``oracle is None`` marks a non-SQL-expressible op (FP-Growth, LSH,
    sketches) — the driver records a weaker rows-only check for those.
    """

    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
