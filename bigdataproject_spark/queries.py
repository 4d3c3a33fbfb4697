"""Driver-contract query registry.

Each entry pairs a Spark DataFrame builder ``(spark, sf_dir) -> DataFrame``
with an equivalent DuckDB oracle SQL string (or None for ops that aren't
SQL-expressible — the driver then records a rows-only check).

Determinism rules applied to every hash-checked query (SURVEY §7.4.3):
  * every computed column is aliased identically in Spark and SQL;
  * double aggregates are rounded (4-6dp) on BOTH sides before comparison
    (summation order differs between engines at the last ulp);
  * window orderings use rounded keys + explicit tiebreakers;
  * timestamps in output are converted to epoch seconds / formatted strings
    so engine-specific timezone handling can't skew the hash.
"""

from __future__ import annotations

from bigdataproject_spark.contract import Query
from bigdataproject_spark.queries_extended import EXTENDED_QUERIES
from bigdataproject_spark.queries_graph import GRAPH_QUERIES
from bigdataproject_spark.queries_pipeline import PIPELINE_QUERIES
from bigdataproject_spark.queries_reference import REFERENCE_QUERIES
from bigdataproject_spark.queries_relational import RELATIONAL_QUERIES


def registry() -> dict[str, Query]:
    out: dict[str, Query] = {}
    for group in (
        REFERENCE_QUERIES,
        GRAPH_QUERIES,
        RELATIONAL_QUERIES,
        PIPELINE_QUERIES,
        EXTENDED_QUERIES,
    ):
        for name, q in group.items():
            assert name not in out, f"duplicate query name {name}"
            out[name] = q
    return out
