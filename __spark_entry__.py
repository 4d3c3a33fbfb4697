"""Driver contract for the spark-graft builder (PySpark target).

entry() runs the flagship high-energy query (SURVEY §3.1) at sf0.001;
queries()/oracle_sql() expose the full operator registry of
``bigdataproject_spark`` (SURVEY §2 inventory + north-star pipeline ops).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from bigdataproject_spark.queries import registry

_SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from bigdataproject_spark.queries_reference import q_energy_timeline

    return q_energy_timeline(spark, _SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (50 of 50 — FP-Growth via exact
    subset enumeration; minhash-LSH/simhash/winnowing/HLL via portable
    md5 hash families computed identically by both engines; the IVF
    coarse quantizer via a deterministic-sample snapshot; the adaptive
    top-decile flag via a deterministic histogram quantile). Each
    approximate operator is additionally ε-bound-tested against the
    exact computation at sf and sf1 in tests/test_approx_bounds.py and
    tests/test_ivf.py."""
    return {name: q.oracle for name, q in registry().items() if q.oracle is not None}
