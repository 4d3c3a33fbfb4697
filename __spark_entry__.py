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
    """DuckDB-equivalent SQL per query (47 of 50 — FP-Growth via exact
    subset enumeration, minhash-LSH/simhash/winnowing via portable md5
    hash families computed identically by both engines). Omitted only
    where the approximation itself is engine-specific: HyperLogLog
    (approx_distinct_users), MLlib KMeans centroids (ann_ivf_topk), and
    the approx_percentile sketch (energy_approx_flag) — each bound-tested
    against exact results in tests/ instead."""
    return {name: q.oracle for name, q in registry().items() if q.oracle is not None}
