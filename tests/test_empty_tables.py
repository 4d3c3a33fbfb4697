"""Every registry query must complete on ZERO-ROW tables — the canonical
100TB edge case (empty partitions, empty date slices, filters that match
nothing). Round-1 verified this with an ad-hoc sweep after fixing
KMeans-on-empty and PageRank's 1/n; this test pins it permanently.

Each query is forced end-to-end with a noop sink (full plan execution,
no driver collect); any INVALID_PARAMETER_VALUE / divide-by-zero /
empty-fit regression surfaces as a hard failure.
"""

from __future__ import annotations

import pytest

from bigdataproject_spark.queries import registry
from bigdataproject_spark.schemas import TESTDATA_TABLES

REG = registry()


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory) -> str:
    root = tmp_path_factory.mktemp("sf0")
    for name, schema in TESTDATA_TABLES.items():
        spark.createDataFrame([], schema).write.mode("overwrite").parquet(
            str(root / f"{name}.parquet")
        )
    return str(root)


@pytest.mark.parametrize("name", sorted(REG))
def test_query_completes_on_empty_tables(spark, empty_sf_dir, name):
    df = REG[name].fn(spark, empty_sf_dir)
    df.write.mode("overwrite").format("noop").save()


def _extra():
    from bigdataproject_spark.queries_pipeline import EXTRA_PARITY

    return EXTRA_PARITY


@pytest.mark.parametrize("name", sorted(_extra()))
def test_extra_parity_completes_on_empty_tables(spark, empty_sf_dir, name):
    """EXTRA_PARITY queries (outside the 50-entry registry) get the
    same zero-row gate as registry entries."""
    df = _extra()[name].fn(spark, empty_sf_dir)
    df.write.mode("overwrite").format("noop").save()
