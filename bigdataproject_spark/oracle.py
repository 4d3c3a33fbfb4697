"""Local DuckDB-oracle harness mirroring the driver's correctness check:
run the Spark query and the oracle SQL on the same parquet tables, compare
row count + column names + order-insensitive values.

Used by tests/test_oracle_parity.py so oracle drift is caught before the
driver's per-round CORRECTNESS run.
"""

from __future__ import annotations

import math
from typing import Any

import duckdb

from bigdataproject_spark.schemas import TESTDATA_TABLES


def run_oracle(sql: str, sf_dir: str) -> list[tuple]:
    con = duckdb.connect()
    try:
        for name in TESTDATA_TABLES:
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
            )
        cur = con.execute(sql)
        cols = [d[0] for d in cur.description]
        return cols, cur.fetchall()
    finally:
        con.close()


def _norm_cell(v: Any) -> Any:
    """Normalize a cell for cross-engine comparison the way a value-hash
    would see it: Decimal→float, datetime→isoformat, bool stays bool."""
    import datetime
    import decimal

    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if isinstance(v, list):
        return tuple(_norm_cell(x) for x in v)
    return v


def _sort_key(v: Any) -> Any:
    """None-safe, mixed-type-safe ordering key: Python 3 refuses to order
    None against non-None (legitimate in left-join / null-agg outputs), so
    rank cells by (type-class, value) recursively."""
    if v is None:
        return (0, "")
    if isinstance(v, tuple):
        return (3, tuple(_sort_key(x) for x in v))
    if isinstance(v, bool):
        return (1, str(v))
    if isinstance(v, (int, float)):
        return (2, v)
    return (1, str(v))


def compare(spark_df, oracle_cols: list[str], oracle_rows: list[tuple]) -> list[str]:
    """Return a list of mismatch descriptions (empty → parity).

    Columns are matched by (sorted) name; rows are compared as sorted
    multisets of normalized tuples — the order-insensitive equivalent of
    the driver's value hash.
    """
    problems: list[str] = []
    s_cols = spark_df.columns
    if sorted(s_cols) != sorted(oracle_cols):
        problems.append(f"columns differ: spark={sorted(s_cols)} oracle={sorted(oracle_cols)}")
        return problems
    s_rows = spark_df.collect()
    if len(s_rows) != len(oracle_rows):
        problems.append(f"row count differs: spark={len(s_rows)} oracle={len(oracle_rows)}")
    order = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
    o_order = sorted(range(len(oracle_cols)), key=lambda i: oracle_cols[i])
    s_set = sorted(
        (tuple(_norm_cell(r[i]) for i in order) for r in (tuple(r) for r in s_rows)),
        key=_sort_key,
    )
    o_set = sorted(
        (tuple(_norm_cell(r[i]) for i in o_order) for r in oracle_rows),
        key=_sort_key,
    )
    for i, (a, b) in enumerate(zip(s_set, o_set)):
        if a != b:
            problems.append(f"first differing row (sorted) #{i}: spark={a!r} oracle={b!r}")
            break
    if not problems and len(s_set) != len(o_set):
        problems.append("row multiset length mismatch")
    return problems
