"""Mirror of the driver's DuckDB-oracle check at sf0.001: every query in
the registry must carry an oracle (50/50 since r3) and match it on
columns + row multiset."""

from __future__ import annotations

import pytest

from bigdataproject_spark.oracle import compare, run_oracle
from bigdataproject_spark.queries import registry

REG = registry()
WITH_ORACLE = sorted(n for n, q in REG.items() if q.oracle is not None)


def test_every_query_is_oracled():
    """Since the r3 portable-sketch promotion there are no rows-only
    entries left; a query regressing to oracle=None is a coverage loss
    the driver would silently downgrade to a weaker check."""
    assert WITH_ORACLE == sorted(REG)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_parity(spark, sf_dir, name):
    q = REG[name]
    df = q.fn(spark, sf_dir)
    cols, rows = run_oracle(q.oracle, sf_dir)
    problems = compare(df, cols, rows)
    assert not problems, f"{name}: " + "; ".join(problems)


def _extra_parity():
    from bigdataproject_spark.queries_pipeline import EXTRA_PARITY

    return EXTRA_PARITY


@pytest.mark.parametrize("name", sorted(_extra_parity()))
def test_extra_oracle_parity(spark, sf_dir, name):
    """Oracled queries kept OUTSIDE the 50-entry registry (e.g. the
    standalone chunk query whose registry slot merged into
    chunk_pack_sequences) get the same compare, so their oracles stay
    exercised instead of rotting as dead code."""
    q = _extra_parity()[name]
    df = q.fn(spark, sf_dir)
    cols, rows = run_oracle(q.oracle, sf_dir)
    problems = compare(df, cols, rows)
    assert not problems, f"{name}: " + "; ".join(problems)


def test_oracle_result_types_are_fetch_portable(sf_dir):
    """Every oracle's DuckDB result schema must stay inside the set of
    types that round-trip identically through every fetch path
    (fetchall / arrow / pandas). The r10–r12 span red cells were an
    uncast ``sum()`` escaping as HUGEINT: value-equal under fetchall()
    (this suite and tools/drive_contract.py were blind for three
    rounds) but decimal128/"83.0" under an arrow/pandas fetch — which
    is how the external driver read it. DESCRIBE only plans, so this
    covers all 60+ oracles in seconds."""
    import duckdb

    from bigdataproject_spark.oracle import TESTDATA_TABLES
    from bigdataproject_spark.queries_pipeline import EXTRA_PARITY

    portable = {
        "BIGINT", "INTEGER", "SMALLINT", "TINYINT", "DOUBLE", "FLOAT",
        "VARCHAR", "BOOLEAN", "DATE", "TIMESTAMP",
        "JSON",  # proven green on the driver (energy_timeline_nested)
    }
    con = duckdb.connect()
    try:
        for name in TESTDATA_TABLES:
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
            )
        offenders = []
        for name, q in {**REG, **EXTRA_PARITY}.items():
            if q.oracle is None:
                continue
            for col, typ in [
                (r[0], r[1])
                for r in con.execute(f"DESCRIBE {q.oracle}").fetchall()
            ]:
                if typ not in portable:
                    offenders.append((name, col, typ))
        assert not offenders, (
            "oracle columns with fetch-path-dependent types (cast them "
            f"to BIGINT/DOUBLE/VARCHAR in the oracle SQL): {offenders}"
        )
    finally:
        con.close()


def test_registry_fits_driver_cap():
    """The external correctness run verifies at most 50 registry
    queries. Exceeding the cap does not fail anything — it silently
    rotates the tail entries out of the externally hash-checked set
    (bitten twice: r1 shipped 54 and four went unchecked; r8 inserted
    entry #51 and the nested-timeline query lost its standing driver
    row). Hold the line structurally: grow coverage by consolidating
    same-family entries and parking standalone variants in
    EXTRA_PARITY, never by exceeding the cap."""
    assert len(REG) <= 50, (
        f"registry has {len(REG)} entries; the driver checks at most 50 "
        f"— consolidate same-family entries (see EXTRA_PARITY)"
    )
