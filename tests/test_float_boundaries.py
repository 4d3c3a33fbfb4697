"""Exact-rational boundary-distance guard for the rounded float columns
that remain in the hashed registry (the r11 float audit's structural
guard — see PLANS.md "r11 float audit").

The r10 driver hash failure (`span_dedup_report.dup_frac`) was a
`round(ratio, n)` column whose value class can land ON a decimal
half-boundary, where two engines' rounding legitimately differs in the
last bit. The audit ELIMINATED that class (class A: rounded integer
ratios → unrounded divisions or integers). The rounded columns that
remain are class B/C — continuous or quantized value classes where a
half-boundary tie is measure-zero or impossible by parity. This test
turns that adjudication from an argument into a checked invariant: for
each remaining rounded column FAMILY it recomputes the UNROUNDED value
in DuckDB over the test data and asserts every value's distance to the
nearest half-boundary at the emitted precision exceeds the
cross-engine ULP envelope by orders of magnitude. A future data
regeneration that drifts a value onto a boundary fails loudly here
instead of silently flipping a driver hash.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

# Margin: pre-round cross-engine ULP noise is ~1e-12 relative (sum-order
# differences); after scaling by 10^dp the nearest observed frac must
# stay far above it. 1e-6 gives ~10^3-10^6x headroom while keeping the
# false-trip probability per value ~2e-6.
MIN_FRAC_DISTANCE = 1e-6

_COS = (
    "list_dot_product(a.v, b.v) / (sqrt(list_dot_product(a.v, a.v)) * "
    "sqrt(list_dot_product(b.v, b.v)))"
)

# name -> (decimal places of the emitted round(), probe SQL yielding the
# UNROUNDED pre-round doubles in a column `v`). Probes reproduce the
# query's actual grouping so the checked values are the emitted ones.
PROBES: dict[str, tuple[int, str]] = {
    # NOTE: q1 sum_disc_price/sum_charge, q3/q5 revenue, and
    # stats_agg.avg_bal are NOT probed — these probes caught them
    # sitting exactly ON half-boundaries (per-order revenue 49574.425,
    # avg_bal 4190.83825), so they were converted to the exact-decimal
    # discipline (_exact_sum_scaled / cents-sum) and no longer round.
    "q1_sum_qty": (
        2,
        "SELECT sum(l_quantity) AS v FROM lineitem "
        "GROUP BY l_returnflag, l_linestatus",
    ),
    "q1_sum_base_price": (
        2,
        "SELECT sum(l_extendedprice) AS v FROM lineitem "
        "GROUP BY l_returnflag, l_linestatus",
    ),
    "q1_avg_disc": (
        4,
        "SELECT avg(l_discount) AS v FROM lineitem "
        "GROUP BY l_returnflag, l_linestatus",
    ),
    "stats_agg_std_bal": (
        4,
        "SELECT stddev_samp(c_acctbal) AS v FROM customer "
        "GROUP BY c_mktsegment",
    ),
    "date_monthly_sum_price": (
        2,
        "SELECT sum(o_totalprice) AS v FROM orders "
        "GROUP BY date_trunc('month', o_orderdate)",
    ),
    "energy_sentiment": (
        4,
        "SELECT sum(value) AS v FROM events "
        "GROUP BY event_type, CAST(floor(epoch(ts)/10)*10 AS BIGINT)",
    ),
    "energy_blend": (
        6,
        "SELECT 0.37*sum(value) + 0.63*count(*) AS v FROM events "
        "GROUP BY event_type, CAST(floor(epoch(ts)/10)*10 AS BIGINT)",
    ),
    "quantiles": (
        6,
        "SELECT unnest([quantile_cont(value, 0.25), quantile_cont(value, 0.5),"
        " quantile_cont(value, 0.75)]) AS v FROM events GROUP BY event_type",
    ),
    "sessionize_duration": (
        3,
        "SELECT max(epoch(ts)) - min(epoch(ts)) AS v FROM events "
        "GROUP BY user_id",
    ),
    "window_moving_avg3": (
        4,
        "SELECT avg(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY "
        "o_orderdate, o_orderkey ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) "
        "AS v FROM orders",
    ),
    "window_running_total": (
        2,
        "SELECT sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY "
        "o_orderdate, o_orderkey) AS v FROM orders",
    ),
    # identity-class: round(x, 2) of stored doubles — the stored value
    # IS the pre-round value
    "stored_prices": (2, "SELECT o_totalprice AS v FROM orders"),
    "stored_acctbal": (2, "SELECT c_acctbal AS v FROM customer"),
    "stored_event_value": (2, "SELECT value AS v FROM events"),
    # cosine family (6dp) — pairwise within label blocks (the
    # embedding_neardup join) bounds the probe to the emitted pair set
    "cosine_neardup": (
        6,
        f"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings)
            SELECT {_COS} AS v FROM e a
            JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id""",
    ),
}


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


@pytest.mark.parametrize("name", sorted(PROBES))
def test_rounded_values_stay_off_half_boundaries(con, name):
    dp, sql = PROBES[name]
    scale = 10**dp
    worst = 1.0
    n = 0
    for (v,) in con.execute(sql).fetchall():
        if v is None:
            continue
        n += 1
        frac = math.fabs(v) * scale % 1.0
        dist = abs(frac - 0.5)
        worst = min(worst, dist)
    assert n > 0, f"{name}: probe returned no values"
    assert worst > MIN_FRAC_DISTANCE, (
        f"{name}: a value sits {worst:.2e} from a {dp}dp half-boundary "
        f"(< {MIN_FRAC_DISTANCE}) — cross-engine rounding of this column "
        f"is no longer safe on this data; convert it to the unrounded/"
        f"integer discipline (see PLANS.md r11 float audit)"
    )
