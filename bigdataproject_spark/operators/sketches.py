"""Portable distinct-count sketch (HyperLogLog) built from explicit
register aggregates — the engine-agnostic upgrade of SURVEY §2.4's
``approx_count_distinct``.

Why not ``F.approx_count_distinct``? Its HLL++ sketch (bias-corrected,
engine-internal hash) is Spark-specific, so the driver's DuckDB oracle
can only row-count it. This module implements classic Flajolet HLL
(2^p registers, register = max leading-zero rank) from *portable*
primitives — ``md5``/``substr``/hex-parse, integer bit ops,
``length(bin(x))`` — that evaluate identically in Spark SQL and DuckDB,
so the per-key estimate hash-matches an ANSI-SQL oracle exactly.

Accuracy: standard error 1.04/sqrt(m) ≈ 1.6% at p=12, plus the
linear-counting small-range correction (E ≤ 2.5m and empty registers
present → m·ln(m/V)); both regimes are bound-tested at sf and sf1 in
``tests/test_approx_bounds.py``.

100 TB design: this is the textbook distributed HLL shape —
  1. one map pass computes (bucket, rho) per row (md5 + bit ops, all
     whole-stage codegen);
  2. ``groupBy(key, bucket).max(rho)`` — map-side combinable, shuffle
     cardinality ≤ keys × m rows regardless of input size;
  3. ``groupBy(key)`` folds the ≤m registers per key into the estimate
     with an INTEGER register sum (Σ 2^(49−M) as bigint, exact — no
     float-summation-order divergence between engines), one double
     division at the end.
The built-in ``approx_count_distinct`` remains the right call when
oracle portability doesn't matter; ``tests/test_approx_bounds.py``
pins both within the same ε of exact.

Reference: no counterpart (the reference computes exact distincts only,
tag/data_analysis.py groupBy paths); this is a north-star scale op.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# register-index bits: m = 2^12 = 4096 registers, 48 rank bits
HLL_P = 12
HLL_M = 1 << HLL_P
_RANK_BITS = 60 - HLL_P  # md5 prefix parsed to 60 bits (15 hex chars)
_RHO_MAX = _RANK_BITS + 1  # 49: rank when the 48-bit window is all zeros
# α_m·m² for m=4096, precomputed so both engines divide by the SAME
# double literal (no cross-engine expression-ordering concerns):
HLL_ALPHA_MM = 0.7213 / (1 + 1.079 / HLL_M) * HLL_M * HLL_M  # 12098218.894406674
_POW2_49 = float(1 << (_RANK_BITS + 1))  # 562949953421312.0


def hll_count_distinct(
    df: DataFrame, *, key: str, value_col: str
) -> DataFrame:
    """Per-``key`` portable-HLL distinct estimate of ``value_col``.

    Returns (key, approx_users bigint). The estimate is deterministic
    and engine-portable: every intermediate is integer-exact except the
    final α·m²/S division and the linear-counting ``ln`` — both computed
    from identical integer operands in either engine.
    """
    # 60-bit portable hash: first 15 md5 hex chars, parsed base-16
    h = F.conv(
        F.substring(F.md5(F.col(value_col).cast("string")), 1, 15), 16, 10
    ).cast("long")
    bucket = h.bitwiseAND(F.lit(HLL_M - 1))
    w = F.shiftright(h, HLL_P)  # remaining 48 rank bits
    # rho = leading zeros in the 48-bit window + 1 = 49 − bit_length(w);
    # length(bin(w)) is the portable bit_length (minimal binary string in
    # both engines; w=0 special-cased to the max rank).
    rho = F.when(w == 0, F.lit(_RHO_MAX)).otherwise(
        F.lit(_RHO_MAX) - F.length(F.bin(w))
    )

    # NULLs are excluded (matching count(DISTINCT ...) semantics); without
    # the filter a NULL value would land in a NULL register bucket that
    # count(*) sees but the isum sum skips, biasing v by one.
    registers = (
        df.filter(F.col(value_col).isNotNull())
        .select(F.col(key), bucket.alias("_b"), rho.alias("_rho"))
        .groupBy(key, "_b")
        .agg(F.max("_rho").alias("_m"))
    )
    # Integer-exact register fold: Σ_j 2^(−M_j) over PRESENT registers
    # = (Σ_j 2^(49−M_j)) / 2^49, with the Σ kept as a bigint (max
    # 4096·2^48 = 2^60 < 2^63). Absent registers contribute 2^0 = 1 each,
    # i.e. the V term below.
    folded = registers.groupBy(key).agg(
        (F.lit(HLL_M) - F.count(F.lit(1))).alias("_v"),
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {_RHO_MAX} - _m)")).alias(
            "_isum"
        ),
    )
    e_raw = F.lit(HLL_ALPHA_MM) / (
        F.col("_v") + F.col("_isum") / F.lit(_POW2_49)
    )
    est = F.when(
        (e_raw <= F.lit(2.5 * HLL_M)) & (F.col("_v") > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / F.col("_v")),
    ).otherwise(e_raw)
    return folded.select(
        F.col(key),
        F.round(est, 0).cast("long").alias("approx_users"),
    )


def hll_oracle_cte(*, table: str, key: str, value_col: str) -> str:
    """The DuckDB-portable ANSI SQL mirror of :func:`hll_count_distinct`
    (same constants, same integer registers, same fold), as a SELECT
    yielding (key, approx_users). Kept next to the Spark implementation
    so the two can never drift independently."""
    m = HLL_M
    return f"""
SELECT {key},
       CAST(round(CASE WHEN e_raw <= {2.5 * m} AND v > 0
                       THEN {float(m)!r} * ln({float(m)!r} / v)
                       ELSE e_raw END, 0) AS BIGINT) AS approx_users
FROM (
  SELECT {key}, v, {HLL_ALPHA_MM!r} / (v + isum / {_POW2_49!r}) AS e_raw
  FROM (
    SELECT {key},
           {m} - count(*) AS v,
           sum(CAST(1 AS BIGINT) << ({_RHO_MAX} - mx)) AS isum
    FROM (
      SELECT {key},
             max(CASE WHEN (h >> {HLL_P}) = 0 THEN {_RHO_MAX}
                      ELSE {_RHO_MAX} - length(bin(h >> {HLL_P})) END) AS mx
      FROM (
        SELECT {key},
               CAST(concat('0x', substr(md5(CAST({value_col} AS VARCHAR)), 1, 15))
                    AS BIGINT) AS h
        FROM {table} WHERE {value_col} IS NOT NULL
      ) GROUP BY {key}, h & {m - 1}
    ) GROUP BY {key}
  )
)
"""
