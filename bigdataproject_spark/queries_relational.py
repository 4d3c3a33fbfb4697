"""Generic relational query surface over the TPC-H-ish testdata
(SURVEY §2.3 joins, §2.4 aggregations, §2.5 windows, §2.6 sort/limit,
§2.7 set ops, §2.8 scalar fns — the capabilities the engine exposes beyond
the reference's four pipelines).

Scale/plan notes applied throughout:
  * dimension tables (region, nation, supplier, customer-at-small-SF) are
    broadcast — no shuffle on the fact side;
  * aggregates are expressed on DataFrames so HashAggregate partial+final
    (map-side combine) applies;
  * top-k uses orderBy+limit → TakeOrderedAndProject (per-partition heap,
    no global sort);
  * every window has a deterministic tiebreaker; every double aggregate is
    rounded identically in the DuckDB oracle.
  * NO presentation orderBy on any final result (r12 optimization round):
    the driver's value-hash canonicalizes by sorting rows, so a final
    global sort buys nothing and costs a range exchange + sort — one
    extra AQE stage per query at bench scale and a full extra pass over
    large outputs at 100 TB (guide §2.4: "an orderBy used only to make
    output deterministic" is an accidental shuffle; precedent:
    dedup_exact and textstats_quality have shipped sort-free and
    driver-green since r3/r10). Sorts that feed a ``limit`` stay — they
    compile to TakeOrderedAndProject and are semantic (top-k).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdataproject_spark.contract import Query as _q
from bigdataproject_spark.operators.sketches import hll_count_distinct, hll_oracle_cte
from bigdataproject_spark.sources.readers import load_table


# --- TPC-H-style aggregates & joins -----------------------------------------


def _exact_sum_scaled(expr, scale: int):
    """Exact-decimal aggregation for sums of per-row PRICE PRODUCTS
    (r11 float audit): quantize each row to an integer at ``scale``
    (both engines round the IDENTICAL product double with one-arg
    round — deterministic even exactly on a tie, unlike round(x, n)'s
    multiply-then-round), sum the integers exactly in decimal(38,0)
    (order-free — float sums of 4dp-rationals can sit ON a 2dp
    half-boundary: the boundary probe caught per-order revenues like
    49574.425), then ONE division back to units (identical integers →
    identical double on every engine). SQL mirror:
    ``CAST(sum(CAST(round(e * scale) AS BIGINT)) AS DOUBLE) / scale.0``"""
    q = F.round(expr * F.lit(scale)).cast("decimal(38,0)")
    return F.sum(q).cast("double") / F.lit(float(scale))


_SPLIT = 1 << 20  # hi/lo split radix for overflow-proof LONG sums


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-heavy multi-measure hash aggregate; the filter
    and 4-column projection push into the parquet scan.

    sum_disc_price / sum_charge use exact-integer aggregation at 1e4 /
    1e6 per-item precision: their per-row products are near-4dp
    rationals whose float sums can land exactly ON a 2dp half-boundary,
    where two engines' round() legitimately disagree (r11 float audit).
    Because this query is pure scan+agg, the decimal(38,0) sum of
    :func:`_exact_sum_scaled` is its dominant cost (measured 4.3 s vs
    0.84 s float at sf10) — so q1 splits each quantized long into
    hi = q DIV 2^20 / lo = q % 2^20, sums BOTH as plain longs (codegen
    long adds, 1.8 s), and recombines exactly in decimal once per
    OUTPUT ROW: hi·2^20 + lo. Overflow bound: lo needs n ≤ 2^43 rows
    per group, hi (charge e6, row max ~2^37/2^20 = 2^17) n ≤ 2^46 —
    petabytes of lineitem per group, and Spark's ANSI sum errors
    loudly beyond. The DuckDB oracle keeps the plain one-sum form: its
    BIGINT sums widen to HUGEINT, so both engines produce the same
    exact integer and hence the same final double. sum_qty /
    sum_base_price stay plainly rounded — integer-valued and
    2dp-quantized inputs terminate before the tie digit, so no
    boundary exists (guarded by tests/test_float_boundaries)."""
    li = load_table(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc * (1 + F.col("l_tax"))
    agg = (
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp"))
        .withColumn("_qd", F.round(disc * F.lit(10_000)).cast("long"))
        .withColumn("_qc", F.round(charge * F.lit(1_000_000)).cast("long"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.expr(f"sum(_qd DIV {_SPLIT})").alias("_dh"),
            F.expr(f"sum(_qd % {_SPLIT})").alias("_dl"),
            F.expr(f"sum(_qc DIV {_SPLIT})").alias("_ch"),
            F.expr(f"sum(_qc % {_SPLIT})").alias("_cl"),
            # avg_qty unrounded (r11 float audit): l_quantity is
            # integer-valued, so the sum is exact in any order and the
            # avg is a single IEEE division — bit-identical on both
            # engines; round(int-ratio, 4) was the half-boundary
            # hazard. avg_disc stays rounded: l_discount is continuous
            # (sum-order ULP noise), where a 4dp tie is measure-zero.
            F.avg("l_quantity").alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )

    def _combine(hi: str, lo: str, scale: float):
        total = F.col(hi).cast("decimal(38,0)") * F.lit(_SPLIT) + F.col(lo)
        return total.cast("double") / F.lit(scale)

    return agg.select(
        "l_returnflag",
        "l_linestatus",
        "sum_qty",
        "sum_base_price",
        _combine("_dh", "_dl", 10_000.0).alias("sum_disc_price"),
        _combine("_ch", "_cl", 1_000_000.0).alias("sum_charge"),
        "avg_qty",
        "avg_disc",
        "count_order",
    )


ORACLE_Q1 = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
                AS BIGINT)) AS DOUBLE) / 10000.0 AS sum_disc_price,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                * 1000000) AS BIGINT)) AS DOUBLE) / 1000000.0 AS sum_charge,
       avg(l_quantity) AS avg_qty,
       round(avg(l_discount), 4) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q3_top_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → join → agg → top-10.
    customer is broadcast; orders⋈lineitem shuffles on orderkey once."""
    cu = load_table(spark, sf_dir, "customer")
    od = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cut = F.lit("1999-06-30").cast("timestamp")
    return (
        li.filter(F.col("l_shipdate") > cut)
        .join(od.filter(F.col("o_orderdate") < cut), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(cu.filter(F.col("c_mktsegment") == "BUILDING")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        # exact-decimal revenue (r11): per-order sums of price×discount
        # products are 3-4dp rationals that sit exactly ON 2dp
        # half-boundaries (probe: 49574.425) — see _exact_sum_scaled
        .agg(
            _exact_sum_scaled(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 10_000
            ).alias("revenue")
        )
        .select(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate_s"),
            "o_orderpriority",
            "revenue",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


ORACLE_Q3 = """
SELECT l_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate_s,
       o_orderpriority,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
                AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1999-06-30 00:00:00'
  AND l_shipdate  > TIMESTAMP '1999-06-30 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table star join; all dims broadcast so the only
    shuffles are orders⋈lineitem (orderkey) and the final tiny agg.

    The orders side of the fact-fact join is PINNED to a shuffle-hash
    join: orders is a fact, but Catalyst's compressed-size statistics
    under-estimate a column-pruned zstd parquet scan, and at a 100×
    scale-up the optimizer chose to BROADCAST 15M orders rows — an
    ~15 s single-threaded HashedRelation build per execution and a plan
    that ships the table to every task (measured 18.6 s vs 4.7 s
    pinned). A fact side must never ride the broadcast estimate; the
    true dims stay broadcast."""
    re_ = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    na = load_table(spark, sf_dir, "nation")
    cu = load_table(spark, sf_dir, "customer")
    su = load_table(spark, sf_dir, "supplier")
    od = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    dims = (
        cu.join(F.broadcast(na), cu.c_nationkey == na.n_nationkey)
        .join(F.broadcast(re_), na.n_regionkey == re_.r_regionkey)
    )
    # dims (region-filtered) reduce orders ~5x BEFORE the fact-fact
    # shuffle: smaller build side, fewer rows into every later join —
    # the filter-early shape that matters when both facts are 100 TB.
    od_asia = od.join(F.broadcast(dims), od.o_custkey == dims.c_custkey)
    return (
        li.join(od_asia.hint("shuffle_hash"), li.l_orderkey == od_asia.o_orderkey)
        .join(
            F.broadcast(su),
            (li.l_suppkey == su.s_suppkey)
            & (su.s_nationkey == od_asia.c_nationkey),
        )
        .groupBy("n_name")
        # exact-decimal revenue — same discipline as q3 (r11 audit)
        .agg(
            _exact_sum_scaled(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 10_000
            ).alias("revenue")
        )
    )


ORACLE_Q5 = """
SELECT n_name,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
                AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
WHERE r_name = 'ASIA'
GROUP BY n_name
ORDER BY revenue DESC, n_name ASC
"""


# --- join variants (semi / anti) --------------------------------------------


def q_semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_semi + left_anti in one labeled union: 'has_highvalue' rows are
    customers with ≥1 order over 100k (EXISTS semantics, no row
    duplication); 'no_orders' rows are customers with no orders at all
    (NOT EXISTS). One registry entry for both join types (the driver caps
    the checked set at 50 queries)."""
    cu = load_table(spark, sf_dir, "customer")
    od = load_table(spark, sf_dir, "orders")
    hv = od.filter(F.col("o_totalprice") > 100000)
    semi = (
        cu.join(hv, cu.c_custkey == hv.o_custkey, "left_semi")
        .select(F.lit("has_highvalue").alias("kind"), "c_custkey", "c_name")
    )
    anti = (
        cu.join(od, cu.c_custkey == od.o_custkey, "left_anti")
        .select(F.lit("no_orders").alias("kind"), "c_custkey", "c_name")
    )
    return semi.unionByName(anti)


ORACLE_SEMI_ANTI = """
SELECT 'has_highvalue' AS kind, c_custkey, c_name
FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_totalprice > 100000)
UNION ALL
SELECT 'no_orders' AS kind, c_custkey, c_name
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
ORDER BY kind, c_custkey
"""


# --- windows ----------------------------------------------------------------


def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number per customer (W1-shape: partitioned ranking window) —
    top-3 orders by price, orderkey tiebreak."""
    od = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        od.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "o_custkey",
            "rn",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("totalprice"),
        )
    )


ORACLE_TOPK = """
SELECT o_custkey, rn, o_orderkey, totalprice FROM (
  SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders) t
WHERE rn <= 3
ORDER BY o_custkey, rn
"""


# --- grouping sets / distinct / stats ---------------------------------------


def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP(l_returnflag, l_linestatus) with grouping_id — subtotal rows
    carry NULL keys; gid disambiguates. Carries the count(DISTINCT)
    measures of the former standalone ``distinct_agg`` entry
    (consolidated in round 4 to hold the registry at the driver's
    50-entry check limit): expand-based distinct aggregation under a
    rollup lattice is the strictly harder plan, so the operator stays
    fully exercised."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().alias("gid"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct("l_partkey").alias("n_part"),
            F.count(F.lit(1)).alias("n"),
        )
    )


ORACLE_ROLLUP = """
SELECT l_returnflag, l_linestatus,
       CAST(grouping(l_returnflag, l_linestatus) AS BIGINT) AS gid,
       round(sum(l_quantity), 2) AS sum_qty,
       count(DISTINCT l_suppkey) AS n_supp,
       count(DISTINCT l_partkey) AS n_part,
       count(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY gid, l_returnflag, l_linestatus
"""


def q_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min/max/avg/stddev_samp per segment (statistical aggregate family)."""
    cu = load_table(spark, sf_dir, "customer")
    return (
        cu.groupBy("c_mktsegment")
        .agg(
            F.round(F.min("c_acctbal"), 2).alias("min_bal"),
            F.round(F.max("c_acctbal"), 2).alias("max_bal"),
            # avg of 2dp-quantized balances is a small-denominator
            # rational that CAN sit exactly on a 4dp half-boundary
            # (probe: 4190.83825) — exact cents-sum + one division is
            # bit-identical cross-engine (r11 float audit). std stays
            # rounded: sqrt makes the value class continuous.
            (
                F.sum(F.round(F.col("c_acctbal") * 100).cast("decimal(38,0)"))
                .cast("double")
                / (F.lit(100.0) * F.count("c_acctbal"))
            ).alias("avg_bal"),
            F.round(F.stddev_samp("c_acctbal"), 4).alias("std_bal"),
            F.count(F.lit(1)).alias("n"),
        )
    )


ORACLE_STATS = """
SELECT c_mktsegment,
       round(min(c_acctbal), 2) AS min_bal,
       round(max(c_acctbal), 2) AS max_bal,
       CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS DOUBLE)
         / (CAST(100.0 AS DOUBLE) * count(c_acctbal)) AS avg_bal,
       round(stddev_samp(c_acctbal), 4) AS std_bal,
       count(*) AS n
FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


# --- set operations ----------------------------------------------------------


def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(BUILDING ∪ rich) ∖ (machinery-with-negative-balance) over custkeys —
    UNION / EXCEPT / INTERSECT distinct semantics."""
    cu = load_table(spark, sf_dir, "customer")
    building = cu.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    rich = cu.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    nonneg = cu.filter(F.col("c_acctbal") >= 0).select("c_custkey")
    return (
        building.union(rich).distinct().intersect(nonneg)
    )


ORACLE_SET_OPS = """
SELECT c_custkey FROM (
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
  UNION
  SELECT c_custkey FROM customer WHERE c_acctbal > 5000
)
INTERSECT
SELECT c_custkey FROM customer WHERE c_acctbal >= 0
ORDER BY c_custkey
"""


# --- scalar functions / conditional expressions ------------------------------


def q_conditional_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN price tiers + string ops on part (P9/F1/F2 family):
    regexp word extraction, split-array size, concat, upper."""
    pt = load_table(spark, sf_dir, "part")
    return pt.select(
        "p_partkey",
        F.when(F.col("p_retailprice") >= 1500, "high")
        .when(F.col("p_retailprice") >= 900, "mid")
        .otherwise("low")
        .alias("price_bucket"),
        F.regexp_extract("p_name", r"^(\w+)", 1).alias("first_word"),
        F.upper(F.col("p_brand")).alias("brand_u"),
        F.regexp_extract("p_brand", r"(\d+)", 1).cast("int").alias("brand_num"),
        F.concat_ws("/", "p_type", "p_brand").alias("type_brand"),
    )


ORACLE_CONDITIONAL = """
SELECT p_partkey,
       CASE WHEN p_retailprice >= 1500 THEN 'high'
            WHEN p_retailprice >= 900  THEN 'mid'
            ELSE 'low' END AS price_bucket,
       regexp_extract(p_name, '^(\\w+)', 1) AS first_word,
       upper(p_brand) AS brand_u,
       CAST(regexp_extract(p_brand, '(\\d+)', 1) AS INTEGER) AS brand_num,
       concat_ws('/', p_type, p_brand) AS type_brand
FROM part ORDER BY p_partkey
"""


def q_date_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """date_trunc month rollup of orders (date function family)."""
    od = load_table(spark, sf_dir, "orders")
    return (
        od.groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("month"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
    )


ORACLE_DATE_MONTHLY = """
SELECT strftime(o_orderdate, '%Y-%m') AS month,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS sum_price
FROM orders GROUP BY 1 ORDER BY month
"""


# --- event-stream shapes ------------------------------------------------------


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min gap) via lag + cumulative sum —
    the classic stateful-looking op expressed with plain windows."""
    ev = load_table(spark, sf_dir, "events")
    epoch = F.col("ts").cast("double")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # both windows order by the SAME (ts, event_id) expressions: ep is a
    # monotonic injective cast of ts, so ordering by ts is the identical
    # total order — but Catalyst can only PROVE the orders equal (and so
    # elide the second per-partition Sort) when the sort keys match
    # syntactically. Ordering w2 by the derived ep column cost a full
    # re-sort of every partition between the two windows (r12 plan
    # audit: Sort(7) in the before-plan).
    with_gap = ev.select(
        "user_id",
        "event_id",
        "ts",
        epoch.alias("ep"),
        (epoch - F.lag(epoch, 1).over(w) > 1800).cast("int").alias("is_new"),
    )
    sess = with_gap.withColumn(
        "session_id",
        F.sum(F.coalesce("is_new", F.lit(0))).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.max("ep") - F.min("ep"), 3).alias("duration_s"),
        )
    )


ORACLE_SESSIONIZE = """
WITH g AS (
  SELECT user_id, event_id, epoch(ts) AS ep,
         CAST(epoch(ts) - lag(epoch(ts), 1)
              OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800
              AS INTEGER) AS is_new
  FROM events
), s AS (
  SELECT user_id, ep,
         -- CAST: DuckDB's windowed sum(INTEGER) returns HUGEINT, which
         -- pandas renders as float64 ("1.0" vs Spark's "1") and breaks
         -- the driver's repr-hash even though every value matches.
         CAST(sum(coalesce(is_new, 0)) OVER (PARTITION BY user_id
             ORDER BY ep, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS session_id
  FROM g
)
SELECT user_id, session_id, count(*) AS n_events,
       round(max(ep) - min(ep), 3) AS duration_s
FROM s GROUP BY user_id, session_id ORDER BY user_id, session_id
"""


PIVOT_TYPES = ["click", "view", "purchase", "signup", "error"]


def q_pivot_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot event counts per user (explicit value list → single pass,
    no extra distinct-values job)."""
    ev = load_table(spark, sf_dir, "events")
    pv = (
        ev.groupBy("user_id")
        .pivot("event_type", PIVOT_TYPES)
        .agg(F.count(F.lit(1)))
    )
    cols = [F.coalesce(F.col(t), F.lit(0)).alias(t) for t in PIVOT_TYPES]
    return pv.select("user_id", *cols)


ORACLE_PIVOT = """
SELECT user_id,
       count(*) FILTER (event_type = 'click')    AS click,
       count(*) FILTER (event_type = 'view')     AS view,
       count(*) FILTER (event_type = 'purchase') AS purchase,
       count(*) FILTER (event_type = 'signup')   AS signup,
       count(*) FILTER (event_type = 'error')    AS error
FROM events GROUP BY user_id ORDER BY user_id
"""


def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct users per event_type via the PORTABLE HLL
    sketch (``operators/sketches.py``): explicit md5-derived registers +
    integer-exact fold, so the estimate hash-matches a DuckDB oracle
    running the identical algorithm (upgraded from rows-only in r3).

    The exact count rides along (its own map-side-combinable distinct
    agg, broadcast-joined — 5 key rows) both for human sanity and so the
    sf/sf1 ε-bound tests read one frame. The built-in HLL++
    ``approx_count_distinct`` path stays bound-tested in
    ``tests/test_approx_bounds.py`` as the no-oracle-needed alternative.
    """
    ev = load_table(spark, sf_dir, "events")
    approx = hll_count_distinct(ev, key="event_type", value_col="user_id")
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    return (
        approx.join(F.broadcast(exact), on="event_type")
        .select("event_type", "approx_users", "exact_users")
    )


_HLL_CTE = hll_oracle_cte(table="events", key="event_type", value_col="user_id")
ORACLE_APPROX_DISTINCT = f"""
WITH hll AS ({_HLL_CTE}),
x AS (SELECT event_type, count(DISTINCT user_id) AS exact_users
      FROM events GROUP BY event_type)
SELECT hll.event_type, hll.approx_users, x.exact_users
FROM hll JOIN x USING (event_type)
ORDER BY hll.event_type
"""


RELATIONAL_QUERIES = {
    "q1_pricing_summary": _q(q1_pricing_summary, ORACLE_Q1),
    "q3_top_revenue": _q(q3_top_revenue, ORACLE_Q3),
    "q5_region_revenue": _q(q5_region_revenue, ORACLE_Q5),
    "semi_anti_join_customers": _q(q_semi_anti_join, ORACLE_SEMI_ANTI),
    "topk_per_customer": _q(q_topk_per_group, ORACLE_TOPK),
    "rollup_lineitem": _q(q_rollup, ORACLE_ROLLUP),
    "stats_agg": _q(q_stats_agg, ORACLE_STATS),
    "set_ops_customers": _q(q_set_ops, ORACLE_SET_OPS),
    "conditional_buckets": _q(q_conditional_buckets, ORACLE_CONDITIONAL),
    "date_monthly_orders": _q(q_date_monthly, ORACLE_DATE_MONTHLY),
    "sessionize_events": _q(q_sessionize, ORACLE_SESSIONIZE),
    "pivot_event_counts": _q(q_pivot_events, ORACLE_PIVOT),
    "approx_distinct_users": _q(q_approx_distinct, ORACLE_APPROX_DISTINCT),
}
