"""Extended relational/temporal query surface: the operator families
SURVEY §2 marks as "free in Spark, exposed for the driver's query set"
(grouping sets, outer joins, lag/lead/ntile/frames, JSON functions, the
S13 SQL facade) plus the temporal joins (as-of, bounded range) a
time-series event table implies but Spark lacks as built-ins.

Determinism rules are the same as queries_relational: identical aliases
both sides, doubles rounded, timestamps formatted to strings, explicit
tiebreakers in every WINDOW ordering (those affect values). Final
presentation orderBys were dropped in the r12 optimization round —
the driver's value-hash sorts rows itself, and each final sort cost
a range exchange + sort stage (see queries_relational docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdataproject_spark.contract import Query as _q
from bigdataproject_spark.operators.energy import flag_top_pct_binned
from bigdataproject_spark.operators.temporal import asof_join, range_join_count
from bigdataproject_spark.sources.readers import load_table

_TS_FMT = "yyyy-MM-dd HH:mm:ss"
_DUCK_FMT = "%Y-%m-%d %H:%M:%S"


# --- as-of join (SURVEY custom-op rule (a): composition of built-ins) --------


def q_asof_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each click attributed to the user's latest purchase at-or-before it
    (union + running last() — one shuffle; see operators/temporal.py)."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    out = asof_join(
        clicks, purchases, key="user_id", ts="ts", right_payload=["ts", "value"]
    )
    return out.select(
        "event_id",
        "user_id",
        F.date_format("ts", _TS_FMT).alias("click_ts_s"),
        F.date_format("right_ts", _TS_FMT).alias("purchase_ts_s"),
        F.round("value", 2).alias("purchase_value"),
    )


ORACLE_ASOF = f"""
WITH clicks AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
), purch AS (
  SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
)
SELECT c.event_id, c.user_id,
       strftime(c.ts, '{_DUCK_FMT}') AS click_ts_s,
       strftime(p.ts, '{_DUCK_FMT}') AS purchase_ts_s,
       round(p.value, 2) AS purchase_value
FROM clicks c ASOF LEFT JOIN purch p
  ON c.user_id = p.user_id AND c.ts >= p.ts
ORDER BY c.event_id
"""


# --- bounded range join ------------------------------------------------------

_LOOKBACK_S = 600


def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Views in the 10 minutes before each click, same user (banded
    equi-join on (user, time-bucket) — no theta join)."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select("user_id", "ts")
    out = range_join_count(
        clicks,
        views,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        lookback_s=_LOOKBACK_S,
    )
    return out.select(
        "event_id",
        "user_id",
        F.date_format("ts", _TS_FMT).alias("click_ts_s"),
        "n_in_range",
    )


ORACLE_RANGE_JOIN = f"""
WITH clicks AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
), views AS (
  SELECT user_id, ts FROM events WHERE event_type = 'view'
)
SELECT c.event_id, c.user_id,
       strftime(c.ts, '{_DUCK_FMT}') AS click_ts_s,
       count(*) AS n_in_range
FROM clicks c JOIN views v
  ON c.user_id = v.user_id
 AND v.ts < c.ts
 AND v.ts >= c.ts - INTERVAL {_LOOKBACK_S} SECONDS
GROUP BY c.event_id, c.user_id, c.ts
ORDER BY c.event_id
"""


# --- window functions: lag / lead / ntile / frames ---------------------------


def q_window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer order history: previous/next price, quartile, 3-order
    moving average and running total (rowsBetween frames). Deterministic
    (o_orderdate, o_orderkey) ordering — the frame defines summation order,
    so doubles agree bit-for-bit across engines before rounding. Absorbs
    the former ``running_total`` registry entry (same window family; the
    driver caps the checked set at 50 queries)."""
    od = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    wf = w.rowsBetween(-2, 0)
    wr = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return od.select(
        "o_custkey",
        "o_orderkey",
        F.round("o_totalprice", 2).alias("price"),
        F.round(F.lag("o_totalprice", 1).over(w), 2).alias("prev_price"),
        F.round(F.lead("o_totalprice", 1).over(w), 2).alias("next_price"),
        F.ntile(4).over(w).alias("quartile"),
        # 4dp, not 2dp: a 3-row avg of 2dp prices can land on a .xx5
        # half-boundary where engines' last-ulp sums round differently.
        F.round(F.avg("o_totalprice").over(wf), 4).alias("moving_avg3"),
        F.round(F.sum("o_totalprice").over(wr), 2).alias("running_total"),
    )


ORACLE_WINDOW_LAG_LEAD = """
SELECT o_custkey, o_orderkey,
       round(o_totalprice, 2) AS price,
       round(lag(o_totalprice, 1) OVER w, 2) AS prev_price,
       round(lead(o_totalprice, 1) OVER w, 2) AS next_price,
       ntile(4) OVER w AS quartile,
       round(avg(o_totalprice) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4)
         AS moving_avg3,
       round(sum(o_totalprice) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
             AND CURRENT ROW), 2) AS running_total
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
ORDER BY o_custkey, o_orderkey
"""


# --- grouping sets -----------------------------------------------------------


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS ((priority, status), (priority), (status), ()) with ALL
    labels — the explicit grouping-sets API, enumerating exactly CUBE's
    lattice so the oracle (GROUP BY CUBE) doubles as a CUBE-equivalence
    check. Absorbs the former ``cube_orders`` entry (the driver caps the
    checked set at 50 queries); the dedicated ``.cube()`` API is asserted
    equivalent in tests/test_functions.py::test_cube_equals_grouping_sets."""
    od = load_table(spark, sf_dir, "orders")
    return (
        od.groupingSets(
            [
                ["o_orderpriority", "o_orderstatus"],
                ["o_orderpriority"],
                ["o_orderstatus"],
                [],
            ],
            "o_orderpriority",
            "o_orderstatus",
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .select(
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            "n_orders",
            "total_price",
        )
    )


ORACLE_GROUPING_SETS = """
SELECT coalesce(o_orderpriority, 'ALL') AS priority,
       coalesce(o_orderstatus, 'ALL') AS status,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS total_price
FROM orders
GROUP BY CUBE (o_orderpriority, o_orderstatus)
ORDER BY priority, status
"""


# --- full outer join ---------------------------------------------------------


def q_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user click vs purchase counts, FULL OUTER on user — users active
    on only one side appear with a 0 on the other."""
    ev = load_table(spark, sf_dir, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_clicks"))
    )
    purch = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_purchases"))
    )
    return (
        clicks.join(purch, on="user_id", how="full_outer")
        .select(
            "user_id",
            F.coalesce("n_clicks", F.lit(0)).alias("n_clicks"),
            F.coalesce("n_purchases", F.lit(0)).alias("n_purchases"),
        )
    )


ORACLE_OUTER_JOIN = """
WITH c AS (
  SELECT user_id, count(*) AS n_clicks FROM events
  WHERE event_type = 'click' GROUP BY user_id
), p AS (
  SELECT user_id, count(*) AS n_purchases FROM events
  WHERE event_type = 'purchase' GROUP BY user_id
)
SELECT coalesce(c.user_id, p.user_id) AS user_id,
       coalesce(n_clicks, 0) AS n_clicks,
       coalesce(n_purchases, 0) AS n_purchases
FROM c FULL OUTER JOIN p ON c.user_id = p.user_id
ORDER BY user_id
"""


# --- JSON functions over events.props ----------------------------------------


def q_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extract props JSON field k per event_type: count, avg, max —
    get_json_object stays JVM-side (no Python round-trip)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.select("event_type", k.alias("k"))
        .filter(F.col("k").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            # unrounded (r11 float audit): k is int, so sum is exact in
            # any order and avg is one IEEE division — bit-identical
            # cross-engine; round(int-ratio, 4) was the boundary hazard
            F.avg("k").alias("avg_k"),
            F.max("k").alias("max_k"),
        )
    )


ORACLE_JSON_PROPS = """
SELECT event_type,
       count(*) AS n,
       avg(k) AS avg_k,
       max(k) AS max_k
FROM (
  SELECT event_type, CAST(json_extract_string(props, '$.k') AS INT) AS k
  FROM events
)
WHERE k IS NOT NULL
GROUP BY event_type
ORDER BY event_type
"""


# --- S13: SQL facade (temp view + spark.sql) ---------------------------------


def q_sql_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's documented SQL entry point (data/readme.md:86-94):
    per-minute danmaku density, here over the events table via temp view +
    ``spark.sql`` — every §2 operator is reachable through SQL too."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events_v")
    return spark.sql(
        """
        SELECT date_format(date_trunc('minute', ts), 'yyyy-MM-dd HH:mm') AS minute_s,
               count(*) AS n
        FROM events_v
        GROUP BY date_trunc('minute', ts)
        """
    )


ORACLE_SQL_DENSITY = """
SELECT strftime(date_trunc('minute', ts), '%Y-%m-%d %H:%M') AS minute_s,
       count(*) AS n
FROM events
GROUP BY date_trunc('minute', ts)
ORDER BY minute_s
"""


# --- binned-quantile highlight (scale variant of W1–W3) ----------------------


def q_energy_approx_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100TB path for the reference's adaptive threshold: a
    histogram-quantile per-key threshold + broadcast join instead of a
    sort-per-partition window. Upgraded in r3 from ``approx_percentile``
    (GK sketch, engine-specific → was rows-only) to the deterministic
    binned quantile (``flag_top_pct_binned``), which keeps the identical
    no-per-key-sort plan shape but hash-matches a DuckDB oracle running
    the same algorithm. The GK-sketch variant stays available
    (``flag_top_pct_approx``) and bound-tested."""
    ev = load_table(spark, sf_dir, "events")
    per_bucket = (
        ev.groupBy(
            "event_type",
            (F.floor(F.unix_timestamp("ts") / 10) * 10).alias("bucket_s"),
        )
        .agg(F.count(F.lit(1)).alias("density"), F.sum("value").alias("sentiment"))
        .withColumn("energy", 0.37 * F.col("sentiment") + 0.63 * F.col("density"))
    )
    return (
        flag_top_pct_binned(per_bucket, key="event_type", order="energy", pct=0.9)
        .select(
            "event_type",
            "bucket_s",
            "density",
            F.round("energy", 4).alias("energy_r"),
            "is_high",
        )
    )


ORACLE_ENERGY_APPROX_FLAG = """
WITH agg AS (
  SELECT event_type,
         CAST(floor(epoch(ts)/10)*10 AS BIGINT) AS bucket_s,
         count(*) AS density,
         sum(value) AS sentiment
  FROM events GROUP BY 1, 2
), e AS (
  SELECT event_type, bucket_s, density,
         0.37*sentiment + 0.63*density AS energy,
         CAST(floor(round(0.37*sentiment + 0.63*density, 6) * 16) AS BIGINT) AS bin
  FROM agg
), hist AS (
  SELECT event_type, bin, count(*) AS n FROM e
  WHERE bin IS NOT NULL GROUP BY 1, 2
), cum AS (
  SELECT event_type, bin,
         sum(n) OVER (PARTITION BY event_type ORDER BY bin) AS c,
         sum(n) OVER (PARTITION BY event_type) AS tot
  FROM hist
), thr AS (
  SELECT event_type, min(bin) AS thr_bin
  FROM cum WHERE c >= 0.9 * tot GROUP BY event_type
)
SELECT e.event_type, e.bucket_s, e.density,
       round(e.energy, 4) AS energy_r,
       e.bin >= t.thr_bin AS is_high
FROM e LEFT JOIN thr t USING (event_type)
ORDER BY e.event_type, e.bucket_s
"""



# --- exact quantiles (oracled: both engines compute exact linear-interp) -----


def q_quantiles_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact continuous quartiles of value per event_type — Spark
    percentile() and DuckDB quantile_cont() both use linear interpolation
    over the sorted values, so results hash-match (6dp)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.round(F.expr("percentile(value, 0.25)"), 6).alias("p25"),
            F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
            F.round(F.expr("percentile(value, 0.75)"), 6).alias("p75"),
        )
    )


ORACLE_QUANTILES = """
SELECT event_type,
       round(quantile_cont(value, 0.25), 6) AS p25,
       round(quantile_cont(value, 0.5), 6) AS p50,
       round(quantile_cont(value, 0.75), 6) AS p75
FROM events GROUP BY event_type ORDER BY event_type
"""


# --- nested timeline document (A6/S7: collect_list(struct) + array_sort) -----


def q_energy_timeline_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's nested per-episode timeline document
    (hot/spark_energy.py:89-116) as one DataFrame op: per-key sorted
    struct arrays serialized to a JSON string column executor-side —
    replacing the reference's driver-side collect + json.dump (S7).

    Hash-checked: energy is rounded to 6dp BEFORE the percentile
    threshold (engines' raw double sums differ in the last ulp; an
    interpolated quantile over the rounded set is either strictly
    between two points or exactly a point in both engines), and both
    sides serialize the sorted struct list with their native to_json —
    the compact [{"time":..,"value":..,"high":..}] rendering agrees."""
    from bigdataproject_spark.operators.energy import timeline

    ev = load_table(spark, sf_dir, "events")
    per_bucket = (
        ev.groupBy(
            "event_type",
            (F.floor(F.unix_timestamp("ts") / 10) * 10).alias("bucket"),
        )
        .agg(F.count(F.lit(1)).alias("density"), F.sum("value").alias("sentiment"))
        .withColumn(
            "energy", F.round(0.37 * F.col("sentiment") + 0.63 * F.col("density"), 6)
        )
        .withColumn(
            "is_high",
            F.col("energy")
            >= F.expr(
                "percentile(energy, 0.9) OVER (PARTITION BY event_type)"
            ),
        )
    )
    # round_dp=6 == energy's own rounding: re-rounding a 6dp-rounded
    # double to 2dp hits half-boundaries (x.x15) where Spark rounds via
    # decimal string (HALF_UP -> .x2) but DuckDB rounds the binary double
    # (-> .x1); a single rounding of an arbitrary double never lands on
    # an exact half, so 6dp is cross-engine stable.
    tl = timeline(per_bucket, key="event_type", round_dp=6)
    return tl.select(
        F.col("event_type"),
        F.size("timeline").cast("long").alias("n_buckets"),
        F.to_json(F.col("timeline")).alias("timeline_json"),
    )


ORACLE_ENERGY_NESTED = """
WITH agg AS (
  SELECT event_type,
         CAST(floor(epoch(ts)/10)*10 AS BIGINT) AS bucket,
         count(*) AS density,
         sum(value) AS sentiment
  FROM events GROUP BY 1, 2
), e AS (
  SELECT event_type, bucket,
         round(0.37*sentiment + 0.63*density, 6) AS energy_r
  FROM agg
), h AS (
  SELECT event_type, bucket,
         energy_r AS value,
         energy_r >= quantile_cont(energy_r, 0.9)
                     OVER (PARTITION BY event_type) AS high
  FROM e
)
SELECT event_type,
       count(*) AS n_buckets,
       to_json(list({'time': bucket, 'value': value, 'high': high}
                    ORDER BY bucket)) AS timeline_json
FROM h GROUP BY event_type ORDER BY event_type
"""


_TL_CAP = 50  # small enough that the cap BINDS at the parity-test SF


def q_energy_timeline_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6's PRODUCTION path: the nested timeline with the operator's
    ``max_buckets`` cap (operators/energy.py:220, SURVEY §7.4.7 — the
    designed bound for unbounded keys; the uncapped registry entry at
    sf100 is a deliberate stress of the documented collect_list
    hazard, see SCALING.md r9). Kept in EXTRA_PARITY so the capped
    code path — the row_number pre-filter feeding the collect — has
    standing oracle coverage, not just unit tests and receipts. The
    high flag is computed over the FULL per-key set before the cap
    keeps the first ``_TL_CAP`` buckets by time, exactly as the
    operator composes."""
    from bigdataproject_spark.operators.energy import timeline

    ev = load_table(spark, sf_dir, "events")
    per_bucket = (
        ev.groupBy(
            "event_type",
            (F.floor(F.unix_timestamp("ts") / 10) * 10).alias("bucket"),
        )
        .agg(F.count(F.lit(1)).alias("density"), F.sum("value").alias("sentiment"))
        .withColumn(
            "energy", F.round(0.37 * F.col("sentiment") + 0.63 * F.col("density"), 6)
        )
        .withColumn(
            "is_high",
            F.col("energy")
            >= F.expr(
                "percentile(energy, 0.9) OVER (PARTITION BY event_type)"
            ),
        )
    )
    tl = timeline(per_bucket, key="event_type", round_dp=6, max_buckets=_TL_CAP)
    return tl.select(
        F.col("event_type"),
        F.size("timeline").cast("long").alias("n_buckets"),
        F.to_json(F.col("timeline")).alias("timeline_json"),
    ).orderBy("event_type")


ORACLE_ENERGY_CAPPED = f"""
WITH agg AS (
  SELECT event_type,
         CAST(floor(epoch(ts)/10)*10 AS BIGINT) AS bucket,
         count(*) AS density,
         sum(value) AS sentiment
  FROM events GROUP BY 1, 2
), e AS (
  SELECT event_type, bucket,
         round(0.37*sentiment + 0.63*density, 6) AS energy_r
  FROM agg
), h AS (
  SELECT event_type, bucket,
         energy_r AS value,
         energy_r >= quantile_cont(energy_r, 0.9)
                     OVER (PARTITION BY event_type) AS high,
         row_number() OVER (PARTITION BY event_type ORDER BY bucket) AS rn
  FROM e
)
SELECT event_type,
       count(*) AS n_buckets,
       to_json(list({{'time': bucket, 'value': value, 'high': high}}
                    ORDER BY bucket)) AS timeline_json
FROM h WHERE rn <= {_TL_CAP}
GROUP BY event_type ORDER BY event_type
"""


EXTENDED_QUERIES = {
    "asof_purchase_attribution": _q(q_asof_purchase, ORACLE_ASOF),
    "range_join_recent_views": _q(q_range_join, ORACLE_RANGE_JOIN),
    "window_lag_lead": _q(q_window_lag_lead, ORACLE_WINDOW_LAG_LEAD),
    "grouping_sets_orders": _q(q_grouping_sets, ORACLE_GROUPING_SETS),
    "outer_join_user_activity": _q(q_outer_join, ORACLE_OUTER_JOIN),
    "json_props_stats": _q(q_json_props, ORACLE_JSON_PROPS),
    "sql_density_per_minute": _q(q_sql_density, ORACLE_SQL_DENSITY),
    "energy_approx_flag": _q(q_energy_approx_flag, ORACLE_ENERGY_APPROX_FLAG),
    "quantiles_by_type": _q(q_quantiles_by_type, ORACLE_QUANTILES),
    "energy_timeline_nested": _q(q_energy_timeline_nested, ORACLE_ENERGY_NESTED),
}
