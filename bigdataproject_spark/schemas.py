"""Explicit schemas for every table the engine reads.

The reference relies on ``inferSchema=True`` (hot/spark_energy.py:26,
tag/main.py:45, ...), which costs a full extra scan per read and yields
non-deterministic typing. The engine declares every schema up front.

Two groups:
  * reference-shaped inputs (danmaku events, anime tag metadata) —
    data/readme.md:23-31 and tag/bilibili_anime_spider.py:91-98;
  * the driver's TPC-H-ish testdata (TESTDATA.md / FIXTURES.md §B).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# --- reference-shaped inputs -------------------------------------------------

# Danmaku fact table: data/readme.md:23-31; writer crawler/spider_worker.py:101.
# Two time axes: media time (video_time) and wall clock (send_date).
DANMAKU = StructType(
    [
        StructField("dmid", StringType()),
        StructField("video_time", DoubleType()),
        StructField("text", StringType()),
        StructField("send_date", TimestampType()),
        StructField("uid", StringType()),
        StructField("source", StringType()),
    ]
)

# Raw danmaku as all-string (the graph job reads untyped:
# relation_graph/danmaku_analysis_cluster.py:120); cast downstream with the
# cast-null validity trick (hot/spark_energy.py:32).
DANMAKU_RAW = StructType(
    [StructField(f.name, StringType()) for f in DANMAKU.fields]
)

# Anime metadata / tag transactions: tag/bilibili_anime_spider.py:91-98,
# cleaned at tag/main.py:52-57. CJK headers kept for source compatibility.
ANIME_TAGS_RAW = StructType(
    [
        StructField("标题", StringType()),
        StructField("标签", StringType()),
        StructField("追番人数", StringType()),
        StructField("评分", StringType()),
        StructField("剧集状态", StringType()),
    ]
)

# --- derived shapes (golden-comparison targets, FIXTURES.md §A3) -------------

GRAPH_NODES = StructType(
    [StructField("Id", StringType()), StructField("Size", LongType())]
)
GRAPH_EDGES = StructType(
    [
        StructField("Source", StringType()),
        StructField("Target", StringType()),
        StructField("Weight", LongType()),
    ]
)
TIMELINE_ELEM = StructType(
    [
        StructField("time", IntegerType()),
        StructField("value", DoubleType()),
        StructField("high", BooleanType()),
    ]
)

# --- driver testdata (TESTDATA.md; verified against parquet footers) ---------

REGION = StructType(
    [StructField("r_regionkey", IntegerType()), StructField("r_name", StringType())]
)
NATION = StructType(
    [
        StructField("n_nationkey", IntegerType()),
        StructField("n_name", StringType()),
        StructField("n_regionkey", IntegerType()),
    ]
)
CUSTOMER = StructType(
    [
        StructField("c_custkey", LongType()),
        StructField("c_name", StringType()),
        StructField("c_nationkey", IntegerType()),
        StructField("c_acctbal", DoubleType()),
        StructField("c_mktsegment", StringType()),
    ]
)
SUPPLIER = StructType(
    [
        StructField("s_suppkey", LongType()),
        StructField("s_name", StringType()),
        StructField("s_nationkey", IntegerType()),
        StructField("s_acctbal", DoubleType()),
    ]
)
PART = StructType(
    [
        StructField("p_partkey", LongType()),
        StructField("p_name", StringType()),
        StructField("p_brand", StringType()),
        StructField("p_type", StringType()),
        StructField("p_size", IntegerType()),
        StructField("p_retailprice", DoubleType()),
    ]
)
ORDERS = StructType(
    [
        StructField("o_orderkey", LongType()),
        StructField("o_custkey", LongType()),
        StructField("o_orderstatus", StringType()),
        StructField("o_totalprice", DoubleType()),
        StructField("o_orderdate", TimestampType()),
        StructField("o_orderpriority", StringType()),
    ]
)
LINEITEM = StructType(
    [
        StructField("l_orderkey", LongType()),
        StructField("l_partkey", LongType()),
        StructField("l_suppkey", LongType()),
        StructField("l_linenumber", IntegerType()),
        StructField("l_quantity", DoubleType()),
        StructField("l_extendedprice", DoubleType()),
        StructField("l_discount", DoubleType()),
        StructField("l_tax", DoubleType()),
        StructField("l_returnflag", StringType()),
        StructField("l_linestatus", StringType()),
        StructField("l_shipdate", TimestampType()),
    ]
)
# events.ts is parquet TIMESTAMP(NANOS) — read as long (nanosAsLong) and
# converted to a microsecond TimestampType by the loader.
EVENTS_RAW = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)
EVENTS = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)
DOCUMENTS = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)
EMBEDDINGS = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
        StructField("label", IntegerType()),
    ]
)

TESTDATA_TABLES: dict[str, StructType] = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}
