"""Synthesize a Kx scale-up of sf0.1 by unioning key-shifted copies.

Usage: python tools/make_scale.py [K] [DST]
  K    scale multiplier over sf0.1 (default 10 -> ~sf1)
  DST  output dir (default /tmp/sf{K/10})

Key shifting keeps fact-table keys disjoint across copies (join
fan-outs stay realistic); event timestamps shift one day per copy so
sessionization/windows see new activity, not 100 coincident clones of
the same minute. Duplicated documents are an intentional property: the
dedup pipelines must survive a corpus where every doc has K exact
copies (worst case for LSH bucket width).
"""
import os
import sys

from pyspark.sql import functions as F

from bigdataproject_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
K = int(sys.argv[1]) if len(sys.argv) > 1 else 10
DST = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/sf{K / 10:g}"
OFF = 100_000_000

spark = get_spark(f"make_scale_{K}x")
# keep ts columns parquet TIMESTAMP(MICROS) (not INT96) so the loader's
# footer sniff sees the same physical type as the driver testdata
spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
os.makedirs(DST, exist_ok=True)


def save(df, name, n_files: int | None = None):
    """Fact tables are written as ≥32 files: a real table at this scale
    is never one file, and a single-row-group parquet file caps scan
    parallelism at 1 task no matter the split config. Dims stay as-is."""
    if n_files:
        df = df.repartition(n_files)
    df.write.mode("overwrite").parquet(f"{DST}/{name}.parquet")


def expand(df, shifts):
    """Union K key-shifted copies; `shifts` maps column -> per-copy shift
    expression factory (copy index column `_i`)."""
    out = df.crossJoin(spark.range(K).select(F.col("id").alias("_i")))
    for col, mk in shifts.items():
        out = out.withColumn(col, mk(F.col("_i")))
    return out.drop("_i")


# dims: copy
for t in ["region", "nation", "supplier", "customer", "part"]:
    save(spark.read.parquet(f"{SRC}/{t}.parquet"), t)

N_FILES = 32
save(
    expand(
        spark.read.parquet(f"{SRC}/orders.parquet"),
        {"o_orderkey": lambda i: F.col("o_orderkey") + i * OFF},
    ),
    "orders",
    N_FILES,
)
save(
    expand(
        spark.read.parquet(f"{SRC}/lineitem.parquet"),
        {"l_orderkey": lambda i: F.col("l_orderkey") + i * OFF},
    ),
    "lineitem",
    N_FILES,
)
save(
    expand(
        spark.read.parquet(f"{SRC}/events.parquet"),  # ts is timestamp[us]
        {
            "event_id": lambda i: F.col("event_id") + i * OFF,
            "ts": lambda i: F.col("ts") + i * F.expr("INTERVAL 1 DAY"),
        },
    ),
    "events",
    N_FILES,
)
save(
    expand(
        spark.read.parquet(f"{SRC}/documents.parquet"),
        {"doc_id": lambda i: F.col("doc_id") + i * OFF},
    ),
    "documents",
    N_FILES,
)

emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
idc = "emb_id" if "emb_id" in emb.columns else emb.columns[0]
save(expand(emb, {idc: lambda i: F.col(idc) + i * OFF}), "embeddings", N_FILES)

for t in ["lineitem", "orders", "events", "documents", "embeddings"]:
    print(t, spark.read.parquet(f"{DST}/{t}.parquet").count())
spark.stop()
