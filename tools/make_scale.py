"""Synthesize a 10x scale-up of sf0.1 (~sf1) by unioning key-shifted copies."""
import os
from pyspark.sql import functions as F
from bigdataproject_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
DST = "/tmp/sf1"
K = 10
OFF = 100_000_000

spark = get_spark("make_sf1")
# keep ts columns parquet TIMESTAMP(MICROS) (not INT96) so the loader's
# footer sniff sees the same physical type as the driver testdata
spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
os.makedirs(DST, exist_ok=True)

def save(df, name):
    df.write.mode("overwrite").parquet(f"{DST}/{name}.parquet")

# dims: copy
for t in ["region", "nation", "supplier", "customer", "part"]:
    save(spark.read.parquet(f"{SRC}/{t}.parquet"), t)

orders = spark.read.parquet(f"{SRC}/orders.parquet")
save(orders.crossJoin(spark.range(K).select(F.col("id").alias("_i")))
      .withColumn("o_orderkey", F.col("o_orderkey") + F.col("_i") * OFF).drop("_i"), "orders")

li = spark.read.parquet(f"{SRC}/lineitem.parquet")
save(li.crossJoin(spark.range(K).select(F.col("id").alias("_i")))
      .withColumn("l_orderkey", F.col("l_orderkey") + F.col("_i") * OFF).drop("_i"), "lineitem")

ev = spark.read.parquet(f"{SRC}/events.parquet")  # ts is timestamp[us]
save(ev.crossJoin(spark.range(K).select(F.col("id").alias("_i")))
      .withColumn("event_id", F.col("event_id") + F.col("_i") * OFF)
      .withColumn("ts", F.col("ts") + F.col("_i") * F.expr("INTERVAL 1 DAY"))
      .drop("_i"), "events")

docs = spark.read.parquet(f"{SRC}/documents.parquet")
save(docs.crossJoin(spark.range(K).select(F.col("id").alias("_i")))
      .withColumn("doc_id", F.col("doc_id") + F.col("_i") * OFF).drop("_i"), "documents")

emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
cols = emb.columns
idc = "emb_id" if "emb_id" in cols else cols[0]
save(emb.crossJoin(spark.range(K).select(F.col("id").alias("_i")))
      .withColumn(idc, F.col(idc) + F.col("_i") * OFF).drop("_i"), "embeddings")

for t in ["lineitem","orders","events","documents","embeddings"]:
    print(t, spark.read.parquet(f"{DST}/{t}.parquet").count())
spark.stop()
