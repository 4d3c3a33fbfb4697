#!/usr/bin/env python
"""Run the reference's three analysis pipelines end-to-end on the
reference corpus and write the same artifacts the reference commits —
the 'switch to this engine today' entry point:

  * relation graph  → {out}/fanren_nodes.csv, {out}/fanren_edges.csv
                      (shape of relation_graph/dataset_processed/*,
                       header Id,Size / Source,Target,Weight)
  * high-energy     → {out}/all_episodes_energy.json
                      (shape of hot/all_episodes_energy.json:
                       [{bvid, timeline: [{time, value, high}]}])
  * word count      → {out}/wordcount_top500.csv
                      (hot/preprocess_high_energy.py shape; CJK bigram
                       tokenizer backend — jieba-free, see
                       functions/tokenize.py on why counts differ from
                       jieba mode)

Usage: python tools/run_reference.py [--data /root/reference/data] [--out ./reference_out]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bigdataproject_spark.data_dicts import FANREN_ALIASES, SPY_ENERGY_TIERS  # noqa: E402
from bigdataproject_spark.functions.scoring import tiered_score_expr  # noqa: E402
from bigdataproject_spark.functions.tokenize import cjk_bigram_tokens  # noqa: E402
from bigdataproject_spark.operators.energy import (  # noqa: E402
    bucket_energy,
    bucket_media_time,
    flag_top_pct,
    timeline,
)
from bigdataproject_spark.operators.graph import (  # noqa: E402
    extract_entity_table,
    graph_edges,
    graph_nodes,
)
from bigdataproject_spark.session import get_spark  # noqa: E402
from bigdataproject_spark.sources.readers import read_danmaku_csv  # noqa: E402
from bigdataproject_spark.sources.writers import write_csv  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="/root/reference/data")
    ap.add_argument("--out", default="./reference_out")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    spark = get_spark("run-reference")

    # 1. relation graph (relation_graph/danmaku_analysis_cluster.py)
    fanren = read_danmaku_csv(spark, f"{args.data}/凡人修仙传/danmaku_*.csv")
    ent = extract_entity_table(fanren, "text", FANREN_ALIASES).cache()
    # ranked exports: sort_by re-sorts inside the single write task —
    # repartition(1) does not preserve the upstream orderBy on a cluster
    write_csv(
        graph_nodes(ent), f"{args.out}/fanren_nodes.csv", single_file=True,
        sort_by=[F.desc("Size"), F.asc("Id")],
    )
    write_csv(
        graph_edges(ent), f"{args.out}/fanren_edges.csv", single_file=True,
        sort_by=[F.desc("Weight"), F.asc("Source"), F.asc("Target")],
    )
    ent.unpersist()
    print(f"graph: wrote {args.out}/fanren_nodes.csv, fanren_edges.csv")

    # 2. high-energy timelines (hot/spark_energy.py)
    spy = read_danmaku_csv(
        spark, f"{args.data}/SPY&FAMILY/danmaku_*.csv", typed=True, multiline=False
    )
    scored = spy.withColumn("raw_score", tiered_score_expr("text", SPY_ENERGY_TIERS))
    agg = bucket_energy(
        scored, key="bvid", bucket=bucket_media_time("video_time"),
        weight=F.col("raw_score"),
    )
    flagged = flag_top_pct(agg, key="key", order="energy", pct=0.9)
    tl = timeline(flagged, key="key")
    episodes = [
        {
            "bvid": r.key,
            "timeline": [
                {"time": e.time, "value": e.value, "is_high": e.high}
                for e in r.timeline
            ],
        }
        for r in tl.collect()
    ]
    with open(f"{args.out}/all_episodes_energy.json", "w", encoding="utf-8") as f:
        json.dump(episodes, f, ensure_ascii=False)
    print(f"energy: wrote {args.out}/all_episodes_energy.json ({len(episodes)} episodes)")

    # 3. word count top-500 (hot/preprocess_high_energy.py; bigram backend)
    wc = (
        spy.select(F.explode(cjk_bigram_tokens("text")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("frequency"))
        .orderBy(F.desc("frequency"), F.asc("word"))
        .limit(500)
    )
    write_csv(
        wc, f"{args.out}/wordcount_top500.csv", single_file=True,
        sort_by=[F.desc("frequency"), F.asc("word")],
    )
    print(f"wordcount: wrote {args.out}/wordcount_top500.csv")

    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
