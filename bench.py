#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with a noop sink (full computation, no
driver collect). A warmup query amortizes JVM/codegen startup so the
numbers reflect steady-state plan execution. Per-query time is the
MEDIAN of 3 timed passes: single-pass wall times on a shared local[32]
box vary ±15% run-to-run (GC, page cache, co-tenants), which would
drown real per-round deltas; the median keeps the number honest (no
best-case cherry-pick) while suppressing one-off stalls.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

from bigdataproject_spark.queries import registry
from bigdataproject_spark.session import get_spark

HEADLINE = [
    "q1_pricing_summary",
    "q3_top_revenue",
    "q5_region_revenue",
    "energy_timeline",
    "sessionize_events",
    "topk_per_customer",
    "word_count",
    "graph_edges",
    "dedup_exact",
    "dedup_minhash_lsh",
    "ann_brute_topk",
    "textstats_quality",
]


def _force(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    spark = get_spark("bigdataproject-bench")
    reg = registry()

    # warmup: JVM + whole-stage-codegen compile + parquet footer caches,
    # one pass over every headline query so the timed pass measures
    # steady-state plan execution rather than first-run compilation.
    for name in HEADLINE:
        _force(reg[name].fn(spark, sf_dir))

    timings: dict[str, float] = {}
    for name in HEADLINE:
        passes = []
        for _ in range(3):
            t0 = time.perf_counter()
            _force(reg[name].fn(spark, sf_dir))
            passes.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(passes), 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
