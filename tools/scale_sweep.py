"""Scale sweep: run the headline queries at a given SF dir and record
per-query wall seconds AND shuffle bytes (the scale-limiting resource).

Usage: python tools/scale_sweep.py SF_DIR [PASSES]

Prints one JSON line:
  {"sf_dir": ..., "queries": {name: {"sec": median, "shuffle_write_mb":
   per-pass MB, "shuffle_read_mb": ...}}, "total_sec": ...}

Wall time alone hides the 100 TB story — a query can look fine at sf1
while its shuffle volume grows super-linearly. Shuffle write/read bytes
come from the Spark status REST API (UI enabled for this session only),
sampled as completed-stage deltas around each query's timed passes.
Same session defaults as bench.py otherwise (AQE on, 32 shuffle
partitions, zstd parquet).
"""
from __future__ import annotations

import json
import statistics
import sys
import time

from sweeplib import force as _force, shuffle_totals  # noqa: E402 (sys.path bootstrap)

from bench import HEADLINE
from bigdataproject_spark.queries import registry
from bigdataproject_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1]
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(
        "scale-sweep",
        extra_conf={
            "spark.ui.enabled": "true",
            # keep every stage row: the deltas below assume no eviction
            "spark.ui.retainedStages": "100000",
        },
    )
    base_url = spark.sparkContext.uiWebUrl
    reg = registry()

    for name in HEADLINE:  # warmup: JVM + codegen + footer caches
        _force(reg[name].fn(spark, sf_dir))

    out: dict[str, dict[str, float]] = {}
    for name in HEADLINE:
        w0, r0 = shuffle_totals(base_url)
        times = []
        for _ in range(passes):
            t0 = time.perf_counter()
            _force(reg[name].fn(spark, sf_dir))
            times.append(time.perf_counter() - t0)
        w1, r1 = shuffle_totals(base_url)
        out[name] = {
            "sec": round(statistics.median(times), 3),
            "shuffle_write_mb": round((w1 - w0) / passes / 1e6, 1),
            "shuffle_read_mb": round((r1 - r0) / passes / 1e6, 1),
        }
        print(f"  {name}: {out[name]}", file=sys.stderr)

    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "queries": out,
                "total_sec": round(sum(q["sec"] for q in out.values()), 3),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
