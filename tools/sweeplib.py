"""Shared helpers for the sweep tools (scale_sweep.py, full_sweep.py):
noop-sink forcing and shuffle-byte sampling via the Spark status REST
API. One copy, so the sf1 headline sweep and the sf10 full-registry
sweep always measure shuffle volume the same way."""
from __future__ import annotations

import json
import os
import sys
import urllib.request

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def force(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def shuffle_totals(base_url: str) -> tuple[int, int]:
    """Cumulative (shuffle_write_bytes, shuffle_read_bytes) over all
    completed stages — callers take deltas around their timed passes.
    Requires spark.ui.enabled=true and retainedStages high enough that
    nothing is evicted between the two samples."""
    apps = json.load(urllib.request.urlopen(f"{base_url}/api/v1/applications"))
    app_id = apps[0]["id"]
    stages = json.load(
        urllib.request.urlopen(
            f"{base_url}/api/v1/applications/{app_id}/stages?status=complete"
        )
    )
    w = sum(s.get("shuffleWriteBytes", 0) for s in stages)
    r = sum(s.get("shuffleReadBytes", 0) for s in stages)
    return w, r


def active_stage_count(base_url: str) -> int:
    """Stages currently running — used to let a cancelled query drain
    before the next query's measurement window opens."""
    apps = json.load(urllib.request.urlopen(f"{base_url}/api/v1/applications"))
    app_id = apps[0]["id"]
    stages = json.load(
        urllib.request.urlopen(
            f"{base_url}/api/v1/applications/{app_id}/stages?status=active"
        )
    )
    return len(stages)


def control_samples(spark, sf_dir: str, passes: int = 5) -> list[float]:
    """Wall seconds of ``passes`` runs of the FROZEN environment-control
    aggregate — the byte-identical twin of bench.py's ``_control``
    (DO NOT EDIT either: its only job is to drift with the box). The
    sweeps carry its median so round-over-round sweep wall comparisons
    can be normalized for box conditions the same way the headline
    bench already is (r8 VERDICT item 5)."""
    import time

    from pyspark.sql import functions as F

    def _q():
        df = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        return df.groupBy("l_returnflag").agg(
            F.sum("l_quantity").alias("s"),
            F.avg("l_extendedprice").alias("a"),
            F.count(F.lit(1)).alias("n"),
        )

    out = []
    for _ in range(passes):
        t0 = time.perf_counter()
        force(_q())
        out.append(time.perf_counter() - t0)
    return out


_BIG_INPUT_BYTES = 5 << 30


def apply_scale_env(sf_dir: str, env: dict) -> None:
    """Default the session-sizing env knobs for sf100-class inputs
    (>5 GB on disk) when the operator left them unset — SCALING.md r9
    "sizing lesson": at the 8g-heap/32-partition harness defaults,
    executor OOMs kill the single local JVM and whole sweep chunks die
    with truncated errors. ~90 MB shuffle partitions and ~1 GB per
    concurrent task; plans and shuffle bytes are unchanged (verified
    <0.1% vs the prior round), only headroom. Explicit env always
    wins. Must run BEFORE the SparkSession is built."""
    if not os.path.isdir(sf_dir):
        return
    total = 0
    for root, _dirs, files in os.walk(sf_dir):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    if total <= _BIG_INPUT_BYTES:
        return
    env.setdefault("SPARK_GRAFT_SHUFFLE", "256")
    env.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")
    print(
        "-- sf100-class input: defaulting SPARK_GRAFT_SHUFFLE="
        f"{env['SPARK_GRAFT_SHUFFLE']}, SPARK_GRAFT_DRIVER_MEM="
        f"{env['SPARK_GRAFT_DRIVER_MEM']} (override by setting them)",
        file=sys.stderr,
        flush=True,
    )
