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
