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
