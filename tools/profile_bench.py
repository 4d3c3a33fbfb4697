"""Per-query execution profile at bench scale: wall, CPU, #jobs, #stages,
#tasks, shuffle bytes — via the status REST API (same protocol as
tools/cpu_ab.py). The bench's sf0.1 walls are 0.3-1.0 s, where per-stage
scheduling overhead and serialized driver actions can dominate; this tool
says which regime each headline query is in (guide §1: decide whether the
time goes to compute, shuffle, or scheduling before optimizing).

Usage: python tools/profile_bench.py [name ...]   (default: bench HEADLINE)
Prints one JSON line per query after a warm pass.
"""
from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")

from bigdataproject_spark.queries import registry  # noqa: E402
from bigdataproject_spark.queries_pipeline import EXTRA_PARITY  # noqa: E402
from bigdataproject_spark.session import get_spark  # noqa: E402
from tools.cpu_ab import ab_session_conf  # noqa: E402
from tools.capture_plans import HEADLINE  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _snap(base_url: str):
    apps = json.load(
        urllib.request.urlopen(f"{base_url}/api/v1/applications", timeout=30)
    )
    app_id = apps[0]["id"]
    stages = json.load(
        urllib.request.urlopen(
            f"{base_url}/api/v1/applications/{app_id}/stages?status=complete",
            timeout=30,
        )
    )
    jobs = json.load(
        urllib.request.urlopen(
            f"{base_url}/api/v1/applications/{app_id}/jobs", timeout=30
        )
    )
    return {
        "cpu": sum(s.get("executorCpuTime", 0) for s in stages),
        "stages": len(stages),
        "tasks": sum(s.get("numCompleteTasks", 0) for s in stages),
        "sw": sum(s.get("shuffleWriteBytes", 0) for s in stages),
        "jobs": len(jobs),
    }


def _stable_snap(base_url: str):
    prev = _snap(base_url)
    for _ in range(20):
        time.sleep(0.2)
        cur = _snap(base_url)
        if cur == prev:
            return cur
        prev = cur
    return prev


def main() -> None:
    names = sys.argv[1:] or HEADLINE
    spark = get_spark("profile-bench", extra_conf=ab_session_conf())
    base_url = spark.sparkContext.uiWebUrl
    reg = {**EXTRA_PARITY, **registry()}

    def force(name):
        reg[name].fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()

    for name in names:  # warm: codegen + caches, same as bench.py
        force(name)
    for name in names:
        s0 = _stable_snap(base_url)
        t0 = time.perf_counter()
        force(name)
        wall = time.perf_counter() - t0
        s1 = _stable_snap(base_url)
        print(
            json.dumps(
                {
                    "query": name,
                    "wall_s": round(wall, 3),
                    "cpu_s": round((s1["cpu"] - s0["cpu"]) / 1e9, 2),
                    "jobs": s1["jobs"] - s0["jobs"],
                    "stages": s1["stages"] - s0["stages"],
                    "tasks": s1["tasks"] - s0["tasks"],
                    "shuffle_mb": round((s1["sw"] - s0["sw"]) / 1e6, 2),
                }
            )
        )
    spark.stop()


if __name__ == "__main__":
    main()
