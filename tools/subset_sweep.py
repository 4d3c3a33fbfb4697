"""Named-query sweep at a given SF dir — full_sweep.py's watchdog
protocol restricted to an explicit query list, for scale rehearsals
where only a table subset exists at the target SF (e.g. the r6
sf100-class run over events/documents/embeddings).

Usage: python tools/subset_sweep.py SF_DIR TIMEOUT_S name [name ...]
"""
from __future__ import annotations

import json
import sys
import threading
import time

import os
import statistics

from sweeplib import (  # noqa: E402 (sys.path bootstrap lives here)
    active_stage_count,
    apply_scale_env,
    control_samples,
    force as _force,
    shuffle_totals,
)

from bigdataproject_spark.queries import registry
from bigdataproject_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1]
    timeout_s = float(sys.argv[2])
    names = sys.argv[3:]
    apply_scale_env(sf_dir, os.environ)  # before the session is built
    spark = get_spark(
        "subset-sweep",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "100000",
        },
    )
    sc = spark.sparkContext
    base_url = sc.uiWebUrl
    reg = registry()
    unknown = [n for n in names if n not in reg]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    # frozen environment control per JVM (r8 VERDICT item 5) — also
    # absorbs this chunk's JVM/codegen warmup. Scale rehearsals over a
    # PARTIAL SF dir (no lineitem at the target SF) skip it and report
    # null.
    ctl: list[float] | None = None
    if os.path.exists(f"{sf_dir}/lineitem.parquet"):
        ctl = control_samples(spark, sf_dir)

    out: dict[str, dict] = {}
    leaked: list[str] = []
    for name in names:
        w0, r0 = shuffle_totals(base_url)
        result: dict = {}
        err: list[BaseException] = []

        def run(q=reg[name], group=name) -> None:
            sc.setJobGroup(group, group, interruptOnCancel=True)
            try:
                _force(q.fn(spark, sf_dir))
            except BaseException as ex:  # noqa: BLE001 — recorded below
                err.append(ex)
            finally:
                sc.setJobGroup("", "")

        t0 = time.perf_counter()
        th = threading.Thread(target=run, daemon=True)
        th.start()
        th.join(timeout_s)
        sec = time.perf_counter() - t0
        if th.is_alive():
            sc.cancelJobGroup(name)
            th.join(60)
            drain_t0 = time.monotonic()
            while (
                active_stage_count(base_url) > 0
                and time.monotonic() - drain_t0 < 120
            ):
                time.sleep(2)
            result = {"timeout": True, "sec": round(sec, 1)}
            if th.is_alive():
                leaked.append(name)
                result["leaked_thread"] = True
        elif err:
            result = {"error": f"{type(err[0]).__name__}: {err[0]}"[:300]}
        else:
            w1, r1 = shuffle_totals(base_url)
            result = {
                "sec": round(sec, 2),
                "shuffle_write_mb": round((w1 - w0) / 1e6, 1),
                "shuffle_read_mb": round((r1 - r0) / 1e6, 1),
            }
        if leaked and name not in leaked:
            result["tainted_by"] = list(leaked)
        out[name] = result
        print(f"  {name}: {result}", file=sys.stderr, flush=True)

    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "timeout_s": timeout_s,
                "leaked_threads": leaked,
                "control_sec": (
                    round(statistics.median(ctl), 3) if ctl else None
                ),
                "queries": out,
                "total_sec": round(
                    sum(q.get("sec", 0.0) for q in out.values()), 1
                ),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
